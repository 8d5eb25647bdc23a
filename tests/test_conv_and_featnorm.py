"""Causal conv blocks + cumulative feature norms vs torch references."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from fullsubnet_tpu.nn.conv import (
    TemporalConvNet,
    conv1d,
    causal_conv_block_init,
    causal_conv_block_apply,
    causal_trans_conv_block_init,
    causal_trans_conv_block_apply,
)
from fullsubnet_tpu.nn.feature_norm import (
    cumulative_norm,
    cumulative_mag_spectral_norm,
)


def test_conv1d_matches_torch():
    torch.manual_seed(0)
    tc = torch.nn.Conv1d(4, 8, 3, padding=2, dilation=2)
    x = torch.randn(2, 4, 20)
    with torch.no_grad():
        ref = tc(x)
    ours = conv1d(
        jnp.asarray(x.numpy()),
        jnp.asarray(tc.weight.detach().numpy()),
        jnp.asarray(tc.bias.detach().numpy()),
        padding=2,
        dilation=2,
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5, rtol=1e-4)


def test_tcn_shapes_and_causality():
    net = TemporalConvNet(8, [16, 16], kernel_size=2)
    params = net.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 40))
    y = net(params, x)
    assert y.shape == (2, 16, 40)
    # causality: future change must not affect past outputs
    x2 = x.at[:, :, 30:].set(0.0)
    y2 = net(params, x2)
    np.testing.assert_allclose(np.asarray(y[:, :, :30]), np.asarray(y2[:, :, :30]), atol=1e-5)


def test_causal_conv_block_matches_torch():
    torch.manual_seed(1)
    conv = torch.nn.Conv2d(1, 4, kernel_size=(3, 2), stride=(2, 1), padding=(0, 1))
    bn = torch.nn.BatchNorm2d(4).eval()
    x = torch.randn(2, 1, 32, 10)
    with torch.no_grad():
        ref = torch.relu(bn(conv(x)[:, :, :, :-1]))

    params = causal_conv_block_init(jax.random.PRNGKey(0), 1, 4)
    params["weight"] = jnp.asarray(conv.weight.detach().numpy())
    params["bias"] = jnp.asarray(conv.bias.detach().numpy())
    ours = causal_conv_block_apply(params, jnp.asarray(x.numpy()), "ReLU")
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5, rtol=1e-4)


def test_causal_trans_conv_block_matches_torch():
    torch.manual_seed(2)
    conv = torch.nn.ConvTranspose2d(4, 2, kernel_size=(3, 2), stride=(2, 1))
    bn = torch.nn.BatchNorm2d(2).eval()
    x = torch.randn(2, 4, 16, 10)
    with torch.no_grad():
        ref = torch.nn.functional.elu(bn(conv(x)[:, :, :, :-1]))

    params = causal_trans_conv_block_init(jax.random.PRNGKey(0), 4, 2)
    params["weight"] = jnp.asarray(conv.weight.detach().numpy())
    params["bias"] = jnp.asarray(conv.bias.detach().numpy())
    ours = causal_trans_conv_block_apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5, rtol=1e-4)


def _torch_cumulative_norm(x):
    x = torch.from_numpy(x)
    eps = 1e-10
    b, c, f, t = x.size()
    x = x.reshape(b * c, f, t)
    step_sum = torch.sum(x, dim=1)
    step_pow_sum = torch.sum(torch.square(x), dim=1)
    cum_sum = torch.cumsum(step_sum, dim=-1)
    cum_pow_sum = torch.cumsum(step_pow_sum, dim=-1)
    cnt = torch.arange(f, f * t + 1, f, dtype=x.dtype).reshape(1, t).expand_as(cum_sum)
    mean = cum_sum / cnt
    var = (cum_pow_sum - 2 * mean * cum_sum) / cnt + mean.pow(2)
    std = (var + eps).sqrt()
    out = (x - mean.reshape(b * c, 1, t)) / std.reshape(b * c, 1, t)
    return out.reshape(b, c, f, t).numpy()


def test_cumulative_norm_matches_reference():
    rng = np.random.default_rng(0)
    x = np.abs(rng.standard_normal((2, 1, 64, 50))).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(cumulative_norm(jnp.asarray(x))),
        _torch_cumulative_norm(x),
        atol=1e-4,
        rtol=1e-4,
    )


def test_cumulative_mag_spectral_norm_variants():
    rng = np.random.default_rng(1)
    x = np.abs(rng.standard_normal((2, 1, 64, 50))).astype(np.float32)
    xj = jnp.asarray(x)
    for cumulative in (False, True):
        for mid in (False, True):
            out = cumulative_mag_spectral_norm(xj, cumulative, mid)
            assert out.shape == x.shape
    # global-mean variant equals dividing by utterance mean of frame means
    out = np.asarray(cumulative_mag_spectral_norm(xj, False, False))
    xr = x.reshape(2, 64, 50)
    mu = xr.mean(axis=1).mean(axis=-1)[:, None, None]
    np.testing.assert_allclose(out, (xr / (mu + 1e-6)).reshape(x.shape), atol=1e-5, rtol=1e-4)
