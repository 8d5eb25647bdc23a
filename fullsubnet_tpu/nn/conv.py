"""Causal convolution blocks: TCN (temporal conv net) and 2-D causal
conv/deconv encoder-decoder blocks.

Library capability mirroring ``audio_zen/model/module/causal_conv.py``
(not used by the shipped DNS recipes, but part of the reference's public
surface). Functional params-pytree style; convs lower to XLA convolution
ops that map onto the MXU.

Causality convention matches the reference: pad both sides (torch
``padding=``) then chomp the trailing ``padding`` frames.
"""

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# 1-D temporal conv net (TCN)
# --------------------------------------------------------------------------


def conv1d(x, weight, bias=None, stride=1, padding=0, dilation=1):
    """x [B, C_in, T], weight [C_out, C_in, K] (torch layout)."""
    out = jax.lax.conv_general_dilated(
        x,
        weight,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    if bias is not None:
        out = out + bias[None, :, None]
    return out


def temporal_block_init(key, n_inputs, n_outputs, kernel_size, dtype=jnp.float32):
    """One TCN residual block: two weight-normalized dilated causal convs +
    optional 1x1 downsample (reference ``causal_conv.py:14-73``).

    Weight norm is stored in the torch parametrization (direction ``v`` and
    magnitude ``g``); the effective weight is ``g * v / ||v||`` with the
    norm over (in, k) per output channel.
    """
    ks = jax.random.split(key, 6)
    mk = lambda k, o, i, w: 0.01 * jax.random.normal(k, (o, i, w), dtype)
    params = {
        "conv1": {
            "v": mk(ks[0], n_outputs, n_inputs, kernel_size),
            "g": jnp.ones((n_outputs,), dtype),
            "bias": jnp.zeros((n_outputs,), dtype),
        },
        "conv2": {
            "v": mk(ks[1], n_outputs, n_outputs, kernel_size),
            "g": jnp.ones((n_outputs,), dtype),
            "bias": jnp.zeros((n_outputs,), dtype),
        },
    }
    if n_inputs != n_outputs:
        params["downsample"] = {
            "weight": mk(ks[2], n_outputs, n_inputs, 1),
            "bias": jnp.zeros((n_outputs,), dtype),
        }
    return params


def _weight_normed(p):
    v = p["v"]
    norm = jnp.sqrt(jnp.sum(v**2, axis=(1, 2), keepdims=True))
    return p["g"][:, None, None] * v / jnp.maximum(norm, 1e-12)


def temporal_block_apply(
    params, x, kernel_size, dilation, dropout_rate=0.0, key=None
):
    """x: [B, C, T] -> [B, C_out, T] causal residual block."""
    padding = (kernel_size - 1) * dilation

    def branch(p, h):
        h = conv1d(h, _weight_normed(p), p["bias"], padding=padding, dilation=dilation)
        h = h[:, :, : h.shape[-1] - padding] if padding else h  # chomp
        return jax.nn.relu(h)

    out = branch(params["conv1"], x)
    if dropout_rate and key is not None:
        key, sub = jax.random.split(key)
        keep = jax.random.bernoulli(sub, 1 - dropout_rate, out.shape)
        out = jnp.where(keep, out / (1 - dropout_rate), 0)
    out = branch(params["conv2"], out)
    if dropout_rate and key is not None:
        _, sub = jax.random.split(key)
        keep = jax.random.bernoulli(sub, 1 - dropout_rate, out.shape)
        out = jnp.where(keep, out / (1 - dropout_rate), 0)

    if "downsample" in params:
        res = conv1d(x, params["downsample"]["weight"], params["downsample"]["bias"])
    else:
        res = x
    return jax.nn.relu(out + res)


class TemporalConvNet:
    """Stack of exponentially dilated causal residual blocks. x: [B, C, T]."""

    def __init__(self, num_inputs, num_channels, kernel_size=2, dropout=0.2):
        self.num_inputs = num_inputs
        self.num_channels = list(num_channels)
        self.kernel_size = kernel_size
        self.dropout = dropout

    def init(self, key, dtype=jnp.float32):
        params = []
        for i, out_ch in enumerate(self.num_channels):
            key, sub = jax.random.split(key)
            in_ch = self.num_inputs if i == 0 else self.num_channels[i - 1]
            params.append(temporal_block_init(sub, in_ch, out_ch, self.kernel_size, dtype))
        return params

    def __call__(self, params, x, key=None, training=False):
        rate = self.dropout if training else 0.0
        assert not (rate and key is None), (
            "TemporalConvNet: training with dropout requires a PRNG key "
            "(otherwise dropout would be silently disabled)"
        )
        for i, p in enumerate(params):
            sub = None
            if key is not None:
                key, sub = jax.random.split(key)
            x = temporal_block_apply(p, x, self.kernel_size, 2**i, rate, sub)
        return x


# --------------------------------------------------------------------------
# 2-D causal conv / transposed-conv blocks (encoder-decoder)
# --------------------------------------------------------------------------


def conv2d(x, weight, bias=None, stride=(1, 1), padding=((0, 0), (0, 0))):
    out = jax.lax.conv_general_dilated(
        x, weight, window_strides=stride, padding=list(padding),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if bias is not None:
        out = out + bias[None, :, None, None]
    return out


def causal_conv_block_init(key, in_channels, out_channels, dtype=jnp.float32):
    """Conv2d k=(3,2) s=(2,1) p=(0,1) + BatchNorm + activation
    (reference ``causal_conv.py:115-149``)."""
    kw, kb = jax.random.split(key)
    fan_in = in_channels * 3 * 2
    bound = 1.0 / (fan_in**0.5)
    return {
        "weight": jax.random.uniform(kw, (out_channels, in_channels, 3, 2), dtype, -bound, bound),
        "bias": jax.random.uniform(kb, (out_channels,), dtype, -bound, bound),
        "bn_scale": jnp.ones((out_channels,), dtype),
        "bn_bias": jnp.zeros((out_channels,), dtype),
        "bn_mean": jnp.zeros((out_channels,), dtype),
        "bn_var": jnp.ones((out_channels,), dtype),
    }


def _batchnorm(x, p, training, eps=1e-5, momentum=0.1):
    """Returns (normalized, new_running_stats | None). Training uses
    batch statistics and produces torch-style running-stat updates
    (momentum 0.1, unbiased running var); eval uses the stored stats."""
    if training:
        mean = jnp.mean(x, axis=(0, 2, 3))
        var = jnp.var(x, axis=(0, 2, 3))
        n = x.shape[0] * x.shape[2] * x.shape[3]
        unbiased = var * (n / max(n - 1, 1))
        new_stats = {
            "bn_mean": (1 - momentum) * p["bn_mean"] + momentum * mean,
            "bn_var": (1 - momentum) * p["bn_var"] + momentum * unbiased,
        }
    else:
        mean, var = p["bn_mean"], p["bn_var"]
        new_stats = None
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean[None, :, None, None]) * inv[None, :, None, None] * p[
        "bn_scale"
    ][None, :, None, None] + p["bn_bias"][None, :, None, None]
    return y, new_stats


def causal_conv_block_apply(
    params, x, activation="ReLU", training=False, return_params=False
):
    """x: [B, C, F, T] -> strided-freq causal conv block.

    With ``training=True, return_params=True`` also returns the params
    with updated BatchNorm running statistics — a functional training
    loop MUST thread these back (torch updates them as a side effect;
    pytrees cannot), or eval will normalize with the init stats."""
    x = conv2d(x, params["weight"], params["bias"], stride=(2, 1), padding=((0, 0), (1, 1)))
    x = x[:, :, :, :-1]  # chomp the future frame
    x, stats = _batchnorm(x, params, training)
    act = {"ReLU": jax.nn.relu, "ELU": jax.nn.elu, "Tanh": jnp.tanh,
           "LeakyReLU": lambda v: jax.nn.leaky_relu(v, 0.01)}[activation]
    out = act(x)
    if return_params:
        return out, ({**params, **stats} if stats else params)
    return out


def causal_trans_conv_block_init(key, in_channels, out_channels, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    fan_in = in_channels * 3 * 2
    bound = 1.0 / (fan_in**0.5)
    return {
        # torch ConvTranspose2d weight layout [in, out, kH, kW]
        "weight": jax.random.uniform(kw, (in_channels, out_channels, 3, 2), dtype, -bound, bound),
        "bias": jax.random.uniform(kb, (out_channels,), dtype, -bound, bound),
        "bn_scale": jnp.ones((out_channels,), dtype),
        "bn_bias": jnp.zeros((out_channels,), dtype),
        "bn_mean": jnp.zeros((out_channels,), dtype),
        "bn_var": jnp.ones((out_channels,), dtype),
    }


def causal_trans_conv_block_apply(
    params, x, is_last=False, output_padding=(0, 0), training=False,
    return_params=False,
):
    """x: [B, C, F, T] transposed causal conv block (stride (2,1)).

    ``return_params`` as in :func:`causal_conv_block_apply`."""
    w = jnp.transpose(params["weight"], (1, 0, 2, 3))[:, :, ::-1, ::-1]  # OIHW flipped
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding=[(2, 2 + output_padding[0]), (1, 1 + output_padding[1])],
        lhs_dilation=(2, 1),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    out = out + params["bias"][None, :, None, None]
    out = out[:, :, :, :-1]  # chomp
    out, stats = _batchnorm(out, params, training)
    out = jax.nn.relu(out) if is_last else jax.nn.elu(out)
    if return_params:
        return out, ({**params, **stats} if stats else params)
    return out
