"""Sub-band baseline model tests."""

import jax
import jax.numpy as jnp
import numpy as np

from fullsubnet_tpu.models import SubBandBaseline


def test_forward_shapes_and_drop_band():
    model = SubBandBaseline(num_neighbors=3, hidden_size=12)
    params = model.init(jax.random.PRNGKey(0), weight_init=False)
    x = jnp.asarray(
        np.abs(np.random.default_rng(0).standard_normal((4, 1, 32, 20))).astype(np.float32)
    )
    out = model(params, x)  # training path, drop_band active
    assert out.shape == (4, 2, 16, 20)
    out = model(params, x, dropping_band=False)
    assert out.shape == (4, 2, 32, 20)


def test_pre_unfolded_serving_path():
    """[F, F_s, T] -> [F, 2, T]: the sub_band_crm_mask strategy contract."""
    model = SubBandBaseline(num_neighbors=3, hidden_size=12)
    params = model.init(jax.random.PRNGKey(0), weight_init=False)
    units = jnp.asarray(
        np.abs(np.random.default_rng(1).standard_normal((32, 7, 20))).astype(np.float32)
    )
    out = model(params, units)
    assert out.shape == (32, 2, 20)


def test_serving_matches_forward():
    """The pre-unfolded path equals the 4-D forward for B=1."""
    from fullsubnet_tpu.acoustics.feature import freq_unfold

    model = SubBandBaseline(num_neighbors=2, hidden_size=8, look_ahead=2)
    params = model.init(jax.random.PRNGKey(0), weight_init=False)
    x = jnp.asarray(
        np.abs(np.random.default_rng(2).standard_normal((1, 1, 16, 15))).astype(np.float32)
    )
    full = model(params, x, dropping_band=False)  # [1, 2, 16, 15]

    xx = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 2)))
    units = freq_unfold(xx, 2).reshape(16, 5, 17)
    served = model(params, units)[:, :, 2:]  # [F, 2, T]
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(served, (1, 0, 2))), np.asarray(full[0]),
        atol=1e-5,
    )


def test_config_registry():
    from fullsubnet_tpu.config import build_model, load_config

    cfg = load_config(
        "recipes/dns_interspeech_2020/subband_baseline/train.toml"
    )
    model, kw = build_model(cfg)
    assert isinstance(model, SubBandBaseline)
    params = model.init(jax.random.PRNGKey(0), **kw)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert 1.0e6 < n < 1.5e6, n  # paper: 1.3 M params
