"""Fused sub-band pipeline == reference unfused forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fullsubnet_tpu.models import FullSubNet


@pytest.mark.parametrize(
    "norm", ["offline_laplace_norm", "cumulative_laplace_norm"]
)
def test_fused_subband_matches_unfused(norm):
    model = FullSubNet(
        num_freqs=33,
        sb_num_neighbors=3,
        fb_model_hidden_size=16,
        sb_model_hidden_size=12,
        norm_type=norm,
    )
    params = model.init(jax.random.PRNGKey(0), weight_init=False)
    x = jnp.asarray(
        np.abs(np.random.default_rng(0).standard_normal((2, 1, 33, 37))).astype(
            np.float32
        )
    )
    ref = model(params, x, dropping_band=False)
    old = FullSubNet._FUSED_SB_THRESHOLD
    try:
        FullSubNet._FUSED_SB_THRESHOLD = 1  # force the fused path
        fused = model(params, x, dropping_band=False)
    finally:
        FullSubNet._FUSED_SB_THRESHOLD = old
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), atol=2e-5, rtol=1e-4
    )


def test_fused_subband_odd_chunking():
    """T not divisible by the chunk: padded tail must not corrupt output."""
    model = FullSubNet(
        num_freqs=17, sb_num_neighbors=2, fb_model_hidden_size=8,
        sb_model_hidden_size=8,
    )
    params = model.init(jax.random.PRNGKey(1), weight_init=False)
    x = jnp.asarray(
        np.abs(np.random.default_rng(1).standard_normal((1, 1, 17, 23))).astype(
            np.float32
        )
    )
    ref = model(params, x, dropping_band=False)
    old = FullSubNet._FUSED_SB_THRESHOLD
    try:
        FullSubNet._FUSED_SB_THRESHOLD = 1
        fused = model(params, x, dropping_band=False)
    finally:
        FullSubNet._FUSED_SB_THRESHOLD = old
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), atol=2e-5, rtol=1e-4
    )


def test_fused_path_is_jittable_bf16():
    model = FullSubNet(
        num_freqs=33, sb_num_neighbors=3, fb_model_hidden_size=16,
        sb_model_hidden_size=12,
    )
    params = model.init(jax.random.PRNGKey(0), weight_init=False)
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    x = jnp.ones((2, 1, 33, 37), jnp.bfloat16)
    old = FullSubNet._FUSED_SB_THRESHOLD
    try:
        FullSubNet._FUSED_SB_THRESHOLD = 1
        out = jax.jit(lambda p, v: model(p, v, dropping_band=False))(params, x)
    finally:
        FullSubNet._FUSED_SB_THRESHOLD = old
    assert out.shape == (2, 2, 33, 37)
    assert np.isfinite(np.asarray(out, dtype=np.float32)).all()