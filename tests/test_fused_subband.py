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

@pytest.mark.parametrize(
    "norm", ["offline_laplace_norm", "cumulative_laplace_norm"]
)
def test_fused_drop_band_training_path_matches_unfused(norm):
    """training=True routes drop_band batches through the fusion; output
    must equal the unfused freq_unfold+norm+drop_band path (same regrouped
    sample order, same interleaved frequency selection)."""
    model = FullSubNet(
        num_freqs=33, sb_num_neighbors=3, fb_model_hidden_size=16,
        sb_model_hidden_size=12, norm_type=norm, num_groups_in_drop_band=2,
    )
    params = model.init(jax.random.PRNGKey(0), weight_init=False)
    x = jnp.asarray(
        np.abs(np.random.default_rng(2).standard_normal((4, 1, 33, 37))).astype(
            np.float32
        )
    )
    ref = model(params, x, dropping_band=True)           # unfused drop path
    out = model(params, x, dropping_band=True, training=True)  # fused
    assert out.shape == ref.shape == (4, 2, 16, 37)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
    )


def test_fused_drop_band_grads_match_unfused():
    """Gradients through the fused training path == through the unfused
    path (both differentiable scans on CPU)."""
    model = FullSubNet(
        num_freqs=17, sb_num_neighbors=2, fb_model_hidden_size=8,
        sb_model_hidden_size=8, num_groups_in_drop_band=2,
    )
    params = model.init(jax.random.PRNGKey(3), weight_init=False)
    x = jnp.asarray(
        np.abs(np.random.default_rng(3).standard_normal((4, 1, 17, 21))).astype(
            np.float32
        )
    )
    tgt = jnp.asarray(
        np.random.default_rng(4).standard_normal((4, 2, 8, 21)).astype(np.float32)
    )

    def loss(p, training):
        crm = model(p, x, dropping_band=True, training=training)
        return jnp.mean(jnp.square(crm - tgt))

    lr, gr = jax.value_and_grad(loss)(params, False)
    lf, gf = jax.value_and_grad(loss)(params, True)
    np.testing.assert_allclose(float(lf), float(lr), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-3
        )


def test_pallas_drop_band_training_matches_unfused():
    """The Pallas branch of the fused drop_band path (interpret mode) —
    forward AND custom-VJP gradients vs the unfused reference path."""
    model = FullSubNet(
        num_freqs=17, sb_num_neighbors=2, fb_model_hidden_size=8,
        sb_model_hidden_size=8, num_groups_in_drop_band=2,
    )
    params = model.init(jax.random.PRNGKey(5), weight_init=False)
    x = jnp.asarray(
        np.abs(np.random.default_rng(5).standard_normal((4, 1, 17, 21))).astype(
            np.float32
        )
    )
    tgt = jnp.asarray(
        np.random.default_rng(6).standard_normal((4, 2, 8, 21)).astype(np.float32)
    )

    def forward_pallas(p):
        xx = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, model.look_ahead)))
        fb_in = model.norm(xx).reshape(4, 17, -1)
        fb_out = model.fb_model(p["fb_model"], fb_in).reshape(4, 1, 17, -1)
        noisy_pad = jnp.pad(xx[:, 0], ((0, 0), (2, 2), (0, 0)), mode="reflect")
        mu = model._sb_norm_mu(noisy_pad, fb_out[:, 0], 17)
        out = model._pallas_subband(
            p, noisy_pad, fb_out[:, 0], 17, mu, mu.shape[1] == 1,
            interpret=True, drop_groups=2, training=True,
        )
        return out[..., model.look_ahead :]

    def loss_ref(p):
        return jnp.mean(jnp.square(model(p, x, dropping_band=True) - tgt))

    def loss_pallas(p):
        return jnp.mean(jnp.square(forward_pallas(p) - tgt))

    lr, gr = jax.value_and_grad(loss_ref)(params)
    lp, gp = jax.value_and_grad(loss_pallas)(params)
    np.testing.assert_allclose(float(lp), float(lr), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gr)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-3
        )


def test_fused_drop_band_training_gru():
    """GRU-configured FullSubNet trains through the fused path too (the
    chunked fallback used to hardcode LSTM gate math)."""
    model = FullSubNet(
        num_freqs=17, sb_num_neighbors=2, fb_model_hidden_size=8,
        sb_model_hidden_size=8, num_groups_in_drop_band=2,
        sequence_model="GRU",
    )
    params = model.init(jax.random.PRNGKey(7), weight_init=False)
    x = jnp.asarray(
        np.abs(np.random.default_rng(7).standard_normal((4, 1, 17, 21))).astype(
            np.float32
        )
    )

    def loss(p, training):
        crm = model(p, x, dropping_band=True, training=training)
        return jnp.mean(jnp.square(crm))

    lr, gr = jax.value_and_grad(loss)(params, False)
    lf, gf = jax.value_and_grad(loss)(params, True)
    np.testing.assert_allclose(float(lf), float(lr), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-3
        )


@pytest.mark.parametrize(
    "norm", ["offline_laplace_norm", "cumulative_laplace_norm"]
)
def test_fused_path_fb_neighbors(norm):
    """fb_num_neighbors > 0: the fused pipeline slices BOTH sources'
    neighborhoods (the reference unfolds the full-band output too,
    base_model.py:13-46) — forward parity vs the unfused path, with and
    without drop_band, plus gradients."""
    model = FullSubNet(
        num_freqs=17, sb_num_neighbors=2, fb_num_neighbors=1,
        fb_model_hidden_size=8, sb_model_hidden_size=8, norm_type=norm,
        num_groups_in_drop_band=2,
    )
    params = model.init(jax.random.PRNGKey(11), weight_init=False)
    x = jnp.asarray(
        np.abs(np.random.default_rng(11).standard_normal((4, 1, 17, 21))).astype(
            np.float32
        )
    )

    # inference (no drop): force the fused path via the threshold
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

    # training (drop_band) forward + grads
    tgt = jnp.asarray(
        np.random.default_rng(12).standard_normal((4, 2, 8, 21)).astype(np.float32)
    )

    def loss(p, training):
        crm = model(p, x, dropping_band=True, training=training)
        return jnp.mean(jnp.square(crm - tgt))

    lr, gr = jax.value_and_grad(loss)(params, False)
    lf, gf = jax.value_and_grad(loss)(params, True)
    np.testing.assert_allclose(float(lf), float(lr), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-3
        )
