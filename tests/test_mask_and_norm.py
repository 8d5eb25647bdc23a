"""cIRM mask ops and normalization parity vs reference semantics (torch)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from fullsubnet_tpu.acoustics import (
    build_complex_ideal_ratio_mask,
    compress_cIRM,
    decompress_cIRM,
    complex_mul,
    offline_laplace_norm,
    cumulative_laplace_norm,
    offline_gaussian_norm,
    cumulative_layer_norm,
    forgetting_norm,
    hybrid_norm,
    norm_wrapper,
)

EPS32 = float(np.finfo(np.float32).eps)


def _torch_compress(mask, K=10, C=0.1):
    mask = -100 * (mask <= -100) + mask * (mask > -100)
    return K * (1 - torch.exp(-C * mask)) / (1 + torch.exp(-C * mask))


def _torch_build_cirm(nr, ni, cr, ci):
    denominator = torch.square(nr) + torch.square(ni) + EPS32
    mr = (nr * cr + ni * ci) / denominator
    mi = (nr * ci - ni * cr) / denominator
    return _torch_compress(torch.stack((mr, mi), dim=-1))


def test_build_cirm_matches_reference_semantics():
    rng = np.random.default_rng(0)
    shape = (2, 257, 50)
    nr, ni, cr, ci = (rng.standard_normal(shape).astype(np.float32) for _ in range(4))
    ref = _torch_build_cirm(*(torch.from_numpy(a) for a in (nr, ni, cr, ci))).numpy()
    ours = np.asarray(
        build_complex_ideal_ratio_mask(*(jnp.asarray(a) for a in (nr, ni, cr, ci)))
    )
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_compress_decompress_inverse():
    rng = np.random.default_rng(1)
    m = (rng.standard_normal((4, 257, 20, 2)) * 3).astype(np.float32)
    recon = np.asarray(decompress_cIRM(compress_cIRM(jnp.asarray(m))))
    np.testing.assert_allclose(recon, m, atol=1e-3, rtol=1e-3)


def test_decompress_clamps():
    m = jnp.asarray(np.array([9.95, -9.95, 20.0, -20.0], dtype=np.float32))
    out = np.asarray(decompress_cIRM(m))
    assert np.isfinite(out).all()
    # ±9.9 clamp -> ±K*log((K+9.9)/(K-9.9)) ≈ ±52.98
    np.testing.assert_allclose(np.abs(out), 10 * np.log(19.9 / 0.1), rtol=1e-4)


def test_complex_mul():
    rng = np.random.default_rng(2)
    a, b, c, d = (rng.standard_normal(10).astype(np.float32) for _ in range(4))
    r, i = complex_mul(*(jnp.asarray(x) for x in (a, b, c, d)))
    z = (a + 1j * b) * (c + 1j * d)
    np.testing.assert_allclose(np.asarray(r), z.real, atol=1e-6)
    np.testing.assert_allclose(np.asarray(i), z.imag, atol=1e-6)


# ---------------------------------------------------------------------------
# Normalizations vs direct torch re-implementations of the reference loops
# ---------------------------------------------------------------------------


def _x4(shape=(3, 1, 257, 200), seed=0):
    rng = np.random.default_rng(seed)
    return np.abs(rng.standard_normal(shape)).astype(np.float32)


def test_offline_laplace_norm():
    x = _x4()
    ref = x / (x.mean(axis=(1, 2, 3), keepdims=True) + 1e-5)
    np.testing.assert_allclose(
        np.asarray(offline_laplace_norm(jnp.asarray(x))), ref, atol=1e-5, rtol=1e-5
    )


def test_cumulative_laplace_norm():
    x = _x4()
    b, c, f, t = x.shape
    xr = x.reshape(b * c, f, t)
    cum = np.cumsum(xr.sum(axis=1), axis=-1)
    counts = np.arange(f, f * t + 1, f, dtype=np.float32)
    mu = (cum / counts).reshape(b * c, 1, t)
    ref = (xr / (mu + EPS32)).reshape(b, c, f, t)
    np.testing.assert_allclose(
        np.asarray(cumulative_laplace_norm(jnp.asarray(x))), ref, atol=1e-4, rtol=1e-4
    )


def test_offline_gaussian_norm_matches_torch_std():
    x = _x4()
    xt = torch.from_numpy(x)
    mu = torch.mean(xt, dim=(1, 2, 3), keepdim=True)
    std = torch.std(xt, dim=(1, 2, 3), keepdim=True)
    ref = ((xt - mu) / (std + 1e-5)).numpy()
    np.testing.assert_allclose(
        np.asarray(offline_gaussian_norm(jnp.asarray(x))), ref, atol=1e-5, rtol=1e-5
    )


def _torch_forgetting_norm(x, sample_length=192):
    """Direct re-statement of reference base_model.py:102-151."""
    x = torch.from_numpy(x)
    b, c, f, t = x.shape
    x = x.reshape(b, c * f, t)
    eps, mu = 1e-10, 0
    alpha = (sample_length - 1) / (sample_length + 1)
    mu_list = []
    for i in range(t):
        alp = min((i - 1) / (i + 1), alpha)
        mu = alp * mu + (1 - alp) * torch.mean(x[:, :, i], dim=1).reshape(b, 1)
        mu_list.append(mu)
    mu = torch.stack(mu_list, dim=-1)
    return (x / (mu + eps)).reshape(b, c, f, t).numpy()


def test_forgetting_norm_matches_reference_loop():
    x = _x4(shape=(2, 1, 64, 250))
    ref = _torch_forgetting_norm(x, sample_length=192)
    ours = np.asarray(forgetting_norm(jnp.asarray(x), sample_length=192))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_hybrid_norm_agrees_with_pieces():
    x3 = _x4(shape=(2, 64, 250))[..., :]
    out = np.asarray(hybrid_norm(jnp.asarray(x3), sample_length_in_training=100))
    # before the switch frame, equals forgetting_norm on [B,1,F,T]
    fg = np.asarray(
        forgetting_norm(jnp.asarray(x3[:, None]), sample_length=100)
    )[:, 0]
    np.testing.assert_allclose(out[..., :100], fg[..., :100], atol=1e-4, rtol=1e-4)
    # after, equals cumulative mean division
    f = x3.shape[1]
    cum = np.cumsum(x3.sum(axis=1), axis=-1)
    counts = np.arange(f, f * x3.shape[-1] + 1, f, dtype=np.float32)
    ref_after = x3 / ((cum / counts)[:, None, :] + 1e-10)
    np.testing.assert_allclose(out[..., 100:], ref_after[..., 100:], atol=1e-4, rtol=1e-4)


def test_cumulative_layer_norm_runs_and_is_causal():
    x = _x4(shape=(2, 1, 64, 120))
    out = np.asarray(cumulative_layer_norm(jnp.asarray(x)))
    assert out.shape == x.shape
    # causality: prefix output unchanged when future frames change
    x2 = x.copy()
    x2[..., 60:] *= 5
    out2 = np.asarray(cumulative_layer_norm(jnp.asarray(x2)))
    np.testing.assert_allclose(out[..., :60], out2[..., :60], atol=1e-5)


def test_norm_wrapper_dispatch():
    assert norm_wrapper("offline_laplace_norm") is offline_laplace_norm
    try:
        norm_wrapper("nope")
        raise AssertionError("should raise")
    except NotImplementedError:
        pass


def test_norms_are_jittable():
    x = jnp.asarray(_x4(shape=(2, 1, 32, 64)))
    for fn in (
        offline_laplace_norm,
        cumulative_laplace_norm,
        offline_gaussian_norm,
        cumulative_layer_norm,
        forgetting_norm,
    ):
        out = jax.jit(fn)(x)
        assert out.shape == x.shape
