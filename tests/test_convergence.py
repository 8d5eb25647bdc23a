"""End-to-end gradient correctness: the full recipe train step must
actually converge (overfit a small fixed batch)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fullsubnet_tpu.acoustics.feature import drop_band
from fullsubnet_tpu.acoustics.mask import build_complex_ideal_ratio_mask
from fullsubnet_tpu.acoustics.stft import stft_complex
from fullsubnet_tpu.models import FullSubNet


def test_training_converges_on_fixed_batch():
    model = FullSubNet(
        num_freqs=161, sb_num_neighbors=3,
        fb_model_hidden_size=32, sb_model_hidden_size=24,
    )
    params = model.init(jax.random.PRNGKey(0))
    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(1e-3))
    opt = tx.init(params)

    rng = np.random.default_rng(0)
    t = np.arange(6400) / 16000
    clean = np.stack(
        [0.4 * np.sin(2 * np.pi * (200 + 30 * i) * t) for i in range(8)]
    ).astype(np.float32)
    noisy = (clean + 0.2 * rng.standard_normal(clean.shape)).astype(np.float32)
    noisy_j, clean_j = jnp.asarray(noisy), jnp.asarray(clean)

    def loss_fn(p):
        ns = stft_complex(noisy_j, 320, 160, 320)
        cs = stft_complex(clean_j, 320, 160, 320)
        cirm = build_complex_ideal_ratio_mask(ns.real, ns.imag, cs.real, cs.imag)
        cirm = jnp.transpose(
            drop_band(jnp.transpose(cirm, (0, 3, 1, 2)), 2), (0, 2, 3, 1)
        )
        crm = model(p, jnp.abs(ns)[:, None])
        return jnp.mean(jnp.square(jnp.transpose(crm, (0, 2, 3, 1)) - cirm))

    @jax.jit
    def step(p, o):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    losses = []
    for _ in range(60):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))

    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], (
        f"no convergence: {losses[0]:.4f} -> {losses[-1]:.4f}"
    )


def test_improved_fullsubnet_training_converges():
    """The wave-to-wave family trains end-to-end (trainer dispatches it to
    a waveform loss — reference ships the model with no trainer at all;
    cf. /root/reference/recipes/dns_interspeech_2020/improved_fullsubnet/
    model.py which has no trainer.py sibling)."""
    from fullsubnet_tpu.models import ImprovedFullSubNet

    model = ImprovedFullSubNet(
        n_fft=64, hop_length=16, win_length=64, num_freqs=33,
        freq_cutoffs=(8, 16), sb_num_center_freqs=(1, 2, 4),
        sb_num_neighbor_freqs=(3, 3, 3), fb_num_center_freqs=(1, 2, 4),
        fb_num_neighbor_freqs=(3, 3, 3), fb_hidden_size=16, sb_hidden_size=12,
        norm_type="cumulative_laplace_norm",
    )
    params = model.init(jax.random.PRNGKey(0))
    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(3e-3))
    opt = tx.init(params)

    rng = np.random.default_rng(1)
    t = np.arange(2048) / 16000
    clean = np.stack(
        [0.4 * np.sin(2 * np.pi * (300 + 50 * i) * t) for i in range(4)]
    ).astype(np.float32)
    noisy = (clean + 0.2 * rng.standard_normal(clean.shape)).astype(np.float32)
    noisy_j, clean_j = jnp.asarray(noisy), jnp.asarray(clean)

    def loss_fn(p):
        enhanced = model(p, noisy_j, training=True)[:, 0]
        return jnp.mean(jnp.square(enhanced - clean_j))

    @jax.jit
    def step(p, o):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    losses = []
    for _ in range(60):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))

    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], (
        f"no convergence: {losses[0]:.4f} -> {losses[-1]:.4f}"
    )
