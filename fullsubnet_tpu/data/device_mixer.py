"""On-device mixture synthesis: the DSP half of the training data
pipeline (RIR reverb, SNR mixing, loudness retargeting, anti-clipping
rescale) as one batched jittable function.

The reference synthesizes mixtures on the host
(``recipes/dns_interspeech_2020/dataset_train.py:136-195`` — numpy +
scipy.signal.fftconvolve inside DataLoader workers). Here the host
pipeline only does IO and byte shuffling (decode, crop, concat — see
``TrainDataset(device_synthesis=True)``) and ships raw components; the
mixing math runs inside the jitted train step, batched over [B] on the
MXU/VPU. That removes every FLOP from the host loop — the usual
scaling limit when one host core feeds several chips.

Semantics mirror ``TrainDataset.snr_mix`` exactly (same constants,
same operation order, same clipping quirk: detect at 0.999, rescale to
0.99 - eps), so a device-synthesized batch matches the host mixer to
f32 round-off. Randomness stays on the host: the per-example draws
(crop offsets, SNR, reverb coin, RIR pick, target loudness) ride in as
plain array inputs, so the (seed, epoch, index) reproducibility
contract is unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _next_pow2(n: int) -> int:
    return 1 << max(0, int(n - 1)).bit_length()


def _rms(y: jnp.ndarray) -> jnp.ndarray:
    """Per-row RMS of [B, L] -> [B, 1]."""
    return jnp.sqrt(jnp.mean(jnp.square(y), axis=-1, keepdims=True))


def _tailor_db_fs(y: jnp.ndarray, target_db, eps: float):
    """Batched twin of ``acoustics.feature.tailor_dB_FS``; returns
    (scaled, scalar[B, 1])."""
    target_db = jnp.asarray(target_db, jnp.float32)
    scalar = 10.0 ** (target_db / 20.0) / (_rms(y) + eps)
    return y * scalar, scalar


def _as_audio_f32(x: jnp.ndarray) -> jnp.ndarray:
    """Waveform to float32: integer dtypes are wav-native PCM and scale
    by 1/32768 (exact power of two); floats pass through."""
    if jnp.issubdtype(x.dtype, jnp.integer):
        return x.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
    return x.astype(jnp.float32)


def fft_convolve_trunc(clean: jnp.ndarray, rir: jnp.ndarray) -> jnp.ndarray:
    """Batched FFT convolution truncated to the clean length:
    ``scipy.signal.fftconvolve(clean, rir)[:L]`` per row.

    clean: [B, L], rir: [B, R] (zero-padded rows are fine — padding
    contributes nothing to the product). Returns [B, L] float32.
    """
    length = clean.shape[-1]
    n = _next_pow2(length + rir.shape[-1] - 1)
    spec = jnp.fft.rfft(clean, n) * jnp.fft.rfft(rir, n)
    return jnp.fft.irfft(spec, n)[..., :length].astype(jnp.float32)


def device_snr_mix(
    clean: jnp.ndarray,
    noise: jnp.ndarray,
    rir: jnp.ndarray,
    use_reverb: jnp.ndarray,
    snr: jnp.ndarray,
    noisy_target_db_fs: jnp.ndarray,
    target_db_fs: float = -25.0,
    eps: float = 1e-6,
):
    """Batched jittable ``snr_mix`` (reference ``dataset_train.py:136-195``).

    Args:
      clean:  [B, L] float32 — cropped clean speech.
      noise:  [B, L] float32 — assembled noise track (same length).
      rir:    [B, R] float32 — mono RIR per row, zero-padded to R
              (already channel-picked on the host for multichannel RIRs).
      use_reverb: [B] bool/float — rows whose clean signal is reverbed.
      snr:    [B] float32 — per-row SNR in dB.
      noisy_target_db_fs: [B] float32 — per-row mixture loudness target.
      target_db_fs: dataset-level pre-mix loudness constant.
      eps: the reference's 1e-6.

    Returns (noisy [B, L], clean_target [B, L]) float32 — identical to
    the host mixer on the same draws (the clean target is the reverbed
    clean, like the reference).

    Integer inputs (``device_synthesis_transfer = "int16"``) are
    upcast as wav-native audio (x / 32768, an exact power-of-two scale):
    when the source wavs are 16-bit PCM and unresampled, the int16
    transfer is bit-identical to the f32 one at HALF the host->device
    bytes — which matters doubly on a remote-PJRT tunnel (bandwidth in
    the step's critical path, and the client leaks every transfer's
    size; see CLAUDE.md).
    """
    clean = _as_audio_f32(clean)
    noise = _as_audio_f32(noise)
    rir = _as_audio_f32(rir)
    reverb_mask = jnp.asarray(use_reverb, bool)[:, None]
    snr = jnp.asarray(snr, jnp.float32)[:, None]
    noisy_target_db_fs = jnp.asarray(noisy_target_db_fs, jnp.float32)[:, None]

    # static no-reverb gate: a dataset with no usable RIRs ships a [B, 1]
    # placeholder buffer (TrainDataset.rir_samples == 1) — a length-1
    # kernel convolves to a plain per-row scale, so skip the full-batch
    # FFT (2x rfft + irfft at next_pow2(L)) at trace time.
    if rir.shape[-1] > 1:
        reverbed = fft_convolve_trunc(clean, rir.astype(jnp.float32))
    else:
        reverbed = clean * rir.astype(jnp.float32)
    clean = jnp.where(reverb_mask, reverbed, clean)

    # norm_amplitude + tailor_dB_FS on both signals
    clean = clean / (
        jnp.max(jnp.abs(clean), axis=-1, keepdims=True) + eps
    )
    clean, _ = _tailor_db_fs(clean, target_db_fs, eps)
    clean_rms = _rms(clean)

    noise = noise / (
        jnp.max(jnp.abs(noise), axis=-1, keepdims=True) + eps
    )
    noise, _ = _tailor_db_fs(noise, target_db_fs, eps)
    noise_rms = _rms(noise)

    snr_scalar = clean_rms / (10.0 ** (snr / 20.0)) / (noise_rms + eps)
    noisy = clean + noise * snr_scalar

    noisy, noisy_scalar = _tailor_db_fs(noisy, noisy_target_db_fs, eps)
    clean = clean * noisy_scalar

    # reference quirk preserved: clipping detected at |y| > 0.999 but
    # rescaled to a 0.99 - eps ceiling
    peak = jnp.max(jnp.abs(noisy), axis=-1, keepdims=True)
    rescue = jnp.where(peak > 0.999, peak / (0.99 - eps), 1.0)
    return noisy / rescue, clean / rescue


def make_device_synthesis(target_db_fs: float = -25.0, eps: float = 1e-6):
    """Close over the dataset constants; returns a fn(batch) -> (noisy,
    clean) taking the 6-tuple a ``device_synthesis`` TrainDataset yields."""

    def synthesize(batch):
        clean, noise, rir, use_reverb, snr, noisy_target = batch
        return device_snr_mix(
            clean, noise, rir, use_reverb, snr, noisy_target,
            target_db_fs=target_db_fs, eps=eps,
        )

    return synthesize
