"""Waveform / spectrogram feature utilities.

Host-side utilities (mixture synthesis, VAD, cropping) operate on NumPy —
they live in the data pipeline, off the device. Device-side utilities
(``freq_unfold``, ``drop_band``, ``overlap_cat``, ``batch_shuffle_frequency``)
are pure JAX and jit-able with static shapes.

Behavioral parity targets in the reference: ``audio_zen/acoustics/feature.py``
(waveform utils :99-255, drop_band :309-345) and ``audio_zen/model/
base_model.py:13-46`` (freq_unfold).
"""

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Device-side (JAX)
# --------------------------------------------------------------------------


def freq_unfold(x: jax.Array, num_neighbors: int, mode: str = "reflect") -> jax.Array:
    """Split a spectrogram into overlapping sub-band units along frequency.

    Args:
        x: [B, C, F, T] spectrogram.
        num_neighbors: neighbors on each side of the center bin.

    Returns:
        [B, F, C, 2*num_neighbors+1, T] — one (2N+1)-bin unit per frequency,
        reflect-padded at the spectrum edges (reference
        ``base_model.py:13-46``; the reference returns [B, N, C, F_s, T]
        with N = F, identical layout).

    TPU note: implemented as a static gather on the frequency axis. The
    gather indices are compile-time constants, so XLA lowers this to an
    efficient strided copy; downstream the (2N+1) axis immediately feeds the
    sub-band GEMM so the expansion stays in HBM only once.
    """
    assert x.ndim == 4, f"The dim of the input is {x.ndim}. It should be 4."
    b, c, f, t = x.shape
    if num_neighbors <= 0:
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b, f, c, 1, t)

    pad = num_neighbors
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode=mode)
    size = 2 * num_neighbors + 1
    idx = np.arange(f)[:, None] + np.arange(size)[None, :]  # [F, size]
    units = xp[:, :, idx, :]  # [B, C, F, size, T]
    return jnp.transpose(units, (0, 2, 1, 3, 4))  # [B, F, C, size, T]


def unfold_along_time(x: jax.Array, context_size: int) -> jax.Array:
    """Split overlapped time-context chunks from a spectrogram.

    x: [B, C, F, T] -> [B, N_chunks, C, F, context_size+1] where chunk i
    holds frames (i-N, ..., i-1, i) with no padding (the inference twin of
    the reference's ``_unfold_along_time``,
    ``audio_zen/inferencer/base_inferencer.py:110-142``).
    """
    assert x.ndim == 4, f"The dims of input is {x.ndim}. It should be 4."
    b, c, f, t = x.shape
    chunk_size = context_size + 1
    num_chunks = t - context_size
    idx = np.arange(num_chunks)[:, None] + np.arange(chunk_size)[None, :]
    chunks = x[..., idx]  # [B, C, F, N, chunk]
    return jnp.transpose(chunks, (0, 3, 1, 2, 4))


def drop_band(x: jax.Array, num_groups: int = 2) -> jax.Array:
    """Interleaved frequency subsampling across batch groups.

    Trades frequency coverage for sub-band compute: sample i of group g keeps
    only frequencies ``g, g+G, g+2G, ...``. Shapes [B, C, F, T] ->
    [B, C, F//G, T]; sample order is regrouped by group (reference
    ``feature.py:309-345``). All indices are static, so this is jit-safe.
    """
    batch_size, _, num_freqs, _ = x.shape
    assert batch_size > num_groups, (
        f"Batch size = {batch_size}, num_groups = {num_groups}. The batch "
        "size should be larger than the number of groups."
    )
    if num_groups <= 1:
        return x

    if num_freqs % num_groups != 0:
        x = x[..., : num_freqs - (num_freqs % num_groups), :]
        num_freqs = x.shape[2]

    outputs = []
    for group_idx in range(num_groups):
        samples = np.arange(group_idx, batch_size, num_groups)
        freqs = np.arange(group_idx, num_freqs, num_groups)
        outputs.append(x[samples][:, :, freqs, :])
    return jnp.concatenate(outputs, axis=0)


def batch_shuffle_frequency(x: jax.Array, key: jax.Array | None = None, indices=None):
    """Randomly permute the frequency axis per batch element.

    x: [B, C, F, T]. Returns (shuffled, indices [B, F]). Library capability
    kept for parity (reference ``feature.py:258-306``; unused by recipes).
    """
    assert x.ndim == 4
    b, c, f, t = x.shape
    if indices is None:
        assert key is not None, "Provide a PRNG key or explicit indices."
        keys = jax.random.split(key, b)
        indices = jnp.stack([jax.random.permutation(k, f) for k in keys])
    out = jnp.take_along_axis(x, indices[:, None, :, None], axis=2)
    return out, indices


def overlap_cat(chunk_list, axis: int = -1) -> jax.Array:
    """Overlap-concatenate (50%) a list of equal-length [B, T] chunks.

    Averages the overlapping halves (reference ``feature.py:184-204``).
    """
    pieces = []
    for i, chunk in enumerate(chunk_list):
        half = chunk.shape[axis] // 2
        first_half = jax.lax.slice_in_dim(chunk, 0, half, axis=axis)
        last_half = jax.lax.slice_in_dim(chunk, half, chunk.shape[axis], axis=axis)
        if i == 0:
            pieces += [first_half, last_half]
        else:
            pieces[-1] = (pieces[-1] + first_half) / 2
            pieces.append(last_half)
    return jnp.concatenate(pieces, axis=axis)


def channel_wise_layer_norm(x: jax.Array, scale, bias, eps: float = 1e-5):
    """LayerNorm over the channel axis of [B, N, K] (normalize dim 1).

    Functional twin of the reference ``ChannelWiseLayerNorm``
    (``feature.py:348-365``): torch LayerNorm applied after transposing to
    [B, K, N], i.e. statistics over N per (batch, position).
    """
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.var(x, axis=1, keepdims=True)
    normed = (x - mu) * jax.lax.rsqrt(var + eps)
    return normed * scale[None, :, None] + bias[None, :, None]


def reduce_complexity_separately(
    sub_band_input: jax.Array, full_band_output: jax.Array
) -> jax.Array:
    """Group "dropout" for FullSubNet (reference ``base_model.py:48-100``).

    Splits the batch into 3 groups; group i keeps frequencies
    ``i+1, i+4, ...`` (avoiding the padded first/last bins) and
    concatenates the sub-band and full-band units on the feature axis.
    The selection is fully DETERMINISTIC (as in the reference, whose
    third parameter is a device, not randomness).

    Shapes: sub_band_input [B, F, C, F_s, T], full_band_output
    [B, F, C, F_f, T] -> [B, F//3(ish), C, F_s+F_f, T].
    """
    batch_size = full_band_output.shape[0]
    n_freqs = full_band_output.shape[1]
    sub_batch_size = batch_size // 3

    final_selected = []
    for idx in range(3):
        sub_batch = np.arange(idx * sub_batch_size, (idx + 1) * sub_batch_size)
        fb_sub = full_band_output[sub_batch]
        sb_sub = sub_band_input[sub_batch]
        freq_indices = np.arange(idx + 1, n_freqs - 1, 3)
        fb_sub = fb_sub[:, freq_indices]
        sb_sub = sb_sub[:, freq_indices]
        final_selected.append(jnp.concatenate([sb_sub, fb_sub], axis=-2))
    return jnp.concatenate(final_selected, axis=0)


# --------------------------------------------------------------------------
# Host-side (NumPy) — data-pipeline utilities
# --------------------------------------------------------------------------


def norm_amplitude(y: np.ndarray, scalar=None, eps: float = 1e-6):
    """Peak-normalize; returns (y / scalar, scalar)."""
    if not scalar:
        scalar = np.max(np.abs(y)) + eps
    return y / scalar, scalar


def tailor_dB_FS(y: np.ndarray, target_dB_FS: float = -25, eps: float = 1e-6):
    """Scale to a target loudness in dB FS; returns (y, rms, scalar)."""
    rms = np.sqrt(np.mean(y**2))
    scalar = 10 ** (target_dB_FS / 20) / (rms + eps)
    return y * scalar, rms, scalar


def is_clipped(y: np.ndarray, clipping_threshold: float = 0.999) -> bool:
    return bool(np.any(np.abs(y) > clipping_threshold))


def subsample(
    data: np.ndarray,
    sub_sample_length: int,
    start_position: int = -1,
    return_start_position: bool = False,
    rng: np.random.Generator | None = None,
):
    """Random fixed-length crop (pad with zeros if too short). 1-D only."""
    assert np.ndim(data) == 1, f"Only support 1D data. The dim is {np.ndim(data)}"
    length = len(data)
    rng = rng or np.random.default_rng()

    if length > sub_sample_length:
        if start_position < 0:
            start_position = int(rng.integers(0, length - sub_sample_length))
        data = data[start_position : start_position + sub_sample_length]
    elif length < sub_sample_length:
        data = np.append(
            data, np.zeros(sub_sample_length - length, dtype=np.float32)
        )

    assert len(data) == sub_sample_length
    if return_start_position:
        return data, start_position
    return data


def aligned_subsample(
    data_a: np.ndarray,
    data_b: np.ndarray,
    sub_sample_length: int,
    rng: np.random.Generator | None = None,
):
    """Crop the same random segment from two aligned signals (last axis)."""
    assert data_a.shape[-1] == data_b.shape[-1], "Inconsistent dataset size."
    rng = rng or np.random.default_rng()
    length = data_a.shape[-1]
    if length > sub_sample_length:
        start = int(rng.integers(0, length - sub_sample_length + 1))
        end = start + sub_sample_length
        return data_a[..., start:end], data_b[..., start:end]
    if length < sub_sample_length:
        pad_width = [(0, 0)] * (data_a.ndim - 1) + [(0, sub_sample_length - length)]
        return (
            np.pad(data_a, pad_width, mode="constant"),
            np.pad(data_b, pad_width, mode="constant"),
        )
    return data_a, data_b


def activity_detector(
    audio: np.ndarray,
    fs: int = 16000,
    activity_threshold: float = 0.13,
    target_level: float = -25,
    eps: float = 1e-6,
) -> float:
    """Fraction of 50 ms windows whose smoothed energy prob exceeds threshold.

    Frame-energy VAD with attack/release smoothing, used to filter clean
    speech lists (reference ``feature.py:207-255``).
    """
    audio, _, _ = tailor_dB_FS(audio, target_level)
    window_samples = int(fs * 50 / 1000)

    a, b = -1.0, 0.2
    alpha_rel, alpha_att = 0.05, 0.8

    # the per-window energies are the hot part on long clean lists —
    # computed by the GIL-free C engine when available
    from fullsubnet_tpu import native

    energies_db = native.frame_energies_db(audio, window_samples, eps)

    prev_energy_prob = 0.0
    active_frames = 0
    for frame_rms in energies_db:
        frame_energy_prob = 1.0 / (1 + np.exp(-(a + b * frame_rms)))

        if frame_energy_prob > prev_energy_prob:
            smoothed = frame_energy_prob * alpha_att + prev_energy_prob * (1 - alpha_att)
        else:
            smoothed = frame_energy_prob * alpha_rel + prev_energy_prob * (1 - alpha_rel)

        if smoothed > activity_threshold:
            active_frames += 1
        prev_energy_prob = frame_energy_prob

    return active_frames / len(energies_db)
