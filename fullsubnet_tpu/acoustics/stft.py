"""Batched STFT / iSTFT as pure-JAX jit-able ops.

Semantics are locked to the conventions the reference relies on via
``torch.stft`` / ``torch.istft`` (see reference
``audio_zen/acoustics/feature.py:9-96``): center=True with reflect padding,
periodic Hann window, onesided rfft, no normalization, and iSTFT overlap-add
with squared-window envelope division and ``length=`` trimming.

TPU notes
---------
* Framing is a static gather (shapes are static under jit); the rfft lowers
  to XLA's FFT which runs on-device. For the FullSubNet family the STFT cost
  is negligible next to the recurrent stacks, so no Pallas kernel is needed
  here — the win is keeping everything device-resident and fused by XLA.
* All functions accept leading batch/channel dims: [..., T] -> [..., F, T'].
"""


import jax
import jax.numpy as jnp


def hann_window(win_length: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window (matches ``torch.hann_window(periodic=True)``)."""
    n = jnp.arange(win_length, dtype=jnp.float32)
    w = 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * n / win_length))
    return w.astype(dtype)


def _prepare_window(n_fft: int, win_length: int, window, dtype):
    """Build the analysis window, centered and zero-padded to n_fft."""
    if window is None:
        window = hann_window(win_length, dtype=dtype)
    if win_length < n_fft:
        left = (n_fft - win_length) // 2
        window = jnp.pad(window, (left, n_fft - win_length - left))
    return window.astype(dtype)


def _frame(y: jax.Array, n_fft: int, hop_length: int) -> jax.Array:
    """Slice [..., T] into overlapping frames [..., num_frames, n_fft].

    When n_fft is a hop multiple (every shipped config), the overlap
    decomposes into k = n_fft/hop interleaved NON-overlapping frame sets,
    each a free reshape of a shifted slice — one dense transpose instead
    of a gather (the gather costs ~70 ms at B=128 x 30 s on TPU).
    """
    t = y.shape[-1]
    num_frames = 1 + (t - n_fft) // hop_length
    k = n_fft // hop_length
    if n_fft % hop_length != 0:
        starts = jnp.arange(num_frames) * hop_length
        idx = starts[:, None] + jnp.arange(n_fft)[None, :]  # [T', n_fft]
        return y[..., idx]

    n_max = -(-num_frames // k)  # frames per set, padded to the max set
    sets = []
    for j in range(k):
        nj = (num_frames - j + k - 1) // k
        start = j * hop_length
        seg = y[..., start : start + nj * n_fft]
        fr = seg.reshape(seg.shape[:-1] + (nj, n_fft))
        if nj < n_max:
            pad = [(0, 0)] * (fr.ndim - 2) + [(0, n_max - nj), (0, 0)]
            fr = jnp.pad(fr, pad)
        sets.append(fr)
    frames = jnp.stack(sets, axis=-2)  # [..., n_max, k, n_fft]
    frames = frames.reshape(frames.shape[:-3] + (n_max * k, n_fft))
    return frames[..., :num_frames, :]


def stft_complex(
    y: jax.Array,
    n_fft: int,
    hop_length: int,
    win_length: int,
    window: jax.Array | None = None,
    center: bool = True,
) -> jax.Array:
    """Complex STFT of [..., T] -> [..., F, T'] with F = n_fft // 2 + 1.

    Matches ``torch.stft(..., window=hann_window(n_fft), return_complex=True)``
    (center=True, reflect pad, onesided).
    """
    window = _prepare_window(n_fft, win_length, window, y.dtype)
    if center:
        pad = n_fft // 2
        pad_width = [(0, 0)] * (y.ndim - 1) + [(pad, pad)]
        y = jnp.pad(y, pad_width, mode="reflect")
    frames = _frame(y, n_fft, hop_length) * window  # [..., T', n_fft]
    spec = jnp.fft.rfft(frames, axis=-1)  # [..., T', F]
    return jnp.swapaxes(spec, -1, -2)  # [..., F, T']


def stft(
    y: jax.Array,
    n_fft: int,
    hop_length: int,
    win_length: int,
    window: jax.Array | None = None,
):
    """STFT returning (mag, phase, real, imag), each [..., F, T'].

    Mirrors the reference wrapper (``audio_zen/acoustics/feature.py:9-50``)
    which returns the four views used throughout the recipes. Accepts [B, T]
    or [B, C, T] (any leading dims).
    """
    spec = stft_complex(y, n_fft, hop_length, win_length, window)
    real, imag = spec.real, spec.imag
    mag = jnp.abs(spec)
    phase = jnp.angle(spec)
    return mag, phase, real, imag


def mag_phase(complex_spec: jax.Array):
    """(|z|, angle(z)) of a complex spectrogram."""
    return jnp.abs(complex_spec), jnp.angle(complex_spec)


def istft(
    features,
    n_fft: int,
    hop_length: int,
    win_length: int,
    length: int | None = None,
    input_type: str = "complex",
    window: jax.Array | None = None,
    center: bool = True,
    epsilon: float = 1e-11,
    frame_mask: jax.Array | None = None,
) -> jax.Array:
    """Inverse STFT of [..., F, T'] -> [..., T].

    ``input_type``: "complex" | "real_imag" (tuple) | "mag_phase" (tuple),
    mirroring the reference (``audio_zen/acoustics/feature.py:53-91``).
    Overlap-add with squared-window envelope normalization, matching
    ``torch.istft`` (center trim + ``length`` cut).

    ``frame_mask``: optional 0/1 (may be traced), shaped [T'] or
    batch_shape + [T'] (per-example valid lengths within one padded
    batch) — masked frames contribute neither signal nor envelope, so the
    result over the valid samples is EXACTLY the istft of the unmasked
    prefix. This is what makes length-bucketed (padded) inference
    bit-equal to unpadded runs.
    """
    if input_type == "real_imag":
        real, imag = features
        spec = jax.lax.complex(real, imag)
    elif input_type == "complex":
        spec = features
    elif input_type == "mag_phase":
        mag, phase = features
        spec = jax.lax.complex(mag * jnp.cos(phase), mag * jnp.sin(phase))
    else:
        raise NotImplementedError(
            "Only 'real_imag', 'complex', and 'mag_phase' are supported."
        )

    window = _prepare_window(n_fft, win_length, window, jnp.float32)

    spec = jnp.swapaxes(spec, -1, -2)  # [..., T', F]
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)  # [..., T', n_fft]
    frames = frames * window

    num_frames = frames.shape[-2]
    # frame_mask may be [T'] (shared) or batch_shape + (T',) (per-example
    # valid lengths in one padded batch); per-example masks make the OLA
    # envelope per-example too
    per_example_env = frame_mask is not None and frame_mask.ndim > 1
    if frame_mask is not None:
        fm = frame_mask.astype(frames.dtype)
        frames = frames * fm[..., :, None]
    out_len = n_fft + (num_frames - 1) * hop_length

    batch_shape = frames.shape[:-2]
    flat = frames.reshape((-1, num_frames, n_fft))
    wsq = jnp.broadcast_to(window**2, (num_frames, n_fft))
    if frame_mask is not None:
        wsq = wsq * fm.astype(window.dtype)[..., :, None]
    if per_example_env:
        wsq = jnp.broadcast_to(
            wsq, batch_shape + (num_frames, n_fft)
        ).reshape((-1, num_frames, n_fft))

    if n_fft % hop_length == 0:
        # strided OLA: k = n_fft/hop interleaved sets of NON-overlapping
        # frames, each a free reshape added at a static offset — replaces
        # the serialized scatter-add (~85 ms at B=128 x 30 s on TPU)
        def ola_batched(fr):  # fr [B*, T', n_fft] (or [T', n_fft] for env)
            lead = fr.shape[:-2]
            k = n_fft // hop_length
            out = jnp.zeros(lead + (out_len,), fr.dtype)
            for j in range(0, k):
                fr_j = fr[..., j::k, :]
                nj = fr_j.shape[-2]
                seg = fr_j.reshape(lead + (nj * n_fft,))
                start = j * hop_length
                out = out.at[..., start : start + nj * n_fft].add(seg)
            return out

        out = ola_batched(flat)
        env = ola_batched(wsq)
    else:
        starts = jnp.arange(num_frames) * hop_length
        idx = starts[:, None] + jnp.arange(n_fft)[None, :]  # [T', n_fft]

        def ola(fr):
            return jnp.zeros(out_len, fr.dtype).at[idx].add(fr)

        out = jax.vmap(ola)(flat)  # [B*, out_len]
        env = jax.vmap(ola)(wsq) if per_example_env else ola(wsq)
    out = out / jnp.maximum(env, epsilon)
    out = out.reshape(batch_shape + (out_len,))

    if center:
        pad = n_fft // 2
        # match torch.istft: with an explicit length, take [pad : pad+length]
        # (the trailing center-pad region can hold real signal); otherwise
        # trim the center pad from both ends.
        end = out_len - pad if length is None else min(pad + length, out_len)
        out = out[..., pad:end]
    if length is not None:
        cur = out.shape[-1]
        if cur >= length:
            out = out[..., :length]
        else:
            pad_width = [(0, 0)] * (out.ndim - 1) + [(0, length - cur)]
            out = jnp.pad(out, pad_width)
    return out


def num_stft_frames(
    num_samples: int, hop_length: int, n_fft: int | None = None,
    center: bool = True,
) -> int:
    """Frame count produced by :func:`stft` for a given sample count.

    ``n_fft`` matters only when odd (center padding adds 2*(n_fft//2)
    samples, which is n_fft - 1 then); omitted = assume even n_fft."""
    if center:
        extra = 0 if n_fft is None else 2 * (n_fft // 2) - n_fft
        return 1 + (num_samples + extra) // hop_length
    raise NotImplementedError("non-centered frame math not needed yet")


def traced_num_frames(true_len, hop_length: int, n_fft: int):
    """Traced twin of :func:`num_stft_frames` (center=True): frame count
    for a traced sample count. Handles odd ``n_fft`` (center padding adds
    ``2*(n_fft//2)`` samples); for even ``n_fft`` this is
    ``1 + true_len // hop``."""
    extra = 2 * (n_fft // 2) - n_fft
    return 1 + (true_len + extra) // hop_length


def insert_tail_reflection(y, true_len, n_fft: int):
    """Re-create torch's center-pad tail reflection of a zero-padded
    [bucket]-length wave at its TRUE length: ``y_pad[L + i] = y[L - 2 - i]``
    for ``i < n_fft//2``. ``y``: [bucket] (1-D); ``true_len``: traced
    scalar with ``true_len > n_fft//2`` and
    ``true_len + n_fft//2 <= bucket`` (caller-guaranteed). Shared by the
    trainer's bucketed validation and the Inferencer/serving bucketed
    enhancement."""
    pad = n_fft // 2
    tail = jax.lax.dynamic_slice(y, (true_len - pad - 1,), (pad,))[::-1]
    return jax.lax.dynamic_update_slice(y, tail, (true_len,))
