"""Filterbank ops: mel matrix construction + apply/inverse projections.

The reference applies a precomputed [F, N] filterbank by matmul
(``audio_zen/acoustics/filtebank.py:4-53``) and builds the mel matrix with
``torchaudio.transforms.MelScale`` (HTK mel scale, no norm) for Fast
FullSubNet. torchaudio is not a dependency here, so the HTK mel matrix is
constructed natively; it is numerically identical to torchaudio's
``melscale_fbanks(norm=None, mel_scale="htk")``.
"""

import jax
import jax.numpy as jnp
import numpy as np


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    num_freqs: int,
    num_mels: int,
    sample_rate: int,
    f_min: float = 0.0,
    f_max: float | None = None,
) -> np.ndarray:
    """Triangular HTK mel filterbank matrix of shape [num_freqs, num_mels].

    Matches torchaudio ``melscale_fbanks(n_freqs, f_min, f_max, n_mels,
    sample_rate, norm=None, mel_scale="htk")`` used by the reference's Fast
    FullSubNet (``fast_fullsubnet/model.py:57-63``).
    """
    f_max = f_max if f_max is not None else sample_rate / 2.0
    all_freqs = np.linspace(0.0, sample_rate // 2, num_freqs)
    m_pts = np.linspace(_hz_to_mel_htk(f_min), _hz_to_mel_htk(f_max), num_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)  # [num_mels + 2]

    f_diff = f_pts[1:] - f_pts[:-1]  # [num_mels + 1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # [F, num_mels + 2]
    down_slopes = -slopes[:, :-2] / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))
    return fb.astype(np.float32)  # [F, num_mels]


def apply_filterbank(spec: jax.Array, filterbank: jax.Array) -> jax.Array:
    """Project [..., F, T] onto [..., N, T] via a [F, N] filterbank matrix."""
    return jnp.einsum("...ft,fn->...nt", spec, filterbank)


def inverse_filterbank(mel_spec: jax.Array, filterbank: jax.Array) -> jax.Array:
    """Approximate inverse projection [..., N, T] -> [..., F, T] (transpose)."""
    return jnp.einsum("...nt,fn->...ft", mel_spec, filterbank)
