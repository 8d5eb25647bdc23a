"""Complex Ideal Ratio Mask (cIRM) ops — elementwise, jit-able.

Semantics match the reference (``audio_zen/acoustics/mask.py:7-70``):
hyperbolic-tangent compression with K=10, C=0.1; decompression clamped at
``limit=9.9``. These fuse into neighbouring ops under XLA, so no custom
kernel is warranted.
"""

import jax
import jax.numpy as jnp

from fullsubnet_tpu.constant import EPSILON


def build_complex_ideal_ratio_mask(
    noisy_real: jax.Array,
    noisy_imag: jax.Array,
    clean_real: jax.Array,
    clean_imag: jax.Array,
) -> jax.Array:
    """Compressed cIRM from noisy/clean STFTs; [..., F, T] -> [..., F, T, 2].

    cIRM = clean / noisy in the complex field, then tanh-compressed.
    Reference: https://ieeexplore.ieee.org/document/7364200.
    """
    denominator = jnp.square(noisy_real) + jnp.square(noisy_imag) + EPSILON
    mask_real = (noisy_real * clean_real + noisy_imag * clean_imag) / denominator
    mask_imag = (noisy_real * clean_imag - noisy_imag * clean_real) / denominator
    complex_ratio_mask = jnp.stack((mask_real, mask_imag), axis=-1)
    return compress_cIRM(complex_ratio_mask, K=10.0, C=0.1)


def compress_cIRM(mask: jax.Array, K: float = 10.0, C: float = 0.1) -> jax.Array:
    """Compress cIRM values from (-inf, +inf) into (-K, K)."""
    mask = jnp.where(mask <= -100.0, -100.0, mask)
    return K * (1.0 - jnp.exp(-C * mask)) / (1.0 + jnp.exp(-C * mask))


def decompress_cIRM(mask: jax.Array, K: float = 10.0, limit: float = 9.9) -> jax.Array:
    """Decompress cIRM from (-K, K) back to (-inf, +inf), clamped at ±limit."""
    mask = jnp.clip(mask, -limit, limit)
    return -K * jnp.log((K - mask) / (K + mask))


def complex_mul(noisy_r, noisy_i, mask_r, mask_i):
    """(noisy_r + j noisy_i) * (mask_r + j mask_i) -> (real, imag)."""
    r = noisy_r * mask_r - noisy_i * mask_i
    i = noisy_r * mask_i + noisy_i * mask_r
    return r, i
