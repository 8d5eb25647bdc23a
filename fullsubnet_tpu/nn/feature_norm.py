"""Cumulative magnitude-spectral normalization (functional).

Twin of the reference module (``audio_zen/model/module/feature_norm.py``):
``cumulative_norm`` is an online zero-norm (identical math to
``acoustics.norm.cumulative_layer_norm`` but with eps=1e-10, kept for
parity); ``cumulative_mag_spectral_norm`` divides by a cumulative or global
mean, optionally taken from the middle frequency bin only.
"""

import jax
import jax.numpy as jnp


def cumulative_norm(x: jax.Array) -> jax.Array:
    """Online zero-norm over [B, C, F, T] (reference ``feature_norm.py:5-41``)."""
    eps = 1e-10
    b, c, f, t = x.shape
    xr = x.reshape(b * c, f, t)

    step_sum = jnp.sum(xr, axis=1)
    step_pow_sum = jnp.sum(jnp.square(xr), axis=1)
    cumulative_sum = jnp.cumsum(step_sum, axis=-1)
    cumulative_pow_sum = jnp.cumsum(step_pow_sum, axis=-1)

    entry_count = jnp.arange(f, f * t + 1, f, dtype=x.dtype)[None, :]
    cum_mean = cumulative_sum / entry_count
    cum_var = (
        cumulative_pow_sum - 2 * cum_mean * cumulative_sum
    ) / entry_count + jnp.square(cum_mean)
    cum_std = jnp.sqrt(cum_var + eps)

    out = (xr - cum_mean[:, None, :]) / cum_std[:, None, :]
    return out.reshape(b, c, f, t)


def cumulative_mag_spectral_norm(
    x: jax.Array,
    cumulative: bool = False,
    use_mid_freq_mu: bool = False,
    eps: float = 1e-6,
) -> jax.Array:
    """Divide [B, C, F, T] by a (cumulative|global) (mid-bin|mean) magnitude."""
    assert x.ndim == 4, "cumulative_mag_spectral_norm only supports 4D input."
    b, c, f, t = x.shape
    xr = x.reshape(b * c, f, t)

    if use_mid_freq_mu:
        step = xr[:, int(f // 2 - 1), :]  # [B*C, T]
    else:
        step = jnp.mean(xr, axis=1)

    if cumulative:
        counts = jnp.arange(1, t + 1, dtype=x.dtype)[None, :]
        mu = (jnp.cumsum(step, axis=-1) / counts)[:, None, :]  # [B*C, 1, T]
    else:
        mu = jnp.mean(step, axis=-1)[:, None, None]  # [B*C, 1, 1]

    return (xr / (mu + eps)).reshape(b, c, f, t)
