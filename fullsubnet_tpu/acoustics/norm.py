"""Feature normalizations — offline (utterance) and streaming (cumulative).

These are the five normalizations dispatched by the reference's
``BaseModel.norm_wrapper`` (``audio_zen/model/base_model.py:102-372``),
re-expressed as pure functions on [B, C, F, T] arrays:

* ``offline_laplace_norm``   — divide by utterance mean.
* ``cumulative_laplace_norm``— divide by running (causal) mean: streamable.
* ``offline_gaussian_norm``  — utterance zero-norm (mean/std).
* ``cumulative_layer_norm``  — running zero-norm.
* ``forgetting_norm``        — per-frame EMA of the frame mean. The
  reference computes this with a Python loop over frames
  (``base_model.py:127-141``) — a CPU-bound hazard; here the EMA recurrence
  runs as a single ``lax.scan`` over time whose carry is just [B] scalars
  per batch row (the [B,F,T] tensor math stays vectorized outside the
  scan), keeping the whole op on-device with static shapes.

The warm-up schedule of forgetting/hybrid norm is replicated exactly,
including the odd ``alp = min((t-1)/(t+1), alpha)`` coefficient at frame 0
(= -1), which makes frame 0's mu equal 2·mean_0.
"""

import jax
import jax.numpy as jnp

from fullsubnet_tpu.constant import EPSILON


def offline_laplace_norm(x: jax.Array) -> jax.Array:
    """x / (mean over all non-batch dims + 1e-5). x: [B, ...]."""
    mu = jnp.mean(x, axis=tuple(range(1, x.ndim)), keepdims=True)
    return x / (mu + 1e-5)


def cumulative_laplace_norm(x: jax.Array) -> jax.Array:
    """Causal running-mean normalization. x: [B, C, F, T]."""
    b, c, f, t = x.shape
    xr = x.reshape(b * c, f, t)
    step_sum = jnp.sum(xr, axis=1)  # [B*C, T]
    cumulative_sum = jnp.cumsum(step_sum, axis=-1)
    entry_count = jnp.arange(f, f * t + 1, f, dtype=x.dtype)  # [T]
    cumulative_mean = cumulative_sum / entry_count[None, :]
    normed = xr / (cumulative_mean[:, None, :] + EPSILON)
    return normed.reshape(b, c, f, t)


def offline_gaussian_norm(x: jax.Array) -> jax.Array:
    """(x - mu) / (std + 1e-5) with utterance statistics. x: [B, C, F, T].

    Uses the unbiased (ddof=1) std to match ``torch.std`` in the reference
    (``base_model.py:305``).
    """
    mu = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    std = jnp.std(x, axis=(1, 2, 3), keepdims=True, ddof=1)
    return (x - mu) / (std + 1e-5)


def cumulative_layer_norm(x: jax.Array) -> jax.Array:
    """Causal running zero-norm (mean and std). x: [B, C, F, T]."""
    b, c, f, t = x.shape
    xr = x.reshape(b * c, f, t)
    step_sum = jnp.sum(xr, axis=1)  # [B*C, T]
    step_pow_sum = jnp.sum(jnp.square(xr), axis=1)
    cumulative_sum = jnp.cumsum(step_sum, axis=-1)
    cumulative_pow_sum = jnp.cumsum(step_pow_sum, axis=-1)
    entry_count = jnp.arange(f, f * t + 1, f, dtype=x.dtype)[None, :]  # [1, T]
    cumulative_mean = cumulative_sum / entry_count
    cumulative_var = (
        cumulative_pow_sum - 2 * cumulative_mean * cumulative_sum
    ) / entry_count + jnp.square(cumulative_mean)
    cumulative_std = jnp.sqrt(cumulative_var + EPSILON)
    normed = (xr - cumulative_mean[:, None, :]) / cumulative_std[:, None, :]
    return normed.reshape(b, c, f, t)


def _ema_mu(frame_mean: jax.Array, sample_length: int) -> jax.Array:
    """EMA of per-frame means with the reference's warm-up coefficients.

    frame_mean: [B, T] -> mu: [B, T] where
      mu_t = alp_t * mu_{t-1} + (1 - alp_t) * frame_mean_t,  mu_{-1} = 0,
      alp_t = min((t-1)/(t+1), (L-1)/(L+1)).

    Evaluated as a first-order linear recurrence via ``lax.scan`` over time
    (the carry is [B], so the scan body is a cheap fused VPU op).
    """
    t = frame_mean.shape[-1]
    alpha = (sample_length - 1) / (sample_length + 1)
    tt = jnp.arange(t, dtype=frame_mean.dtype)
    alp = jnp.minimum((tt - 1.0) / (tt + 1.0), alpha)  # [T]

    def step(mu, inp):
        a, m = inp
        mu = a * mu + (1.0 - a) * m
        return mu, mu

    _, mus = jax.lax.scan(
        step,
        jnp.zeros(frame_mean.shape[0], frame_mean.dtype),
        (alp, frame_mean.swapaxes(0, 1)),
    )
    return mus.swapaxes(0, 1)  # [B, T]


def forgetting_norm(x: jax.Array, sample_length: int = 192) -> jax.Array:
    """Divide by an EMA of per-frame means. x: [B, C, F, T]."""
    b, c, f, t = x.shape
    xr = x.reshape(b, c * f, t)
    frame_mean = jnp.mean(xr, axis=1)  # [B, T]
    mu = _ema_mu(frame_mean, sample_length)  # [B, T]
    out = xr / (mu[:, None, :] + 1e-10)
    return out.reshape(b, c, f, t)


def hybrid_norm(x: jax.Array, sample_length_in_training: int = 192) -> jax.Array:
    """EMA warm-up for the first ``sample_length`` frames, cumulative mean after.

    x: [B, F, T] (3-D in the reference, ``base_model.py:153-201``).
    """
    b, f, t = x.shape
    frame_mean = jnp.mean(x, axis=1)  # [B, T]
    mu_ema = _ema_mu(frame_mean, sample_length_in_training)  # [B, T]

    step_sum = jnp.sum(x, axis=1)  # [B, T]
    cumulative_sum = jnp.cumsum(step_sum, axis=-1)
    entry_count = jnp.arange(f, f * t + 1, f, dtype=x.dtype)[None, :]
    cum_mean = cumulative_sum / entry_count  # [B, T]

    tt = jnp.arange(t)
    mu = jnp.where(tt[None, :] < sample_length_in_training, mu_ema, cum_mean)
    return x / (mu[:, None, :] + 1e-10)


_NORMS = {
    "offline_laplace_norm": offline_laplace_norm,
    "cumulative_laplace_norm": cumulative_laplace_norm,
    "offline_gaussian_norm": offline_gaussian_norm,
    "cumulative_layer_norm": cumulative_layer_norm,
    "forgetting_norm": forgetting_norm,
    "hybrid_norm": hybrid_norm,
}


def norm_wrapper(norm_type: str):
    """String -> normalization function (reference ``norm_wrapper``)."""
    try:
        return _NORMS[norm_type]
    except KeyError:
        raise NotImplementedError(
            f"Unknown norm {norm_type!r}. Choose from {sorted(_NORMS)}."
        ) from None


def laplace_norm_from_stats(v, total, count):
    """Offline laplace normalization of ``v`` given externally computed
    masked statistics (``total`` = sum over real elements, ``count`` =
    their number, both broadcastable to ``v``). The single copy of the
    formula for every ``valid_frames`` path — incl. callers whose sums
    need correction terms a plain masked sum can't express (Fast
    FullSubNet's reconstructed partial tail block)."""
    mu = total / count
    return v / (mu + 1e-5)


def gaussian_norm_from_stats(v, total, sumsq, count):
    """Offline gaussian normalization from masked first/second moments:
    UNBIASED variance (torch.std ddof=1) in the count-based form (only
    the real elements' ``(0 - mu)^2`` terms enter). The clamp guards the
    f32 catastrophic-cancellation NaN for near-constant inputs — keep
    every bucketed path on this one copy."""
    mu = total / count
    var = jnp.maximum((sumsq - count * jnp.square(mu)) / (count - 1.0), 0.0)
    return (v - mu) / (jnp.sqrt(var) + 1e-5)


def masked_offline_norm(norm_fn, valid_total):
    """Masked (true-count) variant of an offline norm for zero-padded,
    length-bucketed inputs — the statistics are computed over the REAL
    frames only, so normalized valid frames exactly equal an unpadded
    run's. ``valid_total``: [b, 1, 1, 1] float true frame counts (b in
    {1, B}). Returns ``None`` for causal norms (cumulative laplace/layer,
    forgetting): frame t sees only frames <= t, so zero-padded tails
    leave the valid frames untouched and the norm is exact as-is.

    Shared by every model family's ``valid_frames`` path
    (models/fullsubnet.py, models/fullband.py, models/fast_fullsubnet.py)
    — one copy of the masked statistics, one set of tests.
    """
    import numpy as np

    if norm_fn is offline_laplace_norm:

        def masked(v):
            # padded frames are zero, so plain sums ARE the masked sums;
            # only the divisor must be the true count
            count = np.prod([int(s) for s in v.shape[1:-1]]) * valid_total
            total = jnp.sum(v, axis=tuple(range(1, v.ndim)), keepdims=True)
            return laplace_norm_from_stats(v, total, count)

        return masked

    if norm_fn is offline_gaussian_norm:

        def masked(v):
            # padded inputs are already zero, so plain sums give the
            # masked first/second moments
            count = np.prod([int(s) for s in v.shape[1:-1]]) * valid_total
            axes = tuple(range(1, v.ndim))
            total = jnp.sum(v, axis=axes, keepdims=True)
            sumsq = jnp.sum(jnp.square(v), axis=axes, keepdims=True)
            return gaussian_norm_from_stats(v, total, sumsq, count)

        return masked

    return None
