"""Gradient accumulation: one shared scan so the trainer and bench.py
measure/ship identical semantics.

Microbatching (how a [B, ...] batch becomes [G, B/G, ...]) stays with the
caller — the trainer interleaves across the data-mesh axis so each
microbatch is an equal slice of every device's shard (no cross-device
movement); bench.py reshapes a single-device batch directly. The
accumulation itself — fp32 grad sums over a ``lax.scan``, mean-reduced
loss and grads — lives here once.
"""

import jax
import jax.numpy as jnp


def scan_accumulated_value_and_grad(loss_fn, params, microbatched, g_accum):
    """Mean loss + mean grads over ``g_accum`` equal microbatches.

    ``loss_fn(params, *xs)`` -> scalar loss; ``microbatched`` is a tuple
    of arrays, each with leading dim ``g_accum``. Grads are accumulated
    in fp32 regardless of the param dtype (bf16 partial sums would lose
    low bits across microbatches); equal microbatches make the mean
    reduction exact vs the monolithic step.
    """

    def body(carry, xs):
        acc, lsum = carry
        loss, grads = jax.value_and_grad(loss_fn)(params, *xs)
        acc = jax.tree.map(lambda q, g: q + g.astype(jnp.float32), acc, grads)
        return (acc, lsum + loss), None

    zeros = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params)
    (gsum, lsum), _ = jax.lax.scan(
        body, (zeros, jnp.float32(0.0)), microbatched
    )
    grads = jax.tree.map(lambda g: g / g_accum, gsum)
    return lsum / g_accum, grads


def largest_compatible_accum(requested: int, batch: int, data_div: int = 1):
    """Largest g <= requested with batch % (g * data_div) == 0 (>= 1).

    Used when an explicitly configured split meets an incompatible batch
    (config typo, or a partial final batch under drop_last=false): the
    nearest smaller compatible split preserves the OOM-protection intent
    instead of silently running the monolithic step.
    """
    data_div = max(int(data_div), 1)
    g = max(1, min(int(requested), batch // data_div or 1))
    while g > 1 and batch % (g * data_div) != 0:
        g -= 1
    return g
