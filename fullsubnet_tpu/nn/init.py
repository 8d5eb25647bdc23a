"""Parameter initializers mirroring the reference's ``weight_init``.

The reference applies (``audio_zen/model/base_model.py:374-439``):
* LSTM/GRU: orthogonal for >=2-D parameters, N(0,1) for biases,
* Linear: Xavier-normal weight, N(0,1) bias,
* Conv2d/3d: Xavier-normal weight, N(0,1) bias; Conv1d: N(0,1).

Orthogonal/Xavier match the torch definitions so a freshly initialized
model is statistically interchangeable with the reference's.
"""

import jax
import jax.numpy as jnp


def normal(key, shape, dtype=jnp.float32, mean=0.0, std=1.0):
    return mean + std * jax.random.normal(key, shape, dtype)


def xavier_normal(key, shape, dtype=jnp.float32, gain=1.0):
    """Xavier/Glorot normal for a [out, in] (or conv) weight."""
    fan_out, fan_in = shape[0], shape[1]
    receptive = 1
    for s in shape[2:]:
        receptive *= s
    std = gain * (2.0 / ((fan_in + fan_out) * receptive)) ** 0.5
    return std * jax.random.normal(key, shape, dtype)


def orthogonal(key, shape, dtype=jnp.float32, gain=1.0):
    """(Semi-)orthogonal init for a 2-D matrix, matching torch semantics:
    QR of a standard normal, sign-corrected by the diagonal of R."""
    rows, cols = shape
    flat = (max(rows, cols), min(rows, cols))
    a = jax.random.normal(key, flat, jnp.float32)
    q, r = jnp.linalg.qr(a)
    q = q * jnp.sign(jnp.diagonal(r))
    if rows < cols:
        q = q.T
    return (gain * q[:rows, :cols]).astype(dtype)


def rnn_weight_init(key, params: dict) -> dict:
    """Re-initialize an LSTM/GRU layer dict: orthogonal matrices, N(0,1) biases."""
    out = {}
    for name, value in params.items():
        key, sub = jax.random.split(key)
        if value.ndim >= 2:
            out[name] = orthogonal(sub, value.shape, value.dtype)
        else:
            out[name] = normal(sub, value.shape, value.dtype)
    return out


def linear_init(key, in_features: int, out_features: int, dtype=jnp.float32):
    """Linear layer params in torch layout: weight [out, in], bias [out].

    Xavier-normal weight + N(0,1) bias, per the reference's ``weight_init``.
    """
    kw, kb = jax.random.split(key)
    return {
        "weight": xavier_normal(kw, (out_features, in_features), dtype),
        "bias": normal(kb, (out_features,), dtype),
    }
