"""Loss functions (reference twin: ``audio_zen/loss.py``)."""

import jax.numpy as jnp


def mse_loss(pred, target):
    return jnp.mean(jnp.square(pred - target))


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def si_snr_loss(pred, target, eps: float = 1e-8):
    """Negative scale-invariant SNR (reference ``loss.py:7-39``).

    pred/target: [..., T] waveforms.
    """
    # the reference raises on mismatched shapes; without this a stray
    # channel dim would broadcast into a cross-paired, meaningless loss
    assert pred.shape == target.shape, (
        f"si_snr_loss shape mismatch: pred {pred.shape} vs target "
        f"{target.shape}"
    )
    pred = pred - jnp.mean(pred, axis=-1, keepdims=True)
    target = target - jnp.mean(target, axis=-1, keepdims=True)
    s_target = (
        jnp.sum(pred * target, axis=-1, keepdims=True)
        * target
        / (jnp.sum(jnp.square(target), axis=-1, keepdims=True) + eps)
    )
    e_noise = pred - s_target
    ratio = jnp.sum(jnp.square(s_target), axis=-1) / (
        jnp.sum(jnp.square(e_noise), axis=-1) + eps
    )
    return -jnp.mean(10 * jnp.log10(ratio + eps))


LOSS_REGISTRY = {
    "mse_loss": mse_loss,
    "l1_loss": l1_loss,
    "si_snr_loss": si_snr_loss,
}
