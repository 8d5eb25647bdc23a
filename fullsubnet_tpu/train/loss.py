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


def masked_waveform_loss(loss_fn, pred, target, valid_mask, true_count):
    """Exact unpadded-run waveform loss from zero-padded, length-bucketed
    signals: ``pred``/``target`` [..., T_bucket] with pads already zero,
    ``valid_mask`` broadcastable 0/1 over the last axis, ``true_count``
    the (traced) number of real samples. mse/l1 rescale their mean to the
    true count; si_snr centers with MASKED means and re-masks, after
    which every inner product equals the unpadded run's. Returns None for
    loss functions without an exact masked form (callers fall back to
    exact-length compiles)."""
    t_pad = pred.shape[-1]
    count = jnp.asarray(true_count, jnp.float32)
    if loss_fn is mse_loss or loss_fn is l1_loss:
        return loss_fn(pred * valid_mask, target * valid_mask) * (
            t_pad / count
        )
    if loss_fn is si_snr_loss:
        eps = 1e-8
        mu_p = jnp.sum(pred * valid_mask, axis=-1, keepdims=True) / count
        mu_t = jnp.sum(target * valid_mask, axis=-1, keepdims=True) / count
        p = (pred - mu_p) * valid_mask
        t = (target - mu_t) * valid_mask
        s_target = (
            jnp.sum(p * t, axis=-1, keepdims=True)
            * t
            / (jnp.sum(jnp.square(t), axis=-1, keepdims=True) + eps)
        )
        e_noise = p - s_target
        ratio = jnp.sum(jnp.square(s_target), axis=-1) / (
            jnp.sum(jnp.square(e_noise), axis=-1) + eps
        )
        return -jnp.mean(10 * jnp.log10(ratio + eps))
    return None


# losses with an exact masked (zero-padded bucket) form above
MASKED_WAVEFORM_LOSSES = (mse_loss, l1_loss, si_snr_loss)


LOSS_REGISTRY = {
    "mse_loss": mse_loss,
    "l1_loss": l1_loss,
    "si_snr_loss": si_snr_loss,
}
