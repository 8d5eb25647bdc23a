"""Multi-chip parallel inference.

Two sharding axes (see ``parallel.mesh``):

* ``data``    — utterances; embarrassingly parallel.
* ``subband`` — FullSubNet's frequency-batched sub-band axis. The sub-band
  LSTM runs on [B·F, unit, T]; sharding that leading axis over
  (data, subband) lets a single utterance's 257 frequency sequences spread
  across chips — the reference's drop_band *discards* frequencies for the
  same compute reduction; here they run in parallel instead.

``make_parallel_enhancer`` returns a jitted full-pipeline function
(wave -> STFT -> FullSubNet -> cIRM decompress -> mask -> iSTFT -> wave)
with the batch sharded over ``data`` and internal sharding constraints
that spread the sub-band scan over the whole mesh. Works on any Mesh,
including the virtual CPU mesh used in CI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fullsubnet_tpu.acoustics.mask import decompress_cIRM
from fullsubnet_tpu.acoustics.stft import istft, stft_complex


def make_parallel_enhancer(
    model,
    mesh: Mesh,
    n_fft: int = 512,
    hop_length: int = 256,
    win_length: int = 512,
    compute_dtype=jnp.float32,
    bucketed: bool = False,
):
    """Jitted sharded enhancement: (params, noisy [B, T]) -> enhanced [B, T].

    B must be divisible by the ``data`` axis size; the model's frequency
    count spreads over ``subband`` via an internal constraint.

    ``bucketed=True`` returns the length-bucketed variant
    ``(params, noisy [B, bucket], true_len [B]) -> enhanced [B, bucket]``
    (per-example true lengths, exact under padding — the
    ``infer.inferencer.build_bucketed_enhance_fn`` machinery with the
    sub-band rows spread over the mesh): the multi-chip production shape
    for enhancing many arbitrary-length utterances per call.
    """
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))
    sb_constraint = NamedSharding(mesh, P(("data", "subband"), None, None))

    def shard_sb(x):
        # x: [B·F, unit, T] — spread rows over the full mesh
        return jax.lax.with_sharding_constraint(x, sb_constraint)

    # the Pallas route shard_maps the fused kernel over these row axes
    # when the hint carries them (models/fullsubnet.py:_pallas_subband);
    # without them the kernel would run replicated per chip
    shard_sb.mesh = mesh
    shard_sb.row_axes = ("data", "subband")

    if bucketed:
        from fullsubnet_tpu.infer.inferencer import build_bucketed_enhance_fn

        bfn = build_bucketed_enhance_fn(
            model,
            {"n_fft": n_fft, "hop_length": hop_length,
             "win_length": win_length},
            sharding_hint=shard_sb,
        )
        return jax.jit(
            bfn,
            in_shardings=(None, data_sh, data_sh),
            out_shardings=data_sh,
        )

    def fn(params, noisy):
        spec = stft_complex(noisy, n_fft, hop_length, win_length)
        noisy_mag = jnp.abs(spec)[:, None].astype(compute_dtype)
        crm = model(
            params, noisy_mag, dropping_band=False, sharding_hint=shard_sb
        )
        crm = jnp.transpose(crm, (0, 2, 3, 1)).astype(jnp.float32)
        crm = decompress_cIRM(crm)
        er = crm[..., 0] * spec.real - crm[..., 1] * spec.imag
        ei = crm[..., 1] * spec.real + crm[..., 0] * spec.imag
        return istft(
            (er, ei), n_fft, hop_length, win_length,
            length=noisy.shape[-1], input_type="real_imag",
        )

    del repl  # params sharding inferred (replicated by default under jit)
    return jax.jit(fn, in_shardings=(None, data_sh), out_shardings=data_sh)
