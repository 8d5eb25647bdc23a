"""Analytic FLOPs / MFU / roofline accounting for bench.py.

Every model family gets a closed-form forward-FLOP count derived from its
own ``SequenceModel`` stage shapes (gate GEMMs + output projections — the
standard matmul-only MFU convention; pointwise/transcendental work is
excluded, so MFU here is conservative). bench.py merges these into its
JSON rows as ``mfu``, ``hbm_bw_util_lb`` and ``roofline_ratio`` so the
CLAUDE.md/docs claims ("~41% MXU sub-band kernel", "bwd at the ~2.4x
structural roofline") are reproducible by running the suite.

Bytes are a LOWER BOUND: per-stage activation reads/writes plus one
parameter sweep. XLA fusion can only reduce real traffic toward this
bound, never below it, so ``roofline_ratio`` (= roofline time / measured
time) is conservative: 1.0 means speed-of-light under the bound.

Reference parity note: the reference publishes no FLOPs accounting; this
is TPU-first observability (SURVEY §5 tracing/profiling).
"""

from __future__ import annotations

# Peak numbers per device_kind (matmul peak at the bench's compute dtype,
# HBM bandwidth). v5e: 394 bf16 TOPS/2 = 197 TFLOP/s, 819 GB/s HBM.
# f32 runs through the MXU at ~1/8 of bf16 on v5e-class hardware (6-pass
# f32 emulation); quote the bf16 peak for both and let the dtype field
# on the row carry the caveat — MFU is conventionally vs hardware max.
_PEAKS = {
    "TPU v5 lite": {"tflops": 197.0, "hbm_gbps": 819.0},
    "TPU v5e": {"tflops": 197.0, "hbm_gbps": 819.0},
    "TPU v4": {"tflops": 275.0, "hbm_gbps": 1228.0},
    "TPU v5p": {"tflops": 459.0, "hbm_gbps": 2765.0},
    "TPU v6 lite": {"tflops": 918.0, "hbm_gbps": 1640.0},
}


def device_peaks():
    """Peak (tflops, hbm_gbps) for jax device 0, or None off-TPU (an MFU
    against a CPU 'peak' would be noise, not a metric)."""
    import jax

    try:
        kind = jax.devices()[0].device_kind
    except Exception:  # uninitialized backend
        return None
    for name, peaks in _PEAKS.items():
        if name.lower() in kind.lower():
            return dict(peaks, device_kind=kind)
    return None


def _gates(sm) -> int:
    return 4 if sm.sequence_model.upper() == "LSTM" else 3


def seq_model_flops(sm, rows: int, steps: int) -> int:
    """Matmul FLOPs of one SequenceModel forward: per row-step each layer
    runs one [1, in+H] x [in+H, G*H] GEMM (2 flops/MAC), plus the output
    projection."""
    dirs = 2 if sm.bidirectional else 1
    f = 0
    in_sz = sm.input_size
    for _ in range(sm.num_layers):
        f += dirs * rows * steps * 2 * _gates(sm) * sm.hidden_size * (in_sz + sm.hidden_size)
        in_sz = sm.hidden_size * dirs
    if sm.output_size:
        f += rows * steps * 2 * (sm.hidden_size * dirs) * sm.output_size
    return f


def seq_model_io_elems(sm, rows: int, steps: int) -> int:
    """Stage activation traffic lower bound, in elements: read the input
    once, write the output once (recurrent state stays on-die)."""
    out = sm.output_size or sm.hidden_size * (2 if sm.bidirectional else 1)
    return rows * steps * (sm.input_size + out)


def _param_count(sm) -> int:
    dirs = 2 if sm.bidirectional else 1
    g = _gates(sm)
    n = 0
    in_sz = sm.input_size
    for _ in range(sm.num_layers):
        n += dirs * (g * sm.hidden_size * (in_sz + sm.hidden_size) + 2 * g * sm.hidden_size)
        in_sz = sm.hidden_size * dirs
    if sm.output_size:
        n += sm.hidden_size * dirs * sm.output_size + sm.output_size
    return n


def _stages(model, batch: int, frames: int, drop_groups: int = 1):
    """Yield (SequenceModel, rows, steps) per stage for any family.

    ``frames`` is the model-input frame count (the flagship pipeline's
    hop clock; the improved model derives its own from samples upstream).
    ``drop_groups`` > 1 shrinks the flagship/sub-band row count the way
    the trainer's fused drop_band path does (F -> F/groups).
    """
    name = type(model).__name__
    t = frames + getattr(model, "look_ahead", 0)
    if name == "FullSubNet":
        f_eff = model.num_freqs // drop_groups if drop_groups > 1 else model.num_freqs
        yield model.fb_model, batch, t
        yield model.sb_model, batch * f_eff, t
    elif name == "SubBandBaseline":
        # F is an input property for this model (no ctor attr); account
        # at the paper spectrum unless the caller set one
        f = getattr(model, "num_freqs", 257)
        f_eff = f // drop_groups if drop_groups > 1 else f
        yield model.sb_model, batch * f_eff, t
    elif name == "FullBandModel":
        yield model.fullband_model, batch, t
    elif name == "FastFullSubNet":
        s = model.shrink_size
        t_down = (t - 1 + s - 1) // s + 1  # block 0 + ceil blocks
        yield model.encoder[0], batch, t
        yield model.encoder[1], batch, t
        yield model.bottleneck, batch * model.num_mels, t_down
        yield model.decoder_lstm[0], batch, t
        yield model.decoder_lstm[1], batch, t
    elif name == "ImprovedFullSubNet":
        yield model.fb_model, batch, frames
        for (n_units, _width), sm in zip(
            model._section_shapes(), model.sb_model.sb_models
        ):
            yield sm, batch * n_units, frames
    else:
        raise ValueError(f"no analytic FLOPs model for {name}")


def model_fwd_flops(model, batch: int, frames: int, drop_groups: int = 1) -> int:
    return sum(
        seq_model_flops(sm, r, s)
        for sm, r, s in _stages(model, batch, frames, drop_groups)
    )


def model_min_bytes(
    model, batch: int, frames: int, itemsize: int = 2, drop_groups: int = 1
) -> int:
    """HBM traffic lower bound per forward: stage activations in/out at
    the compute dtype + one parameter sweep."""
    elems = sum(
        seq_model_io_elems(sm, r, s)
        for sm, r, s in _stages(model, batch, frames, drop_groups)
    )
    params = sum(
        _param_count(sm) for sm, _, _ in _stages(model, batch, frames, drop_groups)
    )
    return (elems + params) * itemsize


def roofline_fields(
    model,
    batch: int,
    frames: int,
    seconds_per_step: float,
    *,
    itemsize: int = 2,
    drop_groups: int = 1,
    train: bool = False,
) -> dict:
    """The mfu/hbm_bw_util_lb/roofline_ratio row fields, or {} off-TPU.

    ``train=True`` applies the standard 3x matmul convention (forward +
    two backward GEMMs per forward GEMM; optimizer work is negligible —
    measured 0.4 ms, CLAUDE.md) and doubles the traffic bound (activation
    stash written then re-read).
    """
    peaks = device_peaks()
    if peaks is None or seconds_per_step <= 0:
        return {}
    flops = model_fwd_flops(model, batch, frames, drop_groups)
    byts = model_min_bytes(model, batch, frames, itemsize, drop_groups)
    if train:
        flops *= 3
        byts *= 2
    t_flops = flops / (peaks["tflops"] * 1e12)
    t_bytes = byts / (peaks["hbm_gbps"] * 1e9)
    return {
        "analytic_tflops": round(flops / 1e12, 4),
        "mfu": round(t_flops / seconds_per_step, 4),
        "hbm_bw_util_lb": round(t_bytes / seconds_per_step, 4),
        "roofline_ratio": round(max(t_flops, t_bytes) / seconds_per_step, 4),
        "peak_tflops": peaks["tflops"],
    }
