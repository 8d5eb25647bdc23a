"""Pallas TPU kernel: fused N-layer sub-band LSTM scan + output projection.

FullSubNet's sub-band stage — stacked LSTM layers over the
frequency-batched axis plus a Linear head — is the framework's hot loop
(~99% of FLOPs). This kernel runs the WHOLE scan for a tile of rows with
everything hot on-chip (any stack depth >= 1; the recipe models use 2,
fullband_baseline 3 — reference
recipes/dns_interspeech_2020/fullband_baseline/model.py:31-38):

* every layer's weights stay **resident in VMEM** for all T steps,
* LSTM states (h_i, c_i) live in **VMEM scratch**, persisting across
  the sequential grid steps (TPU grids execute in order),
* the per-step input slice and the per-step output are streamed HBM<->VMEM
  by the Pallas pipeline (auto double-buffering via BlockSpec index maps),
* the inter-layer activation h1 never exists outside VMEM, and the output
  written to HBM is the 2-dim mask — not the [T, N, H] hidden sequence.

Grid = (row_tiles, T): time is the fastest axis, so each row tile scans
t = 0..T-1 with its states initialized at t == 0.

Layout notes (the part that makes this work at scale): XLA/TPU pads the
minor two dims of every HBM array to the (sublane, lane) tile, so a
[T, N, 2] output would physically occupy 64x its logical bytes and a
[T, N, 32] input 4x. The kernel therefore uses **feature-major** layouts —
input [T, F_in, N], output [OUT, T, N] — keeping the large N axis minor
and unpadded.

Weight layout contract (torch-compatible, see ``fullsubnet_tpu.nn.rnn``):
layer dicts carry w_ih [4H, in], w_hh [4H, H] with gate order i,f,g,o and
biases fused as b_ih + b_hh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lstm_step(x_t, h_ref, c_ref, w_ref, b_ref, hidden):
    xh = jnp.concatenate([x_t, h_ref[:].astype(x_t.dtype)], axis=-1)
    gates = (
        jnp.dot(xh, w_ref[:], preferred_element_type=jnp.float32)
        + b_ref[0]
    )
    i = jax.nn.sigmoid(gates[:, :hidden])
    f = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden :])
    c = f * c_ref[:] + i * g
    h = o * jnp.tanh(c)
    c_ref[:] = c
    h_ref[:] = h
    return h


def _gru_step(x_t, h_ref, _c_ref, w_ref, b_ref, hidden):
    # torch GRU: the reset gate scales (W_hn h + b_hn), so the x and h
    # projections stay separate; w_ref stacks [W_ih^T; W_hh^T],
    # b_ref rows = (b_ih, b_hh)
    f_in = x_t.shape[-1]
    xw = (
        jnp.dot(x_t, w_ref[:f_in], preferred_element_type=jnp.float32)
        + b_ref[0]
    )
    hw = jnp.dot(
        h_ref[:].astype(x_t.dtype), w_ref[f_in:],
        preferred_element_type=jnp.float32,
    )
    b_hh = b_ref[1]
    rz = jax.nn.sigmoid(
        xw[:, : 2 * hidden] + hw[:, : 2 * hidden] + b_hh[: 2 * hidden]
    )
    r = rz[:, :hidden]
    z = rz[:, hidden:]
    n = jnp.tanh(xw[:, 2 * hidden :] + r * (hw[:, 2 * hidden :] + b_hh[2 * hidden :]))
    h = (1.0 - z) * n + z * h_ref[:]
    h_ref[:] = h
    return h


def _kernel(
    x_ref,      # [1, F_in, TILE]
    *rest,      # (w_i, b_i) per layer  w [in_i + H, G·H], b [1|2, G·H];
                # wfc [H, OUT]; bfc [1, OUT]; out [OUT, 8, TILE];
                # scratch (h_i, c_i) per layer [TILE, H] f32 (c unused GRU)
    hidden: int,
    cell: str,
    num_layers: int,
):
    ws = rest[0 : 2 * num_layers : 2]
    bs = rest[1 : 2 * num_layers : 2]
    wfc_ref, bfc_ref, out_ref = rest[2 * num_layers : 2 * num_layers + 3]
    scratch = rest[2 * num_layers + 3 :]
    hs = scratch[0::2]
    cs = scratch[1::2]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        for s in scratch:
            s[:] = jnp.zeros_like(s)

    step = _lstm_step if cell == "lstm" else _gru_step
    x_t = x_ref[0].T  # [TILE, F_in]
    cdt = x_t.dtype
    h_t = x_t
    for li in range(num_layers):
        h_t = step(h_t.astype(cdt), hs[li], cs[li], ws[li], bs[li], hidden)
    out = (
        jnp.dot(
            h_t.astype(wfc_ref.dtype), wfc_ref[:],
            preferred_element_type=jnp.float32,
        )
        + bfc_ref[0]
    )  # [TILE, OUT]
    # the out block covers 8 consecutive timesteps (block revisiting): write
    # this step's slot; Pallas flushes when the block index advances
    slot = pl.program_id(1) % 8
    out_ref[:, pl.ds(slot, 1), :] = out.T[:, None, :].astype(out_ref.dtype)


def _cell_of(l1: dict) -> tuple[int, str]:
    hidden = l1["w_hh"].shape[1]
    num_gates = l1["w_ih"].shape[0] // hidden
    return hidden, {4: "lstm", 3: "gru"}[num_gates]


def _prep_weights(layers, fc, compute_dtype, cell):
    """Torch-layout layer dicts -> the kernel's resident VMEM operands.

    [W_ih^T stacked over W_hh^T] -> one [in+H, G·H] operand per layer;
    LSTM biases fuse (b_ih + b_hh), GRU keeps both rows (the reset gate
    scales W_hn h + b_hn). Returns (ws, bs, wfc, bfc) with ws/bs tuples
    in layer order.
    """
    ws = tuple(
        jnp.concatenate([l["w_ih"], l["w_hh"]], axis=1).T.astype(compute_dtype)
        for l in layers
    )
    if cell == "lstm":
        bs = tuple(
            (l["b_ih"] + l["b_hh"]).astype(jnp.float32)[None, :] for l in layers
        )
    else:
        bs = tuple(
            jnp.stack([l["b_ih"], l["b_hh"]]).astype(jnp.float32) for l in layers
        )
    wfc = fc["weight"].T.astype(compute_dtype)  # [H, OUT]
    bfc = fc["bias"].astype(jnp.float32)[None, :]
    return ws, bs, wfc, bfc


def _const_spec(a):
    return pl.BlockSpec(
        a.shape, lambda r, tt, _s=a.shape: tuple(0 for _ in _s),
        memory_space=pltpu.VMEM,
    )


def _infer_impl(x, layers, fc, row_tile, interpret):
    """The fast (no-stash) kernel invocation. x: [T, F_in, N]."""
    t, f_in, n = x.shape
    num_layers = len(layers)
    hidden, cell = _cell_of(layers[0])
    out_dim = fc["weight"].shape[0]
    compute_dtype = x.dtype
    ws, bs, wfc, bfc = _prep_weights(layers, fc, compute_dtype, cell)

    n_pad = -(-n // row_tile) * row_tile
    t_pad = -(-t // 8) * 8  # out blocks span 8 timesteps
    if n_pad != n or t_pad != t:
        x = jnp.pad(x, ((0, t_pad - t), (0, 0), (0, n_pad - n)))
    num_tiles = n_pad // row_tile

    wb = []
    wb_specs = []
    for w, b in zip(ws, bs):
        wb += [w, b]
        wb_specs += [_const_spec(w), _const_spec(b)]

    out = pl.pallas_call(
        functools.partial(
            _kernel, hidden=hidden, cell=cell, num_layers=num_layers
        ),
        grid=(num_tiles, t_pad),
        in_specs=[
            pl.BlockSpec(
                (1, f_in, row_tile), lambda r, tt: (tt, 0, r),
                memory_space=pltpu.VMEM,
            ),
            *wb_specs,
            _const_spec(wfc),
            _const_spec(bfc),
        ],
        out_specs=pl.BlockSpec(
            (out_dim, 8, row_tile), lambda r, tt: (0, tt // 8, r),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((out_dim, t_pad, n_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((row_tile, hidden), jnp.float32)
            for _ in range(2 * num_layers)
        ],
        interpret=interpret,
        # deeper stacks keep more resident weights; the tuned 2-layer
        # inference path keeps XLA's automatic scoped-VMEM limit
        compiler_params=(
            None if interpret or num_layers <= 2
            else pltpu.CompilerParams(vmem_limit_bytes=_BWD_VMEM_LIMIT)
        ),
    )(x, *wb, wfc, bfc)

    return jnp.transpose(out[:, :t, :n], (1, 2, 0))  # [T, N, OUT]


# ==========================================================================
# Differentiable training variant (custom VJP)
# ==========================================================================
#
# The reference trains its sub-band stage through cuDNN's fused LSTM
# forward+backward (audio_zen/model/module/sequence_model.py:52-66 under
# torch autograd). Here the backward is a pair of Pallas kernels:
#
# * The training FORWARD is `_kernel` plus per-step state stashes
#   (h1, c1, h2, c2 for LSTM; h1, h2 for GRU) written to HBM in the
#   compute dtype, laid out [T, N, H] (H minor — a multiple of the lane
#   width; N on the sublane axis) so the stash is unpadded.
# * The BACKWARD runs one kernel PER LAYER over a time-REVERSED grid
#   (index maps read block T-1-t), carrying (dh, dc) in VMEM scratch and
#   accumulating the weight gradients directly in the revisited output
#   block (initialized at the first grid step, flushed when the row tile
#   advances). Gates are recomputed from the stashed states — the cuDNN
#   trade: stash 2H per layer-step, recompute the 4H gate tensor.
# * Bias gradients ride along as an augmented all-ones column on the
#   [TILE, in] / [TILE, H] left operands of the dW GEMMs, so dW, db_ih and
#   db_hh come out of exactly two MXU contractions per layer-step.
# * The fc head's backward is two plain XLA einsums — no kernel needed.
#
# Splitting the backward per layer keeps VMEM under budget: each kernel
# holds one layer's weights + one [in+8, G·H] f32 accumulator (~7-12 MB at
# row_tile=256) instead of both layers' (~20 MB > 16 MB/core).
#
# Two capacity escapes keep this the training path at ANY shape:
#
# * TIME-CHUNKED STASH (``chunk`` > 0): when the full [T, N, H] stash
#   would not fit the HBM budget, the forward stashes only CHUNK-BOUNDARY
#   states (the per-step stash out-block index map becomes ``tt // chunk``
#   — block revisiting means only the last write per chunk reaches HBM)
#   and the backward re-runs the stash forward one chunk at a time from
#   its boundary state (remat at chunk granularity), then runs the layer
#   backward kernels over that chunk with (dh, dc) carries threaded
#   between chunks. Peak stash = (T/chunk + chunk) x [N, H] states
#   instead of T. All kernels take chunk-initial states / incoming
#   cotangent carries and emit final carries, so the unchunked path is
#   just the chunked path with one chunk that starts at zeros.
# * SPLIT-dW BACKWARD (``split_dw``): when a layer's two [in+8, G·H] f32
#   VMEM accumulators + weights + streamed blocks would exceed the 16 MB
#   budget (wide H > ~448, or f32 compute at H=384 — see
#   ``_auto_split_dw``), the split variant streams the per-step gate
#   cotangents to HBM instead and computes dW / db as big XLA einsums
#   afterwards — MXU-friendly and VMEM-light. Streaming [T, N, G·H] is
#   only reasonable when N is modest, which these cases are (the
#   512-hidden full-band stages run N = B rows, not B·F).


_DEFAULT_STASH_BUDGET = 6 * 2**30  # bytes of HBM for backward state stashes
# VMEM the fused-accumulate backward may claim (by the shape estimate
# below, at the REFERENCE tile 128) before the layer switches to the
# split-dW variant. Raising this to admit the wide H=512-bf16 /
# H=384-f32 layers fused was measured NEUTRAL-OR-WORSE on v5e (flagship
# 986 vs 997, improved 987 vs 1020 audio-s/s) — wide layers stay split.
_FUSED_DW_VMEM_LIMIT = 12 * 2**20
# Mosaic scoped-VMEM ceiling for the backward kernels. XLA's automatic
# per-program limit is ~16 MB in some surrounding programs (measured: the
# same bf16 H=384 fused-dW kernel compiles inside the monolithic flagship
# train step but hits "scoped allocation 17.87M > 16.00M" standalone and
# inside the row-grouped lax.map program), so the limit is pinned
# explicitly. Mosaic's REAL stack runs ~1.8x the shape estimate below
# (double-buffered revisited accumulator blocks + compute temporaries
# the estimate does not count: bf16 H=384 layer 2 estimates 9.9 MB at
# tile 128, measures 17.9 MB). 48 MB admits the flagship backward at
# row tile 512 (estimate ~18 MB -> ~33 MB actual, compile-verified;
# tile 1024 at ~29 MB est does NOT compile under 64 MB — don't retry);
# the kernels' streamed blocks stay small so pipelining VMEM is ample.
_BWD_VMEM_LIMIT = 48 * 2**20
# estimate-scale cap corresponding to _BWD_VMEM_LIMIT. Measured
# estimate->actual ratios run 1.8-1.9x; divide by 2.0 so an estimate at
# the cap still compiles with margin (a config landing between /2.0 and
# /1.8 merely drops to the next smaller tile).
_BWD_VMEM_ESTIMATE_CAP = int(_BWD_VMEM_LIMIT / 2.0)
# Reference tile for the fused-vs-split decision: evaluating it at the
# ACTUAL tile would flip measured-good fused configs to split at larger
# tiles (the accumulators don't scale with the tile; blocks/carries do).
_SPLIT_DECISION_TILE = 128


def _bwd_vmem_estimate(f_in, hidden, gh, row_tile, itemsize, cell, split):
    """Shape-level VMEM estimate for one layer's backward kernel, fused
    (dW accumulated in revisited out blocks) or split (gate cotangents
    streamed to HBM). Mosaic's real stack is ~1.8x this."""
    w = (f_in + hidden) * gh * itemsize
    n_h = 4 if cell == "lstm" else 2  # dh + hprev (+ cprev, ccur)
    blocks = 2 * row_tile * (n_h * hidden + 2 * f_in) * itemsize  # dbuf'd
    carries = (6 if cell == "lstm" else 3) * row_tile * hidden * 4
    scratch = (2 if cell == "lstm" else 1) * row_tile * hidden * 4
    if split:
        dg_out = (1 if cell == "lstm" else 2) * 2 * row_tile * gh * itemsize
        return w + blocks + carries + scratch + dg_out
    acc = (f_in + hidden + 16) * gh * 4  # two f32 aug accumulators
    return w + acc + blocks + carries + scratch


def _auto_split_dw(f_in, hidden, gh, row_tile, itemsize, cell):
    """True when the layer's backward must run the split-dW (streamed
    gate cotangent) variant. Decided at the reference tile — see
    _SPLIT_DECISION_TILE; ``row_tile`` is accepted for API compatibility
    but does not affect the decision."""
    del row_tile
    return (
        _bwd_vmem_estimate(
            f_in, hidden, gh, _SPLIT_DECISION_TILE, itemsize, cell, False
        )
        > _FUSED_DW_VMEM_LIMIT
    )


def auto_fwd_row_tile(n: int, cap: int = 512) -> int:
    """Inference row tile: distribute ``n`` rows evenly over the minimum
    number of <=``cap`` tiles, rounded up to a 128 multiple.

    ``min(cap, ceil128(n))`` wastes real compute on odd row counts: 640
    rows under a hard 512 tile run as 2x512 = 1024 padded rows (60%
    waste); the even split is 2x384 = 768. Shapes that already divide
    cleanly (the flagship's 32896 rows -> 65x512) are unchanged. Big
    tiles still win (per-grid-step overhead), so the tile count stays
    minimal — this only shrinks the LAST tile's worth of padding."""
    n = max(1, int(n))
    tiles = -(-n // cap)
    return min(cap, -(-(-(-n // tiles)) // 128) * 128)


def auto_bwd_row_tile(layers, itemsize, n, split_dw=None) -> int:
    """Largest backward row tile in (512, 256, 128) whose per-layer
    kernel VMEM (fused or split, per the layer's own routing or the
    caller's ``split_dw`` override) fits ``_BWD_VMEM_ESTIMATE_CAP``,
    restricted to tiles that do NOT increase the padded row count over
    the 128-tile baseline. Bigger tiles amortize per-grid-step overheads
    (flagship B=128 train went 1083 -> 1176 audio-s/s from 128 -> 512 on
    v5e — the bwd is overhead/VPU bound), but padding 640 real rows to
    1024 would cost 1.6x compute for that ~8%, so a big tile is taken
    only when it pads nothing extra. COROLLARY the budget gates rely on:
    the kernel's padded rows always equal ceil(n/128)*128, so 128-padded
    stash accounting (``train_stash_bytes``) is exact.

    ``layers`` is the layer-dict sequence (any length >= 1)."""
    hidden, cell = _cell_of(layers[0])
    shapes = [(l["w_ih"].shape[1], l["w_ih"].shape[0]) for l in layers]
    n_pad128 = -(-n // 128) * 128
    for tile in (512, 256, 128):
        if -(-n // tile) * tile != n_pad128:
            continue
        ok = True
        for f_in, gh in shapes:
            split = (
                _auto_split_dw(f_in, hidden, gh, tile, itemsize, cell)
                if split_dw is None
                else split_dw
            )
            if (
                _bwd_vmem_estimate(f_in, hidden, gh, tile, itemsize, cell, split)
                > _BWD_VMEM_ESTIMATE_CAP
            ):
                ok = False
                break
        if ok:
            return tile
    return 128


def _kernel_train_fwd(
    x_ref, *rest, hidden: int, cell: str, num_layers: int,
):
    """`_kernel` + per-step state stashes + chunk-initial states.

    rest = (w_i, b_i) per layer;  wfc; bfc;
           per-layer chunk-initial states (inputs, [TILE, H] blocks):
             LSTM (h_i0, c_i0), GRU (h_i0,);
           out;  per-layer stashes (outputs): LSTM (h_is, c_is), GRU
             (h_is,);
           scratch (h_i, c_i) per layer.

    With a boundary-chunked stash out spec (index map ``tt // chunk``)
    the per-step stash writes land in a revisited VMEM block and only the
    LAST step of each chunk reaches HBM — i.e. the state ENTERING the
    next chunk.
    """
    s = 2 if cell == "lstm" else 1  # stashed states per layer
    ws = rest[0 : 2 * num_layers : 2]
    bs = rest[1 : 2 * num_layers : 2]
    p = 2 * num_layers
    wfc_ref, bfc_ref = rest[p : p + 2]
    p += 2
    h0s = rest[p : p + s * num_layers]
    p += s * num_layers
    out_ref = rest[p]
    stash = rest[p + 1 : p + 1 + s * num_layers]
    scratch = rest[p + 1 + s * num_layers :]
    hs = scratch[0::2]
    cs = scratch[1::2]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        for li in range(num_layers):
            hs[li][:] = h0s[s * li][:].astype(jnp.float32)
            if cell == "lstm":
                cs[li][:] = h0s[s * li + 1][:].astype(jnp.float32)
            else:
                cs[li][:] = jnp.zeros_like(cs[li])

    step = _lstm_step if cell == "lstm" else _gru_step
    x_t = x_ref[0].T
    cdt = x_t.dtype
    h_t = x_t
    for li in range(num_layers):
        h_t = step(h_t.astype(cdt), hs[li], cs[li], ws[li], bs[li], hidden)
        stash[s * li][0] = h_t.astype(stash[s * li].dtype)
        if cell == "lstm":
            stash[s * li + 1][0] = cs[li][:].astype(stash[s * li + 1].dtype)
    out = (
        jnp.dot(
            h_t.astype(wfc_ref.dtype), wfc_ref[:],
            preferred_element_type=jnp.float32,
        )
        + bfc_ref[0]
    )
    slot = pl.program_id(1) % 8
    out_ref[:, pl.ds(slot, 1), :] = out.T[:, None, :].astype(out_ref.dtype)


def _stash_fwd_call(
    xp, layers, fc, h0s, *, row_tile, interpret, boundary_chunk=0
):
    """Run the stash forward over xp [t_pad, F_in, n_pad] from initial
    states ``h0s`` ([n_pad, H] arrays: per layer (h_i, c_i) for LSTM,
    (h_i,) for GRU). Returns (out [OUT, t_pad, n_pad] f32, stashes).

    ``boundary_chunk`` == 0 stashes every step ([t_pad, n_pad, H]);
    otherwise only chunk-end states ([t_pad/chunk, n_pad, H]).
    """
    t_pad, f_in, n_pad = xp.shape
    num_layers = len(layers)
    hidden, cell = _cell_of(layers[0])
    out_dim = fc["weight"].shape[0]
    cdt = xp.dtype
    ws, bs, wfc, bfc = _prep_weights(layers, fc, cdt, cell)
    num_tiles = n_pad // row_tile
    n_stash = (2 if cell == "lstm" else 1) * num_layers

    if boundary_chunk:
        stash_spec = pl.BlockSpec(
            (1, row_tile, hidden),
            lambda r, tt: (tt // boundary_chunk, r, 0),
            memory_space=pltpu.VMEM,
        )
        stash_t = t_pad // boundary_chunk
    else:
        stash_spec = pl.BlockSpec(
            (1, row_tile, hidden), lambda r, tt: (tt, r, 0),
            memory_space=pltpu.VMEM,
        )
        stash_t = t_pad
    h0_spec = pl.BlockSpec(
        (row_tile, hidden), lambda r, tt: (r, 0), memory_space=pltpu.VMEM
    )
    wb = []
    wb_specs = []
    for w, b in zip(ws, bs):
        wb += [w, b]
        wb_specs += [_const_spec(w), _const_spec(b)]
    results = pl.pallas_call(
        functools.partial(
            _kernel_train_fwd, hidden=hidden, cell=cell, num_layers=num_layers
        ),
        grid=(num_tiles, t_pad),
        in_specs=[
            pl.BlockSpec(
                (1, f_in, row_tile), lambda r, tt: (tt, 0, r),
                memory_space=pltpu.VMEM,
            ),
            *wb_specs,
            _const_spec(wfc), _const_spec(bfc),
        ] + [h0_spec] * n_stash,
        out_specs=[
            pl.BlockSpec(
                (out_dim, 8, row_tile), lambda r, tt: (0, tt // 8, r),
                memory_space=pltpu.VMEM,
            ),
        ] + [stash_spec] * n_stash,
        out_shape=[
            jax.ShapeDtypeStruct((out_dim, t_pad, n_pad), jnp.float32),
        ] + [
            jax.ShapeDtypeStruct((stash_t, n_pad, hidden), cdt)
        ] * n_stash,
        scratch_shapes=[
            pltpu.VMEM((row_tile, hidden), jnp.float32)
            for _ in range(2 * num_layers)
        ],
        interpret=interpret,
        # the training forward shares the backward's pinned scoped-VMEM
        # limit: at tile 512 its weights + stash blocks + scratch can
        # exceed XLA's ~16 MB automatic limit for wide stacks
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_BWD_VMEM_LIMIT
        ),
    )(xp, *wb, wfc, bfc, *h0s)
    return results[0], tuple(results[1:])


def _lstm_layer_bwd_kernel(
    dh_ref,     # [1, TILE, H]  incoming per-step dL/dh
    x_ref,      # [1, F_in, TILE] (feature-major) or [1, TILE, F_in]
    hprev_ref,  # [1, TILE, H]  stashed h_{t-1}
    cprev_ref,  # [1, TILE, H]  stashed c_{t-1}
    ccur_ref,   # [1, TILE, H]  stashed c_t
    h0_ref,     # [TILE, H]  chunk-initial h (used at the chunk's first step)
    c0_ref,     # [TILE, H]
    dhin_ref,   # [TILE, H] f32  incoming carry dL/dh_{chunk_end}
    dcin_ref,   # [TILE, H] f32
    w_ref,      # [F_in + H, 4H]
    b_ref,      # [1, 4H] fused b_ih + b_hh
    dx_ref,     # [1, F_in, TILE] or [1, TILE, F_in]
    *rest,
    hidden: int,
    t_total: int,
    x_feature_major: bool,
    split_dw: bool,
):
    if split_dw:
        # stream the gate cotangents; dW/db become XLA einsums outside
        dg_ref, dhout_ref, dcout_ref, dh_c, dc_c = rest
        dwih_ref = dwhh_ref = None
    else:
        dwih_ref, dwhh_ref, dhout_ref, dcout_ref, dh_c, dc_c = rest

    tt = pl.program_id(1)
    is_t0 = tt == t_total - 1  # time runs t = T-1-tt

    @pl.when(tt == 0)
    def _init():
        dh_c[:] = dhin_ref[:]
        dc_c[:] = dcin_ref[:]
        if not split_dw:
            dwih_ref[:] = jnp.zeros_like(dwih_ref)
            dwhh_ref[:] = jnp.zeros_like(dwhh_ref)

    x_t = x_ref[0].T if x_feature_major else x_ref[0]  # [TILE, F_in]
    cdt = x_t.dtype
    f_in = x_t.shape[-1]
    # at the chunk's first step the t-1 index map clamps at 0: mask it out
    # and use the chunk-initial state instead (zeros at the sequence start)
    h_prev = jnp.where(
        is_t0, h0_ref[:].astype(jnp.float32), hprev_ref[0].astype(jnp.float32)
    )
    c_prev = jnp.where(
        is_t0, c0_ref[:].astype(jnp.float32), cprev_ref[0].astype(jnp.float32)
    )
    c_cur = ccur_ref[0].astype(jnp.float32)

    # recompute the gate tensor (not stashed)
    xh = jnp.concatenate([x_t, h_prev.astype(cdt)], axis=-1)
    gates = (
        jnp.dot(xh, w_ref[:], preferred_element_type=jnp.float32) + b_ref[0]
    )
    i = jax.nn.sigmoid(gates[:, :hidden])
    f = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden :])

    tanh_c = jnp.tanh(c_cur)
    dh_tot = dh_ref[0].astype(jnp.float32) + dh_c[:]
    do = dh_tot * tanh_c
    dc = dc_c[:] + dh_tot * o * (1.0 - tanh_c * tanh_c)
    dgates = jnp.concatenate(
        [
            (dc * g) * i * (1.0 - i),
            (dc * c_prev) * f * (1.0 - f),
            (dc * i) * (1.0 - g * g),
            do * o * (1.0 - o),
        ],
        axis=-1,
    )  # [TILE, 4H] f32

    dgc = dgates.astype(cdt)
    dxh = jax.lax.dot_general(
        dgc, w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TILE, F_in + H]
    dh_c[:] = dxh[:, f_in:]
    dc_c[:] = dc * f
    dx_t = dxh[:, :f_in]
    if x_feature_major:
        dx_ref[0] = dx_t.T.astype(dx_ref.dtype)
    else:
        dx_ref[0] = dx_t.astype(dx_ref.dtype)

    if split_dw:
        dg_ref[0] = dgc
    else:
        # dW += [x | 1 | 0...]^T dgates ; dWhh += [h_prev | 1 | 0...]^T dgates
        ones = jnp.ones((x_t.shape[0], 1), cdt)
        zeros7 = jnp.zeros((x_t.shape[0], 7), cdt)
        x_aug = jnp.concatenate([x_t, ones, zeros7], axis=-1)
        h_aug = jnp.concatenate([h_prev.astype(cdt), ones, zeros7], axis=-1)
        dwih_ref[0] += jax.lax.dot_general(
            x_aug, dgc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dwhh_ref[0] += jax.lax.dot_general(
            h_aug, dgc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(is_t0)
    def _emit_carry():
        dhout_ref[:] = dh_c[:]
        dcout_ref[:] = dc_c[:]


def _gru_layer_bwd_kernel(
    dh_ref,     # [1, TILE, H]
    x_ref,      # [1, F_in, TILE] or [1, TILE, F_in]
    hprev_ref,  # [1, TILE, H]
    h0_ref,     # [TILE, H]
    dhin_ref,   # [TILE, H] f32
    w_ref,      # [F_in + H, 3H]
    b_ref,      # [2, 3H] rows (b_ih, b_hh)
    dx_ref,
    *rest,
    hidden: int,
    t_total: int,
    x_feature_major: bool,
    split_dw: bool,
):
    if split_dw:
        dxw_ref, dhw_ref, dhout_ref, dh_c = rest
        dwih_ref = dwhh_ref = None
    else:
        dwih_ref, dwhh_ref, dhout_ref, dh_c = rest

    tt = pl.program_id(1)
    is_t0 = tt == t_total - 1

    @pl.when(tt == 0)
    def _init():
        dh_c[:] = dhin_ref[:]
        if not split_dw:
            dwih_ref[:] = jnp.zeros_like(dwih_ref)
            dwhh_ref[:] = jnp.zeros_like(dwhh_ref)

    x_t = x_ref[0].T if x_feature_major else x_ref[0]
    cdt = x_t.dtype
    f_in = x_t.shape[-1]
    h_prev = jnp.where(
        is_t0, h0_ref[:].astype(jnp.float32), hprev_ref[0].astype(jnp.float32)
    )

    xw = (
        jnp.dot(x_t, w_ref[:f_in], preferred_element_type=jnp.float32)
        + b_ref[0]
    )
    hw = jnp.dot(
        h_prev.astype(cdt), w_ref[f_in:], preferred_element_type=jnp.float32
    )
    b_hh = b_ref[1]
    r = jax.nn.sigmoid(xw[:, :hidden] + hw[:, :hidden] + b_hh[:hidden])
    z = jax.nn.sigmoid(
        xw[:, hidden : 2 * hidden]
        + hw[:, hidden : 2 * hidden]
        + b_hh[hidden : 2 * hidden]
    )
    hn_pre = hw[:, 2 * hidden :] + b_hh[2 * hidden :]
    n = jnp.tanh(xw[:, 2 * hidden :] + r * hn_pre)

    dh_tot = dh_ref[0].astype(jnp.float32) + dh_c[:]
    dz = dh_tot * (h_prev - n)
    dn_pre = (dh_tot * (1.0 - z)) * (1.0 - n * n)
    dr_pre = (dn_pre * hn_pre) * r * (1.0 - r)
    dz_pre = dz * z * (1.0 - z)
    dxw = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=-1)       # [TILE,3H]
    dhw = jnp.concatenate([dr_pre, dz_pre, dn_pre * r], axis=-1)

    dxw_c = dxw.astype(cdt)
    dhw_c = dhw.astype(cdt)
    dx_t = jax.lax.dot_general(
        dxw_c, w_ref[:f_in], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dh_c[:] = dh_tot * z + jax.lax.dot_general(
        dhw_c, w_ref[f_in:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if x_feature_major:
        dx_ref[0] = dx_t.T.astype(dx_ref.dtype)
    else:
        dx_ref[0] = dx_t.astype(dx_ref.dtype)

    if split_dw:
        dxw_ref[0] = dxw_c
        dhw_ref[0] = dhw_c
    else:
        ones = jnp.ones((x_t.shape[0], 1), cdt)
        zeros7 = jnp.zeros((x_t.shape[0], 7), cdt)
        x_aug = jnp.concatenate([x_t, ones, zeros7], axis=-1)
        h_aug = jnp.concatenate([h_prev.astype(cdt), ones, zeros7], axis=-1)
        dwih_ref[0] += jax.lax.dot_general(
            x_aug, dxw_c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dwhh_ref[0] += jax.lax.dot_general(
            h_aug, dhw_c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(is_t0)
    def _emit_carry():
        dhout_ref[:] = dh_c[:]


def _pallas_layer_bwd(
    dh_seq,  # [T, N_pad, H]  (compute dtype)
    x_seq,   # [>=T, F_in, N_pad] if x_feature_major else [>=T, N_pad, F_in]
    h_stash,  # [>=T, N_pad, H]
    c_stash,  # [>=T, N_pad, H] or None (GRU)
    w,       # [F_in + H, G·H]
    b,       # [1|2, G·H]
    *,
    h0,       # [N_pad, H]  chunk-initial h (compute dtype)
    c0,       # [N_pad, H] or None (GRU)
    dh_init,  # [N_pad, H] f32  incoming cotangent carry
    dc_init,  # [N_pad, H] f32 or None (GRU)
    hidden: int,
    cell: str,
    row_tile: int,
    interpret: bool,
    x_feature_major: bool,
    split_dw: bool | None,
):
    """One layer's backward scan over one chunk (or the whole sequence).

    ``split_dw`` None resolves per layer from the VMEM estimate
    (:func:`_auto_split_dw`). Returns (dx_seq, dwih [F_in, G·H] f32,
    dwhh [H, G·H] f32, db_ih [G·H] f32, db_hh [G·H] f32,
    dh0 [N_pad, H] f32, dc0 [N_pad, H] f32 | None) where dh0/dc0 are the
    cotangents of the chunk-initial states (the carries into the
    previous chunk).
    """
    t, n_pad, _ = dh_seq.shape
    num_tiles = n_pad // row_tile
    f_in = x_seq.shape[1] if x_feature_major else x_seq.shape[2]
    gh = w.shape[1]
    cdt = dh_seq.dtype
    if split_dw is None:
        split_dw = _auto_split_dw(
            f_in, hidden, gh, row_tile, jnp.dtype(cdt).itemsize, cell
        )

    state_spec = lambda tmap: pl.BlockSpec(
        (1, row_tile, hidden), tmap, memory_space=pltpu.VMEM
    )
    cur = lambda r, tt: (t - 1 - tt, r, 0)
    prev = lambda r, tt: (jnp.maximum(t - 2 - tt, 0), r, 0)
    if x_feature_major:
        x_spec = pl.BlockSpec(
            (1, f_in, row_tile), lambda r, tt: (t - 1 - tt, 0, r),
            memory_space=pltpu.VMEM,
        )
        dx_shape = (t, f_in, n_pad)
    else:
        x_spec = pl.BlockSpec(
            (1, row_tile, f_in), cur, memory_space=pltpu.VMEM
        )
        dx_shape = (t, n_pad, f_in)
    const = lambda shape: pl.BlockSpec(
        shape, lambda r, tt: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    row_const = pl.BlockSpec(
        (row_tile, hidden), lambda r, tt: (r, 0), memory_space=pltpu.VMEM
    )

    in_specs = [state_spec(cur), x_spec, state_spec(prev)]
    operands = [dh_seq, x_seq, h_stash]
    scratch = [pltpu.VMEM((row_tile, hidden), jnp.float32)]
    if cell == "lstm":
        in_specs += [state_spec(prev), state_spec(cur)]
        operands += [c_stash, c_stash]
        in_specs += [row_const, row_const, row_const, row_const]
        operands += [h0, c0, dh_init, dc_init]
        scratch.append(pltpu.VMEM((row_tile, hidden), jnp.float32))
        kernel = _lstm_layer_bwd_kernel
        n_carry = 2
    else:
        in_specs += [row_const, row_const]
        operands += [h0, dh_init]
        kernel = _gru_layer_bwd_kernel
        n_carry = 1
    in_specs += [const(w.shape), const(b.shape)]
    operands += [w, b]

    carry_out_spec = pl.BlockSpec(
        (row_tile, hidden), lambda r, tt: (r, 0), memory_space=pltpu.VMEM
    )
    carry_out_shape = jax.ShapeDtypeStruct((n_pad, hidden), jnp.float32)
    out_specs = [x_spec]
    out_shapes = [jax.ShapeDtypeStruct(dx_shape, cdt)]
    if split_dw:
        dg_spec = pl.BlockSpec(
            (1, row_tile, gh), cur, memory_space=pltpu.VMEM
        )
        dg_shape = jax.ShapeDtypeStruct((t, n_pad, gh), cdt)
        n_dg = 1 if cell == "lstm" else 2  # GRU streams dxw AND dhw
        out_specs += [dg_spec] * n_dg
        out_shapes += [dg_shape] * n_dg
    else:
        out_specs += [
            pl.BlockSpec(
                (1, f_in + 8, gh), lambda r, tt: (r, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, hidden + 8, gh), lambda r, tt: (r, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        out_shapes += [
            jax.ShapeDtypeStruct((num_tiles, f_in + 8, gh), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, hidden + 8, gh), jnp.float32),
        ]
    out_specs += [carry_out_spec] * n_carry
    out_shapes += [carry_out_shape] * n_carry

    results = pl.pallas_call(
        functools.partial(
            kernel, hidden=hidden, t_total=t, x_feature_major=x_feature_major,
            split_dw=split_dw,
        ),
        grid=(num_tiles, t),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_BWD_VMEM_LIMIT
        ),
    )(*operands)

    dx = results[0]
    if split_dw:
        if cell == "lstm":
            dg = results[1]
            dxw = dhw = dg
            rest = results[2:]
        else:
            dxw, dhw = results[1:3]
            rest = results[3:]
        # dW via big XLA GEMMs over the streamed cotangents. Padded rows
        # contribute zero (their dh inputs are zero, so dgates == 0).
        if x_feature_major:
            dwih = jnp.einsum(
                "tfn,tng->fg", x_seq[:t], dxw,
                preferred_element_type=jnp.float32,
            )
        else:
            dwih = jnp.einsum(
                "tnf,tng->fg", x_seq[:t], dxw,
                preferred_element_type=jnp.float32,
            )
        db_ih = jnp.sum(dxw.astype(jnp.float32), axis=(0, 1))
        # h_prev sequence = [h0, h_stash[0..t-2]]; avoid the concat copy by
        # splitting the contraction at the chunk boundary
        dwhh = jnp.einsum(
            "tnh,tng->hg", h_stash[: t - 1], dhw[1:],
            preferred_element_type=jnp.float32,
        ) + jnp.einsum(
            "nh,ng->hg", h0.astype(cdt), dhw[0],
            preferred_element_type=jnp.float32,
        )
        db_hh = (
            db_ih
            if cell == "lstm"
            else jnp.sum(dhw.astype(jnp.float32), axis=(0, 1))
        )
    else:
        dwih_aug = jnp.sum(results[1], axis=0)
        dwhh_aug = jnp.sum(results[2], axis=0)
        rest = results[3:]
        dwih, db_ih = dwih_aug[:f_in], dwih_aug[f_in]
        dwhh, db_hh = dwhh_aug[:hidden], dwhh_aug[hidden]
    dh0 = rest[0]
    dc0 = rest[1] if n_carry == 2 else None
    return dx, dwih, dwhh, db_ih, db_hh, dh0, dc0


def _layer_grads(layer, dwih, dwhh, db_ih, db_hh):
    return {
        "w_ih": dwih.T.astype(layer["w_ih"].dtype),
        "w_hh": dwhh.T.astype(layer["w_hh"].dtype),
        "b_ih": db_ih.astype(layer["b_ih"].dtype),
        "b_hh": db_hh.astype(layer["b_hh"].dtype),
    }


@functools.lru_cache(maxsize=None)
def _train_vjp_fn(
    primal_row_tile: int,
    row_tile: int,
    interpret: bool,
    chunk: int = 0,
    split_dw: bool | None = None,
):
    """custom_vjp-wrapped fused scan for x in [T, F_in, N] layout.

    The PRIMAL (evaluated when not differentiating) runs the fast no-stash
    kernel at ``primal_row_tile``; under ``jax.grad`` the fwd/bwd pair uses
    the stash kernels at ``row_tile`` (smaller: the backward kernels' VMEM
    budget). Values are identical either way (padding is trimmed), which
    is what custom_vjp requires.

    The returned function takes ``(x, layers, fc)`` with ``layers`` a
    tuple of layer dicts (any depth >= 1 — the layer count is a trace-time
    property of the operands, not part of this cache key).

    ``chunk`` > 0 selects the time-chunked remat scheme (see the section
    comment above); ``split_dw`` streams gate cotangents instead of
    accumulating dW in VMEM (None = per-layer VMEM estimate).
    """

    def _pad_shapes(t, n):
        n_pad = -(-n // row_tile) * row_tile
        align = chunk if chunk else 8
        t_pad = -(-t // align) * align
        return t_pad, n_pad

    def _fwd_impl(x, layers, fc):
        t, f_in, n = x.shape
        hidden, cell = _cell_of(layers[0])
        cdt = x.dtype
        t_pad, n_pad = _pad_shapes(t, n)
        xp = x
        if n_pad != n or t_pad != t:
            xp = jnp.pad(x, ((0, t_pad - t), (0, 0), (0, n_pad - n)))
        n_stash = (2 if cell == "lstm" else 1) * len(layers)
        zeros0 = jnp.zeros((n_pad, hidden), cdt)
        out, stashes = _stash_fwd_call(
            xp, layers, fc, (zeros0,) * n_stash,
            row_tile=row_tile, interpret=interpret,
            boundary_chunk=chunk,
        )
        out = jnp.transpose(out[:, :t, :n], (1, 2, 0))  # [T, N, OUT]
        return out, (xp, stashes, layers, fc)

    def _bwd_direct(res, g):
        """Unchunked backward: the full per-step stash is in HBM.
        Walks layers last-to-first; each layer's input sequence is the
        previous layer's h stash (the raw input for layer 0)."""
        xp, stashes, layers, fc = res
        t, n, _ = g.shape
        num_layers = len(layers)
        hidden, cell = _cell_of(layers[0])
        cdt = xp.dtype
        ws, bs, wfc, _bfc = _prep_weights(layers, fc, cdt, cell)
        is_lstm = cell == "lstm"
        s = 2 if is_lstm else 1
        n_pad = stashes[0].shape[1]

        # fc head backward: two XLA einsums (input = last layer's h stash)
        g32 = g.astype(jnp.float32)
        gc = g.astype(cdt)
        h_last = stashes[s * (num_layers - 1)]
        dfc_w = jnp.einsum(
            "tno,tnh->oh", gc, h_last[:t, :n],
            preferred_element_type=jnp.float32,
        )
        dfc_b = jnp.sum(g32, axis=(0, 1))
        dh = jnp.einsum(
            "tno,ho->tnh", gc, wfc, preferred_element_type=jnp.float32
        ).astype(cdt)
        if n_pad != n:
            dh = jnp.pad(dh, ((0, 0), (0, n_pad - n), (0, 0)))

        zero_h = jnp.zeros((n_pad, hidden), cdt)
        zero_f = jnp.zeros((n_pad, hidden), jnp.float32)
        dlayers = [None] * num_layers
        for li in reversed(range(num_layers)):
            feature_major = li == 0
            x_seq = xp if feature_major else stashes[s * (li - 1)]
            dh, dwih, dwhh, dbih, dbhh, _, _ = _pallas_layer_bwd(
                dh, x_seq, stashes[s * li],
                stashes[s * li + 1] if is_lstm else None,
                ws[li], bs[li],
                h0=zero_h, c0=zero_h if is_lstm else None,
                dh_init=zero_f, dc_init=zero_f if is_lstm else None,
                hidden=hidden, cell=cell, row_tile=row_tile,
                interpret=interpret, x_feature_major=feature_major,
                split_dw=split_dw,
            )
            dlayers[li] = _layer_grads(layers[li], dwih, dwhh, dbih, dbhh)

        dfc = {
            "weight": dfc_w.astype(fc["weight"].dtype),
            "bias": dfc_b.astype(fc["bias"].dtype),
        }
        dx = dh[:, :, :n].astype(cdt)  # [T, F_in, N]
        return dx, tuple(dlayers), dfc

    def _bwd_chunked(res, g):
        """Chunk-remat backward: re-run the stash forward per chunk from
        its boundary state, walk chunks last-to-first with (dh, dc)
        carries, accumulate dW across chunks. One lax.scan body keeps the
        compiled program size independent of the chunk count."""
        xp, boundaries, layers, fc = res
        t, n, out_dim = g.shape
        t_pad, f_in, n_pad = xp.shape
        num_layers = len(layers)
        hidden, cell = _cell_of(layers[0])
        cdt = xp.dtype
        ws, bs, wfc, _bfc = _prep_weights(layers, fc, cdt, cell)
        is_lstm = cell == "lstm"
        s = 2 if is_lstm else 1
        num_chunks = t_pad // chunk

        gp = g.astype(cdt)
        if t_pad != t or n_pad != n:
            gp = jnp.pad(gp, ((0, t_pad - t), (0, n_pad - n), (0, 0)))
        x_cs = xp.reshape(num_chunks, chunk, f_in, n_pad)
        g_cs = gp.reshape(num_chunks, chunk, n_pad, out_dim)
        # boundaries[j] = state ENTERING chunk j+1; chunk 0 starts at zeros
        zero_h = jnp.zeros((1, n_pad, hidden), cdt)
        bprev = tuple(
            jnp.concatenate([zero_h, st[:-1]], axis=0) for st in boundaries
        )

        zero_f = jnp.zeros((n_pad, hidden), jnp.float32)
        # fc bias grad from the ORIGINAL f32 cotangent (pre compute-dtype
        # cast), matching _bwd_direct bit-for-bit — the in-scan slices
        # (g_cs) are already bf16 under mixed precision.
        dfc_b_total = jnp.sum(g.astype(jnp.float32), axis=(0, 1))
        acc0 = (
            tuple(
                {
                    "dwih": jnp.zeros((w.shape[0] - hidden, w.shape[1]),
                                      jnp.float32),
                    "dwhh": jnp.zeros((hidden, w.shape[1]), jnp.float32),
                    "dbih": jnp.zeros((w.shape[1],), jnp.float32),
                    "dbhh": jnp.zeros((w.shape[1],), jnp.float32),
                }
                for w in ws
            ),
            jnp.zeros((out_dim, hidden), jnp.float32),
        )
        carry0 = {
            "dh": (zero_f,) * num_layers,
            **({"dc": (zero_f,) * num_layers} if is_lstm else {}),
        }

        def body(carry, xs):
            cr, (acc_layers, acc_fcw) = carry
            x_c, g_c, h0s = xs
            _, stash_c = _stash_fwd_call(
                x_c, layers, fc, h0s,
                row_tile=row_tile, interpret=interpret, boundary_chunk=0,
            )

            dfc_w = acc_fcw + jnp.einsum(
                "kno,knh->oh", g_c, stash_c[s * (num_layers - 1)],
                preferred_element_type=jnp.float32,
            )
            dh = jnp.einsum(
                "kno,ho->knh", g_c, wfc, preferred_element_type=jnp.float32
            ).astype(cdt)

            new_accs = [None] * num_layers
            new_dh0 = [None] * num_layers
            new_dc0 = [None] * num_layers
            for li in reversed(range(num_layers)):
                feature_major = li == 0
                x_seq = x_c if feature_major else stash_c[s * (li - 1)]
                dh, dwih, dwhh, dbih, dbhh, dh0_li, dc0_li = _pallas_layer_bwd(
                    dh, x_seq, stash_c[s * li],
                    stash_c[s * li + 1] if is_lstm else None,
                    ws[li], bs[li],
                    h0=h0s[s * li], c0=h0s[s * li + 1] if is_lstm else None,
                    dh_init=cr["dh"][li],
                    dc_init=cr["dc"][li] if is_lstm else None,
                    hidden=hidden, cell=cell, row_tile=row_tile,
                    interpret=interpret, x_feature_major=feature_major,
                    split_dw=split_dw,
                )
                a = acc_layers[li]
                new_accs[li] = {
                    "dwih": a["dwih"] + dwih,
                    "dwhh": a["dwhh"] + dwhh,
                    "dbih": a["dbih"] + dbih,
                    "dbhh": a["dbhh"] + dbhh,
                }
                new_dh0[li] = dh0_li
                new_dc0[li] = dc0_li

            new_cr = {
                "dh": tuple(new_dh0),
                **({"dc": tuple(new_dc0)} if is_lstm else {}),
            }
            return (new_cr, (tuple(new_accs), dfc_w)), dh

        xs = (x_cs, g_cs, bprev)
        (_, (acc_layers, acc_fcw)), dx_cs = jax.lax.scan(
            body, (carry0, acc0), xs, reverse=True
        )

        dlayers = tuple(
            _layer_grads(
                layers[li], acc_layers[li]["dwih"], acc_layers[li]["dwhh"],
                acc_layers[li]["dbih"], acc_layers[li]["dbhh"],
            )
            for li in range(num_layers)
        )
        dfc = {
            "weight": acc_fcw.astype(fc["weight"].dtype),
            "bias": dfc_b_total.astype(fc["bias"].dtype),
        }
        dx = dx_cs.reshape(t_pad, f_in, n_pad)[:t, :, :n].astype(cdt)
        return dx, dlayers, dfc

    _bwd_impl = _bwd_chunked if chunk else _bwd_direct

    @jax.custom_vjp
    def f(x, layers, fc):
        return _infer_impl(x, layers, fc, primal_row_tile, interpret)

    f.defvjp(_fwd_impl, _bwd_impl)
    return f


def _pick_chunk(t, n_pad, hidden, cell, itemsize, stash_budget, num_layers=2):
    """Pick the stash time-chunk from static shapes. 0 = the full
    per-step stash fits ``stash_budget`` bytes of HBM (one fwd, no
    remat). Otherwise the smallest total footprint is at
    chunk = sqrt(T); grow the chunk toward 0.6x the budget to cut the
    lax.scan trip count — the backward materializes per-chunk cotangent
    sequences on top of the stash, so a chunk sized to the full budget
    OOMs exactly at the shapes chunking exists for (0.6x measured safe
    on v5e at B=256 x 3.072 s).

    NOTE: the budget is best-effort, not a hard bound — at extreme
    T x N even the sqrt(T) minimum can exceed it, and that minimum is
    returned anyway. Callers that must not OOM should check
    :func:`train_stash_bytes` (+ their kernel I/O) against their budget
    and route to a rematerialized scan instead (see
    ``FullSubNet._fused_subband_stage``)."""
    n_stash = (2 if cell == "lstm" else 1) * num_layers
    per_step = n_stash * n_pad * hidden * itemsize
    t8 = -(-t // 8) * 8
    if t8 * per_step <= stash_budget:
        return 0
    # boundary blocks (ceil(t/K)) + in-chunk stash (K) steps of state
    k = max(8, int(round((t8**0.5) / 8.0)) * 8)
    best = k
    grow_cap = int(stash_budget * 0.6)
    while k + 8 <= t8:
        k += 8
        if (-(-t8 // k) + k) * per_step > grow_cap:
            break
        best = k
    return min(best, t8)


def train_stash_bytes(
    t: int,
    n: int,
    hidden: int,
    cell: str = "lstm",
    itemsize: int = 2,
    row_tile: int = 128,
    stash_budget: int = _DEFAULT_STASH_BUDGET,
    num_layers: int = 2,
) -> int:
    """HBM bytes the training VJP will stash at these shapes AFTER
    auto-chunking (callers can gate kernel routing on this — e.g. fall
    back to a remat'd scan when even the sqrt(T)-chunked footprint busts
    their memory budget). 128-padded rows are EXACT for the auto-tile
    path: :func:`auto_bwd_row_tile` only takes a bigger tile when it
    pads no extra rows."""
    n_pad = -(-n // row_tile) * row_tile
    n_stash = (2 if cell == "lstm" else 1) * num_layers
    per_step = n_stash * n_pad * hidden * itemsize
    t8 = -(-t // 8) * 8
    k = _pick_chunk(t, n_pad, hidden, cell, itemsize, stash_budget, num_layers)
    if k == 0:
        return t8 * per_step
    t_pad = -(-t // k) * k
    return (t_pad // k + k) * per_step


def train_bwd_peak_bytes(
    t: int,
    n: int,
    hidden: int,
    unit: int,
    out: int = 0,
    cell: str = "lstm",
    itemsize: int = 2,
    row_tile: int = 128,
    stash_budget: int = _DEFAULT_STASH_BUDGET,
    num_layers: int = 2,
) -> int:
    """Transient-aware HBM peak of the training VJP at these shapes,
    using the chunk the kernel's own ``_pick_chunk`` would select.

    Unlike :func:`train_stash_bytes` (stash-only), this also counts the
    per-chunk backward TRANSIENTS that scale with the chunk — the
    recomputed in-chunk state stash, the inter-layer dh cotangent
    chunks, the x/dx chunks — plus 3x the kernel input for I/O (input,
    its remat copy under ``jax.checkpoint``, and dx) and the output
    cotangent (one f32 + one compute-dtype copy when ``out`` > 0).
    Mirrors ``FullSubNet._grouped_chunk``'s accounting so eligibility
    gates reject shapes that pass stash-only accounting and then OOM in
    the backward (ADVICE r2: SequenceModel/improved gates were
    stash-only).
    """
    n_pad = -(-n // row_tile) * row_tile
    n_stash = (2 if cell == "lstm" else 1) * num_layers
    per_step = n_stash * n_pad * hidden * itemsize
    t8 = -(-t // 8) * 8
    io = 3 * t * unit * n_pad * itemsize
    io += t8 * n_pad * out * (itemsize + 4)
    k = _pick_chunk(t, n_pad, hidden, cell, itemsize, stash_budget, num_layers)
    if k == 0:
        # unchunked: full stash + the per-layer dh cotangent sequences
        return io + t8 * per_step + num_layers * t8 * n_pad * hidden * itemsize
    per_chunk = (
        (n_stash + num_layers) * n_pad * hidden * itemsize
        + 2 * n_pad * unit * itemsize
    )
    return io + (-(-t8 // k)) * per_step + k * per_chunk


def fused_subband_lstm(
    x: jax.Array,
    *layers_and_fc: dict,
    row_tile: int = 512,
    interpret: bool = False,
    time_major_features: bool = False,
    stash_budget: int = _DEFAULT_STASH_BUDGET,
    time_chunk: int | None = None,
    split_dw: bool | None = None,
) -> jax.Array:
    """Run the fused N-layer LSTM/GRU + Linear over x.

    Args:
        x: [T, N, F_in] (or [T, F_in, N] if ``time_major_features``) input;
            N = B·F frequency-batched rows.
        *layers_and_fc: one or more layer dicts
            {w_ih [4H, in], w_hh [4H, H], b_ih, b_hh} (torch layout, as
            produced by ``nn.rnn.lstm_init`` / the checkpoint converter),
            followed by the head fc dict {weight [OUT, H], bias [OUT]}.
            The classic 2-layer call is ``fused_subband_lstm(x, l1, l2,
            fc)``; fullband_baseline's 3-layer stack passes ``(x, l1, l2,
            l3, fc)``.
        row_tile: rows per grid tile (N is padded up to a multiple).
        interpret: run in the Pallas interpreter (CPU testing).
        stash_budget: HBM bytes allowed for the backward state stash;
            above it the VJP switches to the time-chunked remat scheme.
        time_chunk: force a chunk length (multiple of 8; 0 = full stash).
        split_dw: force the streamed-dW backward on (True) or off
            (False); default None picks per layer from a VMEM estimate
            (wide/f32 layers whose fused accumulators would bust 16 MB).

    Returns:
        [T, N, OUT] float32.

    Differentiable: under ``jax.grad`` the custom VJP runs the stash
    forward + per-layer backward kernels (at a VMEM-safe row tile); when
    not differentiating, the fast no-stash kernel runs. Prefer
    :func:`fused_subband_lstm_train` in training code paths to pick the
    training row tile explicitly.
    """
    layers, fc = tuple(layers_and_fc[:-1]), layers_and_fc[-1]
    if not time_major_features:
        x = jnp.swapaxes(x, 1, 2)  # -> [T, F_in, N]
    itemsize = jnp.dtype(x.dtype).itemsize
    bwd_tile = min(
        row_tile, auto_bwd_row_tile(layers, itemsize, x.shape[2], split_dw)
    )
    hidden, cell = _cell_of(layers[0])
    if time_chunk is None:
        n_pad = -(-x.shape[2] // bwd_tile) * bwd_tile
        time_chunk = _pick_chunk(
            x.shape[0], n_pad, hidden, cell, itemsize, stash_budget,
            len(layers),
        )
    assert time_chunk % 8 == 0, "time_chunk must be a multiple of 8"
    return _train_vjp_fn(row_tile, bwd_tile, interpret, time_chunk, split_dw)(
        x, layers, fc
    )


def fused_subband_lstm_train(
    x: jax.Array,
    *layers_and_fc: dict,
    row_tile: int | None = None,
    interpret: bool = False,
    time_major_features: bool = False,
    stash_budget: int = _DEFAULT_STASH_BUDGET,
    time_chunk: int | None = None,
    split_dw: bool | None = None,
) -> jax.Array:
    """Training-tuned twin of :func:`fused_subband_lstm` (same custom VJP,
    stash/backward row tile = ``row_tile`` for the fwd pass as well, so
    the residual-producing forward is compiled once). ``row_tile`` None
    picks the largest VMEM-safe tile (:func:`auto_bwd_row_tile`)."""
    layers, fc = tuple(layers_and_fc[:-1]), layers_and_fc[-1]
    if not time_major_features:
        x = jnp.swapaxes(x, 1, 2)  # -> [T, F_in, N]
    itemsize = jnp.dtype(x.dtype).itemsize
    if row_tile is None:
        row_tile = auto_bwd_row_tile(layers, itemsize, x.shape[2], split_dw)
    hidden, cell = _cell_of(layers[0])
    if time_chunk is None:
        n_pad = -(-x.shape[2] // row_tile) * row_tile
        time_chunk = _pick_chunk(
            x.shape[0], n_pad, hidden, cell, itemsize, stash_budget,
            len(layers),
        )
    assert time_chunk % 8 == 0, "time_chunk must be a multiple of 8"
    return _train_vjp_fn(row_tile, row_tile, interpret, time_chunk, split_dw)(
        x, layers, fc
    )
