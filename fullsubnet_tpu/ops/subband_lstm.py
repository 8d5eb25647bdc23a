"""Pallas TPU kernel: fused 2-layer sub-band LSTM scan + output projection.

FullSubNet's sub-band stage — two stacked LSTM layers over the
frequency-batched axis plus a Linear head — is the framework's hot loop
(~99% of FLOPs). This kernel runs the WHOLE scan for a tile of rows with
everything hot on-chip:

* both layers' weights stay **resident in VMEM** for all T steps,
* LSTM states (h1,c1,h2,c2) live in **VMEM scratch**, persisting across
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
    w1_ref,     # [F_in + H, G·H]
    b1_ref,     # [1, G·H] (+ for GRU a second row with b_hh)
    w2_ref,     # [H + H, G·H]
    b2_ref,     # [1|2, G·H]
    wfc_ref,    # [H, OUT]
    bfc_ref,    # [1, OUT]
    out_ref,    # [OUT, 8, TILE]
    h1, c1, h2, c2,  # scratch [TILE, H] f32 (c unused for GRU)
    *,
    hidden: int,
    cell: str,
):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        h1[:] = jnp.zeros_like(h1)
        c1[:] = jnp.zeros_like(c1)
        h2[:] = jnp.zeros_like(h2)
        c2[:] = jnp.zeros_like(c2)

    step = _lstm_step if cell == "lstm" else _gru_step
    x_t = x_ref[0].T  # [TILE, F_in]
    h1_t = step(x_t, h1, c1, w1_ref, b1_ref, hidden)
    h2_t = step(h1_t.astype(x_t.dtype), h2, c2, w2_ref, b2_ref, hidden)
    out = (
        jnp.dot(
            h2_t.astype(wfc_ref.dtype), wfc_ref[:],
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


def _prep_weights(l1, l2, fc, compute_dtype, cell):
    """Torch-layout layer dicts -> the kernel's resident VMEM operands.

    [W_ih^T stacked over W_hh^T] -> one [in+H, G·H] operand per layer;
    LSTM biases fuse (b_ih + b_hh), GRU keeps both rows (the reset gate
    scales W_hn h + b_hn).
    """
    w1 = jnp.concatenate([l1["w_ih"], l1["w_hh"]], axis=1).T.astype(compute_dtype)
    w2 = jnp.concatenate([l2["w_ih"], l2["w_hh"]], axis=1).T.astype(compute_dtype)
    if cell == "lstm":
        b1 = (l1["b_ih"] + l1["b_hh"]).astype(jnp.float32)[None, :]
        b2 = (l2["b_ih"] + l2["b_hh"]).astype(jnp.float32)[None, :]
    else:
        b1 = jnp.stack([l1["b_ih"], l1["b_hh"]]).astype(jnp.float32)
        b2 = jnp.stack([l2["b_ih"], l2["b_hh"]]).astype(jnp.float32)
    wfc = fc["weight"].T.astype(compute_dtype)  # [H, OUT]
    bfc = fc["bias"].astype(jnp.float32)[None, :]
    return w1, b1, w2, b2, wfc, bfc


def _infer_impl(x, l1, l2, fc, row_tile, interpret):
    """The fast (no-stash) kernel invocation. x: [T, F_in, N]."""
    t, f_in, n = x.shape
    hidden, cell = _cell_of(l1)
    out_dim = fc["weight"].shape[0]
    compute_dtype = x.dtype
    w1, b1, w2, b2, wfc, bfc = _prep_weights(l1, l2, fc, compute_dtype, cell)

    n_pad = -(-n // row_tile) * row_tile
    t_pad = -(-t // 8) * 8  # out blocks span 8 timesteps
    if n_pad != n or t_pad != t:
        x = jnp.pad(x, ((0, t_pad - t), (0, 0), (0, n_pad - n)))
    num_tiles = n_pad // row_tile

    out = pl.pallas_call(
        functools.partial(_kernel, hidden=hidden, cell=cell),
        grid=(num_tiles, t_pad),
        in_specs=[
            pl.BlockSpec(
                (1, f_in, row_tile), lambda r, tt: (tt, 0, r),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((w1.shape[0], w1.shape[1]), lambda r, tt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b1.shape[0], b1.shape[1]), lambda r, tt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w2.shape[0], w2.shape[1]), lambda r, tt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b2.shape[0], b2.shape[1]), lambda r, tt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, out_dim), lambda r, tt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_dim), lambda r, tt: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (out_dim, 8, row_tile), lambda r, tt: (0, tt // 8, r),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((out_dim, t_pad, n_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((row_tile, hidden), jnp.float32),
            pltpu.VMEM((row_tile, hidden), jnp.float32),
            pltpu.VMEM((row_tile, hidden), jnp.float32),
            pltpu.VMEM((row_tile, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(x, w1, b1, w2, b2, wfc, bfc)

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


def _lstm_layer_bwd_kernel(
    dh_ref,     # [1, TILE, H]  incoming per-step dL/dh
    x_ref,      # [1, F_in, TILE] (feature-major) or [1, TILE, F_in]
    hprev_ref,  # [1, TILE, H]  stashed h_{t-1}
    cprev_ref,  # [1, TILE, H]  stashed c_{t-1}
    ccur_ref,   # [1, TILE, H]  stashed c_t
    w_ref,      # [F_in + H, 4H]
    b_ref,      # [1, 4H] fused b_ih + b_hh
    dx_ref,     # [1, F_in, TILE] or [1, TILE, F_in]
    dwih_ref,   # [1, F_in + 8, 4H] f32 accumulator (row F_in = db_ih)
    dwhh_ref,   # [1, H + 8, 4H] f32 accumulator (row H = db_hh)
    dh_c, dc_c,  # scratch [TILE, H] f32 carries
    *,
    hidden: int,
    t_total: int,
    x_feature_major: bool,
):
    tt = pl.program_id(1)
    is_t0 = tt == t_total - 1  # time runs t = T-1-tt

    @pl.when(tt == 0)
    def _init():
        dh_c[:] = jnp.zeros_like(dh_c)
        dc_c[:] = jnp.zeros_like(dc_c)
        dwih_ref[:] = jnp.zeros_like(dwih_ref)
        dwhh_ref[:] = jnp.zeros_like(dwhh_ref)

    x_t = x_ref[0].T if x_feature_major else x_ref[0]  # [TILE, F_in]
    cdt = x_t.dtype
    f_in = x_t.shape[-1]
    # h_{-1} = c_{-1} = 0: the t-1 index map clamps at 0, mask it out
    h_prev = jnp.where(is_t0, 0.0, hprev_ref[0].astype(jnp.float32))
    c_prev = jnp.where(is_t0, 0.0, cprev_ref[0].astype(jnp.float32))
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


def _gru_layer_bwd_kernel(
    dh_ref,     # [1, TILE, H]
    x_ref,      # [1, F_in, TILE] or [1, TILE, F_in]
    hprev_ref,  # [1, TILE, H]
    w_ref,      # [F_in + H, 3H]
    b_ref,      # [2, 3H] rows (b_ih, b_hh)
    dx_ref,
    dwih_ref,   # [1, F_in + 8, 3H] f32 (row F_in = db_ih)
    dwhh_ref,   # [1, H + 8, 3H] f32 (row H = db_hh)
    dh_c,       # scratch [TILE, H] f32
    *,
    hidden: int,
    t_total: int,
    x_feature_major: bool,
):
    tt = pl.program_id(1)
    is_t0 = tt == t_total - 1

    @pl.when(tt == 0)
    def _init():
        dh_c[:] = jnp.zeros_like(dh_c)
        dwih_ref[:] = jnp.zeros_like(dwih_ref)
        dwhh_ref[:] = jnp.zeros_like(dwhh_ref)

    x_t = x_ref[0].T if x_feature_major else x_ref[0]
    cdt = x_t.dtype
    f_in = x_t.shape[-1]
    h_prev = jnp.where(is_t0, 0.0, hprev_ref[0].astype(jnp.float32))

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


def _kernel_train_fwd(
    x_ref, w1_ref, b1_ref, w2_ref, b2_ref, wfc_ref, bfc_ref,
    out_ref, *rest, hidden: int, cell: str,
):
    """`_kernel` + per-step state stashes for the backward pass."""
    if cell == "lstm":
        h1s_ref, c1s_ref, h2s_ref, c2s_ref = rest[:4]
        h1, c1, h2, c2 = rest[4:]
    else:
        h1s_ref, h2s_ref = rest[:2]
        c1s_ref = c2s_ref = None
        h1, c1, h2, c2 = rest[2:]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        h1[:] = jnp.zeros_like(h1)
        c1[:] = jnp.zeros_like(c1)
        h2[:] = jnp.zeros_like(h2)
        c2[:] = jnp.zeros_like(c2)

    step = _lstm_step if cell == "lstm" else _gru_step
    x_t = x_ref[0].T
    h1_t = step(x_t, h1, c1, w1_ref, b1_ref, hidden)
    h2_t = step(h1_t.astype(x_t.dtype), h2, c2, w2_ref, b2_ref, hidden)
    out = (
        jnp.dot(
            h2_t.astype(wfc_ref.dtype), wfc_ref[:],
            preferred_element_type=jnp.float32,
        )
        + bfc_ref[0]
    )
    slot = pl.program_id(1) % 8
    out_ref[:, pl.ds(slot, 1), :] = out.T[:, None, :].astype(out_ref.dtype)
    h1s_ref[0] = h1_t.astype(h1s_ref.dtype)
    h2s_ref[0] = h2_t.astype(h2s_ref.dtype)
    if cell == "lstm":
        c1s_ref[0] = c1[:].astype(c1s_ref.dtype)
        c2s_ref[0] = c2[:].astype(c2s_ref.dtype)


def _pallas_layer_bwd(
    dh_seq,  # [T, N_pad, H]  (compute dtype)
    x_seq,   # [>=T, F_in, N_pad] if x_feature_major else [>=T, N_pad, F_in]
    h_stash,  # [>=T, N_pad, H]
    c_stash,  # [>=T, N_pad, H] or None (GRU)
    w,       # [F_in + H, G·H]
    b,       # [1|2, G·H]
    *,
    hidden: int,
    cell: str,
    row_tile: int,
    interpret: bool,
    x_feature_major: bool,
):
    """One layer's backward scan. Returns (dx_seq, dwih_aug, dwhh_aug)
    where the aug matrices are [F_in+8, G·H] / [H+8, G·H] with the bias
    gradient in row F_in / H."""
    t, n_pad, _ = dh_seq.shape
    num_tiles = n_pad // row_tile
    f_in = x_seq.shape[1] if x_feature_major else x_seq.shape[2]
    gh = w.shape[1]
    cdt = dh_seq.dtype

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

    in_specs = [state_spec(cur), x_spec, state_spec(prev)]
    operands = [dh_seq, x_seq, h_stash]
    scratch = [pltpu.VMEM((row_tile, hidden), jnp.float32)]
    if cell == "lstm":
        in_specs += [state_spec(prev), state_spec(cur)]
        operands += [c_stash, c_stash]
        scratch.append(pltpu.VMEM((row_tile, hidden), jnp.float32))
        kernel = _lstm_layer_bwd_kernel
    else:
        kernel = _gru_layer_bwd_kernel
    in_specs += [const(w.shape), const(b.shape)]
    operands += [w, b]

    out_specs = [
        x_spec,
        pl.BlockSpec(
            (1, f_in + 8, gh), lambda r, tt: (r, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, hidden + 8, gh), lambda r, tt: (r, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct(dx_shape, cdt),
        jax.ShapeDtypeStruct((num_tiles, f_in + 8, gh), jnp.float32),
        jax.ShapeDtypeStruct((num_tiles, hidden + 8, gh), jnp.float32),
    ]

    dx, dwih, dwhh = pl.pallas_call(
        functools.partial(
            kernel, hidden=hidden, t_total=t, x_feature_major=x_feature_major
        ),
        grid=(num_tiles, t),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands)
    return dx, jnp.sum(dwih, axis=0), jnp.sum(dwhh, axis=0)


@functools.lru_cache(maxsize=None)
def _train_vjp_fn(primal_row_tile: int, row_tile: int, interpret: bool):
    """custom_vjp-wrapped fused scan for x in [T, F_in, N] layout.

    The PRIMAL (evaluated when not differentiating) runs the fast no-stash
    kernel at ``primal_row_tile``; under ``jax.grad`` the fwd/bwd pair uses
    the stash kernels at ``row_tile`` (smaller: the backward kernels' VMEM
    budget). Values are identical either way (padding is trimmed), which
    is what custom_vjp requires.
    """

    def _fwd_impl(x, l1, l2, fc):
        t, f_in, n = x.shape
        hidden, cell = _cell_of(l1)
        out_dim = fc["weight"].shape[0]
        cdt = x.dtype
        w1, b1, w2, b2, wfc, bfc = _prep_weights(l1, l2, fc, cdt, cell)

        n_pad = -(-n // row_tile) * row_tile
        t_pad = -(-t // 8) * 8
        xp = x
        if n_pad != n or t_pad != t:
            xp = jnp.pad(x, ((0, t_pad - t), (0, 0), (0, n_pad - n)))
        num_tiles = n_pad // row_tile

        n_stash = 4 if cell == "lstm" else 2
        stash_spec = pl.BlockSpec(
            (1, row_tile, hidden), lambda r, tt: (tt, r, 0),
            memory_space=pltpu.VMEM,
        )
        const = lambda a: pl.BlockSpec(
            a.shape, lambda r, tt, _s=a.shape: tuple(0 for _ in _s),
            memory_space=pltpu.VMEM,
        )
        results = pl.pallas_call(
            functools.partial(_kernel_train_fwd, hidden=hidden, cell=cell),
            grid=(num_tiles, t_pad),
            in_specs=[
                pl.BlockSpec(
                    (1, f_in, row_tile), lambda r, tt: (tt, 0, r),
                    memory_space=pltpu.VMEM,
                ),
                const(w1), const(b1), const(w2), const(b2),
                const(wfc), const(bfc),
            ],
            out_specs=[
                pl.BlockSpec(
                    (out_dim, 8, row_tile), lambda r, tt: (0, tt // 8, r),
                    memory_space=pltpu.VMEM,
                ),
            ] + [stash_spec] * n_stash,
            out_shape=[
                jax.ShapeDtypeStruct((out_dim, t_pad, n_pad), jnp.float32),
            ] + [
                jax.ShapeDtypeStruct((t_pad, n_pad, hidden), cdt)
            ] * n_stash,
            scratch_shapes=[
                pltpu.VMEM((row_tile, hidden), jnp.float32) for _ in range(4)
            ],
            interpret=interpret,
        )(xp, w1, b1, w2, b2, wfc, bfc)
        out = jnp.transpose(results[0][:, :t, :n], (1, 2, 0))  # [T, N, OUT]
        return out, (xp, tuple(results[1:]), l1, l2, fc)

    def _bwd_impl(res, g):
        xp, stashes, l1, l2, fc = res
        t, n, _ = g.shape
        hidden, cell = _cell_of(l1)
        cdt = xp.dtype
        w1, b1, w2, b2, wfc, _bfc = _prep_weights(l1, l2, fc, cdt, cell)
        if cell == "lstm":
            h1s, c1s, h2s, c2s = stashes
        else:
            h1s, h2s = stashes
            c1s = c2s = None
        n_pad = h1s.shape[1]

        # fc head backward: two XLA einsums
        g32 = g.astype(jnp.float32)
        gc = g.astype(cdt)
        dfc_w = jnp.einsum(
            "tno,tnh->oh", gc, h2s[:t, :n],
            preferred_element_type=jnp.float32,
        )
        dfc_b = jnp.sum(g32, axis=(0, 1))
        dh2 = jnp.einsum(
            "tno,ho->tnh", gc, wfc, preferred_element_type=jnp.float32
        ).astype(cdt)
        if n_pad != n:
            dh2 = jnp.pad(dh2, ((0, 0), (0, n_pad - n), (0, 0)))

        dh1, dwih2, dwhh2 = _pallas_layer_bwd(
            dh2, h1s, h2s, c2s, w2, b2,
            hidden=hidden, cell=cell, row_tile=row_tile,
            interpret=interpret, x_feature_major=False,
        )
        dx, dwih1, dwhh1 = _pallas_layer_bwd(
            dh1, xp, h1s, c1s, w1, b1,
            hidden=hidden, cell=cell, row_tile=row_tile,
            interpret=interpret, x_feature_major=True,
        )

        f_in = xp.shape[1]
        def grads_of(layer, dwih, dwhh, in_dim):
            return {
                "w_ih": dwih[:in_dim].T.astype(layer["w_ih"].dtype),
                "w_hh": dwhh[:hidden].T.astype(layer["w_hh"].dtype),
                "b_ih": dwih[in_dim].astype(layer["b_ih"].dtype),
                "b_hh": dwhh[hidden].astype(layer["b_hh"].dtype),
            }

        dl1 = grads_of(l1, dwih1, dwhh1, f_in)
        dl2 = grads_of(l2, dwih2, dwhh2, hidden)
        dfc = {
            "weight": dfc_w.astype(fc["weight"].dtype),
            "bias": dfc_b.astype(fc["bias"].dtype),
        }
        dx = dx[:, :, :n].astype(cdt)  # [T, F_in, N]
        return dx, dl1, dl2, dfc

    @jax.custom_vjp
    def f(x, l1, l2, fc):
        return _infer_impl(x, l1, l2, fc, primal_row_tile, interpret)

    f.defvjp(_fwd_impl, _bwd_impl)
    return f


def fused_subband_lstm(
    x: jax.Array,
    l1: dict,
    l2: dict,
    fc: dict,
    *,
    row_tile: int = 512,
    interpret: bool = False,
    time_major_features: bool = False,
) -> jax.Array:
    """Run the fused 2-layer LSTM/GRU + Linear over x.

    Args:
        x: [T, N, F_in] (or [T, F_in, N] if ``time_major_features``) input;
            N = B·F frequency-batched rows.
        l1, l2: layer dicts {w_ih [4H, in], w_hh [4H, H], b_ih, b_hh}
            (torch layout, as produced by ``nn.rnn.lstm_init`` / the
            checkpoint converter).
        fc: {weight [OUT, H], bias [OUT]}.
        row_tile: rows per grid tile (N is padded up to a multiple).
        interpret: run in the Pallas interpreter (CPU testing).

    Returns:
        [T, N, OUT] float32.

    Differentiable: under ``jax.grad`` the custom VJP runs the stash
    forward + per-layer backward kernels (at a VMEM-safe row tile); when
    not differentiating, the fast no-stash kernel runs. Prefer
    :func:`fused_subband_lstm_train` in training code paths to pick the
    training row tile explicitly.
    """
    if not time_major_features:
        x = jnp.swapaxes(x, 1, 2)  # -> [T, F_in, N]
    return _train_vjp_fn(row_tile, min(row_tile, 128), interpret)(
        x, l1, l2, fc
    )


def fused_subband_lstm_train(
    x: jax.Array,
    l1: dict,
    l2: dict,
    fc: dict,
    *,
    row_tile: int = 128,
    interpret: bool = False,
    time_major_features: bool = False,
) -> jax.Array:
    """Training-tuned twin of :func:`fused_subband_lstm` (same custom VJP,
    stash/backward row tile = ``row_tile`` for the fwd pass as well, so
    the residual-producing forward is compiled once)."""
    if not time_major_features:
        x = jnp.swapaxes(x, 1, 2)  # -> [T, F_in, N]
    return _train_vjp_fn(row_tile, row_tile, interpret)(x, l1, l2, fc)
