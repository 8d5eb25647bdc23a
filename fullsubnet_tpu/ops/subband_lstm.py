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

    def lstm_step(x_t, h_ref, c_ref, w_ref, b_ref):
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

    def gru_step(x_t, h_ref, _c_ref, w_ref, b_ref):
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

    step = lstm_step if cell == "lstm" else gru_step
    x_t = x_ref[0].T  # [TILE, F_in]
    h1_t = step(x_t, h1, c1, w1_ref, b1_ref)
    h2_t = step(h1_t.astype(x_t.dtype), h2, c2, w2_ref, b2_ref)
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
    """Run the fused 2-layer LSTM + Linear over x.

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
    """
    if not time_major_features:
        x = jnp.swapaxes(x, 1, 2)  # -> [T, F_in, N]
    t, f_in, n = x.shape
    hidden = l1["w_hh"].shape[1]
    num_gates = l1["w_ih"].shape[0] // hidden
    cell = {4: "lstm", 3: "gru"}[num_gates]
    out_dim = fc["weight"].shape[0]
    compute_dtype = x.dtype

    # [W_ih^T stacked over W_hh^T] -> one [in+H, G·H] operand per layer
    w1 = jnp.concatenate([l1["w_ih"], l1["w_hh"]], axis=1).T.astype(compute_dtype)
    w2 = jnp.concatenate([l2["w_ih"], l2["w_hh"]], axis=1).T.astype(compute_dtype)
    if cell == "lstm":
        b1 = (l1["b_ih"] + l1["b_hh"]).astype(jnp.float32)[None, :]
        b2 = (l2["b_ih"] + l2["b_hh"]).astype(jnp.float32)[None, :]
    else:  # GRU keeps b_ih / b_hh separate (reset gate scales W_hn h + b_hn)
        b1 = jnp.stack([l1["b_ih"], l1["b_hh"]]).astype(jnp.float32)
        b2 = jnp.stack([l2["b_ih"], l2["b_hh"]]).astype(jnp.float32)
    wfc = fc["weight"].T.astype(compute_dtype)  # [H, OUT]
    bfc = fc["bias"].astype(jnp.float32)[None, :]

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
