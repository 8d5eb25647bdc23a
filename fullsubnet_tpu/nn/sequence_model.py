"""SequenceModel — uniform wrapper over stacked LSTM/GRU + projection.

Functional twin of the reference wrapper
(``audio_zen/model/module/sequence_model.py:26-125``): stacked
uni/bidirectional LSTM or GRU, optional Linear projection, optional
activation (Tanh | ReLU | ReLU6 | LeakyReLU | PReLU). Operates on
[B, F, T] with the time axis last, like the reference (internally
time-major for the scan).
"""

import jax
import jax.numpy as jnp

from fullsubnet_tpu.nn import rnn
from fullsubnet_tpu.nn.init import linear_init


def _activation(name):
    if not name:
        return None
    table = {
        "Tanh": jnp.tanh,
        "ReLU": jax.nn.relu,
        "ReLU6": jax.nn.relu6,
        "LeakyReLU": lambda x: jax.nn.leaky_relu(x, 0.01),
    }
    if name in table:
        return table[name]
    if name == "PReLU":
        return "prelu"  # learnable — resolved in __call__
    raise NotImplementedError(f"Not implemented activation function {name}")


class SequenceModel:
    """Config object; params live in a pytree returned by :meth:`init`."""

    def __init__(
        self,
        input_size: int,
        output_size: int,
        hidden_size: int,
        num_layers: int,
        bidirectional: bool,
        sequence_model: str = "GRU",
        output_activate_function: str | None = "Tanh",
    ):
        if sequence_model not in ("LSTM", "GRU"):
            raise NotImplementedError(f"Not implemented {sequence_model}")
        self.input_size = input_size
        self.output_size = int(output_size) if output_size else 0
        self.hidden_size = hidden_size
        self.num_layers = num_layers
        self.bidirectional = bidirectional
        self.sequence_model = sequence_model
        self.output_activate_function = output_activate_function
        self._act = _activation(output_activate_function)

    def init(self, key, dtype=jnp.float32, orthogonal_init=True) -> dict:
        krnn, kfc = jax.random.split(key)
        init_fn = rnn.lstm_init if self.sequence_model == "LSTM" else rnn.gru_init
        params = {
            "rnn": init_fn(
                krnn,
                self.input_size,
                self.hidden_size,
                self.num_layers,
                self.bidirectional,
                dtype,
                orthogonal_init=orthogonal_init,
            )
        }
        if self.output_size:
            in_features = self.hidden_size * (2 if self.bidirectional else 1)
            if orthogonal_init:
                # reference weight_init: xavier-normal weight, N(0,1) bias
                params["fc"] = linear_init(kfc, in_features, self.output_size, dtype)
            else:
                # torch default Linear init: U(±1/sqrt(fan_in))
                kw, kb = jax.random.split(kfc)
                bound = 1.0 / (in_features**0.5)
                params["fc"] = {
                    "weight": jax.random.uniform(
                        kw, (self.output_size, in_features), dtype, -bound, bound
                    ),
                    "bias": jax.random.uniform(
                        kb, (self.output_size,), dtype, -bound, bound
                    ),
                }
        if self._act == "prelu":
            params["prelu"] = jnp.full((1,), 0.25, dtype)
        return params

    # Above this many elements per materialized [B, T, H] inter-layer
    # activation, switch to the time-chunked fused path: all layers (and
    # the output projection) run chunk-by-chunk inside one scan, so the
    # full-sequence activations never hit HBM. This is what lets e.g.
    # FullSubNet's sub-band stack run 32x30s batches inside 16 GB.
    _CHUNK_THRESHOLD = 192 * 1024 * 1024

    # Route eligible stacks through the fused Pallas kernel on TPU when the
    # row count fills at least half a 128-row MXU tile (below that the
    # tile-padding waste exceeds the scan's cost). ~1.15x over the XLA scan
    # on the FullSubNet full-band stage.
    _PALLAS_MIN_ROWS = 64
    _PALLAS_MAX_ELEMENTS = 2**31
    # Training stash allowance for stacks routed here: these stacks are
    # usually SIDE stages (full-band / encoder / decoder) that share HBM
    # with a model's main sub-band stage, so they may not claim the
    # kernel's default 6 GB budget. The budget is passed INTO the kernel,
    # whose custom VJP time-chunks its stash to fit it — so big-stash
    # stages (e.g. Fast FullSubNet's mel sub-band stage, ~1.3-2.5 GB
    # unchunked) stay on the kernel path instead of falling back to the
    # scan, whose f32 per-step residuals are what actually OOM at those
    # shapes (measured: B=64 x 3.072 s fast train step busts 15.75 GB on
    # the scan path, runs through the chunked kernel). 3 GB keeps every
    # recipe stage monolithic (fast's mel sub-band stage stashes 1.3 GB;
    # chunking it costs ~22%: 1624 vs 2073 audio-s/s) while extreme
    # shapes (30 s x 256 fullband, 2 GB) still stash LESS than the f32
    # scan residuals they would otherwise produce.
    _PALLAS_TRAIN_STASH_BUDGET = 3 * 2**30

    def _pallas_eligible(
        self, b: int, t: int, training: bool = False, itemsize: int = 4
    ) -> bool:
        h = self.hidden_size
        # the training forward keeps ALL layers' weights resident in
        # VMEM; for f32 wide-H stacks (e.g. H=512 fullband in a no-bf16
        # run) that alone is ~15 MB > the 16 MB budget with transients —
        # those shapes stay on the scan path. Layer 0 reads input_size,
        # deeper layers read H; each also holds its [H, G·H] recurrent.
        gates = 4 if self.sequence_model == "LSTM" else 3
        fwd_w_bytes = (
            (self.input_size + (2 * self.num_layers - 1) * h)
            * gates * h * itemsize
        )
        if training:
            from fullsubnet_tpu.ops.subband_lstm import train_bwd_peak_bytes

            cell = self.sequence_model.lower()
            # transient-aware: counts the chunked stash PLUS the
            # per-chunk backward transients and kernel I/O, so extreme
            # shapes that fit the stash but OOM in the backward fall
            # back to the remat'd scan (shares FullSubNet._grouped_chunk
            # accounting via ops.subband_lstm.train_bwd_peak_bytes).
            # Bound is 2x the STASH budget: the transient/IO terms were
            # implicitly admitted on top of the stash before, and the
            # known-good routings (fast's mel stage ~2 GB peak, 30 s
            # B=256 fullband ~4.5 GB peak — both beat the scan's f32
            # residuals) must stay on the kernel; what changes is that
            # the TOTAL is now bounded at all.
            stash_ok = (
                train_bwd_peak_bytes(
                    t, b, h, unit=self.input_size, out=self.output_size,
                    cell=cell, itemsize=itemsize,
                    stash_budget=self._PALLAS_TRAIN_STASH_BUDGET,
                    num_layers=self.num_layers,
                )
                <= 2 * self._PALLAS_TRAIN_STASH_BUDGET
            )
        else:
            stash_ok = True
        return (
            not self.bidirectional
            and self.num_layers >= 1
            and self.output_size > 0
            and self._act != "prelu"  # learnable act stays on the scan path
            and b >= self._PALLAS_MIN_ROWS
            and b * t * (self.input_size + self.output_size)
            <= self._PALLAS_MAX_ELEMENTS
            # wide stacks (H > 448) train through the kernel's split-dW
            # backward (streamed gate cotangents + XLA dW GEMMs), which
            # keeps the per-layer VMEM footprint under the 16 MB budget.
            # Resident-weight bound 16 MB: the training forward pins a
            # 48 MB scoped-VMEM limit, and fullband_baseline's 3-layer
            # H=512 bf16 stack (11.5 MB resident) compiles + trains
            # under it (chip-verified); f32 wide stacks (23 MB) still
            # fall back to the scan.
            and (not training or (stash_ok and fwd_w_bytes <= 16 * 2**20))
            and jax.default_backend() != "cpu"
        )

    def _pallas_forward(self, params, x, training, interpret=False):
        """x: [B, F, T] -> [B, F_out, T] via the fused multi-cell kernel
        (weights VMEM-resident; custom-VJP variant under training)."""
        from fullsubnet_tpu.ops.subband_lstm import (
            auto_fwd_row_tile,
            fused_subband_lstm,
            fused_subband_lstm_train,
        )

        b = x.shape[0]
        kernel = fused_subband_lstm_train if training else fused_subband_lstm
        out = kernel(
            jnp.transpose(x, (2, 1, 0)),  # [T, F, B] feature-major
            *[layer[0] for layer in params["rnn"]],
            params["fc"],
            time_major_features=True,
            # training: auto (largest VMEM-safe backward tile, capped by
            # the padded row count); inference: even-split <=512 tile
            row_tile=(None if training else auto_fwd_row_tile(b)),
            interpret=interpret,
            stash_budget=self._PALLAS_TRAIN_STASH_BUDGET,
        )  # [T, B, out] float32
        out = self._activate(params, out)
        return jnp.transpose(out, (1, 2, 0)).astype(x.dtype)

    def __call__(
        self, params: dict, x: jax.Array, training: bool = False
    ) -> jax.Array:
        """x: [B, F, T] -> [B, F_out, T].

        ``training``: must be set when called under ``jax.grad`` so the
        Pallas route uses the custom-VJP kernel variant.
        """
        assert x.ndim == 3, f"The shape of input is {x.shape}."
        b, _, t = x.shape
        if self._pallas_eligible(b, t, training, jnp.dtype(x.dtype).itemsize):
            return self._pallas_forward(params, x, training)
        x = jnp.swapaxes(x, 1, 2)  # [B, T, F]

        if (
            not self.bidirectional
            and b * t * self.hidden_size > self._CHUNK_THRESHOLD
        ):
            o = self._chunked_forward(params, x)
        else:
            o = rnn.rnn_forward(params["rnn"], x, self.sequence_model)
            o = self._project(params, o)
        return jnp.swapaxes(o, 1, 2)  # [B, F_out, T]

    def _activate(self, params, o):
        if self._act == "prelu":
            o = jnp.where(o >= 0, o, params["prelu"] * o)
        elif self._act is not None:
            o = self._act(o)
        return o

    def _project(self, params, o):
        if self.output_size:
            o = o @ params["fc"]["weight"].T + params["fc"]["bias"]
        return self._activate(params, o)

    def _chunked_forward(self, params, x):
        """Fused multi-layer scan over time chunks. x: [B, T, F] ->
        [B, T, out]. Zero-padding the tail is safe: the stack is causal, so
        padded steps only influence outputs that get trimmed."""
        b, t, f_in = x.shape
        chunk = max(8, self._CHUNK_THRESHOLD // (8 * b * self.hidden_size))
        num_chunks = -(-t // chunk)
        t_pad = num_chunks * chunk
        if t_pad != t:
            x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
        # [num_chunks, chunk, B, F] time-major within chunk
        xs = jnp.swapaxes(x, 0, 1).reshape(num_chunks, chunk, b, f_in)

        layer_params = [layer[0] for layer in params["rnn"]]
        is_lstm = self.sequence_model == "LSTM"

        def layer_scan(p, carry, h_seq):
            if is_lstm:
                w = jnp.concatenate([p["w_ih"], p["w_hh"]], axis=1)
                bias = p["b_ih"] + p["b_hh"]

                def step(cr, x_t):
                    h, c = cr
                    gates = jnp.concatenate([x_t, h], axis=-1) @ w.T + bias
                    i, fg, g, o = jnp.split(gates, 4, axis=-1)
                    c = jax.nn.sigmoid(fg) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
                    h = jax.nn.sigmoid(o) * jnp.tanh(c)
                    return (h, c), h

                return jax.lax.scan(step, carry, h_seq)
            hidden = p["w_hh"].shape[1]

            def step(h, x_t):
                x_proj = x_t @ p["w_ih"].T + p["b_ih"]
                parts = (x_proj[..., : 2 * hidden], x_proj[..., 2 * hidden :])
                return rnn.gru_step(p, h, parts)

            return jax.lax.scan(step, carry, h_seq)

        @jax.checkpoint
        def chunk_body(states, x_chunk):
            # rematerialized: backward stores only chunk-boundary states and
            # recomputes in-chunk activations, so training memory is
            # O(T/chunk · state) instead of O(T · 4H) per layer
            h_seq = x_chunk  # [chunk, B, F]
            new_states = []
            for li, p in enumerate(layer_params):
                st, h_seq = layer_scan(p, states[li], h_seq)
                new_states.append(st)
            out = self._project(params, h_seq)  # [chunk, B, out]
            return new_states, out

        h0 = jnp.zeros((b, self.hidden_size), x.dtype)
        states0 = [((h0, h0) if is_lstm else h0) for _ in layer_params]
        _, ys = jax.lax.scan(chunk_body, states0, xs)
        # ys: [num_chunks, chunk, B, out] -> [B, T, out]
        out_dim = ys.shape[-1]
        ys = ys.reshape(t_pad, b, out_dim)
        return jnp.swapaxes(ys, 0, 1)[:, :t]

    # -- streaming -----------------------------------------------------

    def init_state(self, params, batch_size, dtype=jnp.float32):
        return rnn.rnn_init_state(
            params["rnn"], batch_size, self.sequence_model, dtype
        )

    def step(self, params: dict, state, x: jax.Array):
        """Single-frame transition: x [B, F] -> (new_state, y [B, F_out]).

        Only unidirectional stacks can stream.
        """
        assert not self.bidirectional, "bidirectional models cannot stream"
        new_state = []
        h_in = x
        for li, layer in enumerate(params["rnn"]):
            p = layer[0]
            if self.sequence_model == "LSTM":
                x_proj = h_in @ p["w_ih"].T + (p["b_ih"] + p["b_hh"])
                st, h_in = rnn.lstm_step(p, state[li], x_proj)
            else:
                hidden = p["w_hh"].shape[1]
                x_proj = h_in @ p["w_ih"].T + p["b_ih"]
                parts = (x_proj[..., : 2 * hidden], x_proj[..., 2 * hidden :])
                st, h_in = rnn.gru_step(p, state[li], parts)
            new_state.append(st)
        return new_state, self._project(params, h_in)
