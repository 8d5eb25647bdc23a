"""Streaming (frame-by-frame) FullSubNet inference.

The reference achieves streaming via causal design — cumulative
normalizations + unidirectional LSTMs + 2-frame look-ahead (SURVEY §5) —
but ships no streaming engine; its released "cumulative norm" checkpoint is
meant for exactly this. Here the streaming step is a first-class compiled
program:

* **Carry** = (fb LSTM state, sb LSTM state ×257 freqs, cumulative-norm
  running sums, frame counter); the caller realizes the 2-frame
  look-ahead by buffering spectrum frames.
* **Step** consumes one STFT magnitude frame and emits the cRM for the
  frame ``look_ahead`` steps earlier — bit-identical to the offline
  forward with ``cumulative_laplace_norm`` (verified in tests), because
  the offline pad-then-slice is algebraically a delay line.
* ``step_block`` scans K frames per call for throughput; ``step`` is the
  single-frame latency path. Both have fixed shapes → compiled once.

A streaming overlap-add iSTFT (``StreamingISTFT``) turns mask×spec frames
back into waveform with one-hop latency using the steady-state squared-
window envelope.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fullsubnet_tpu.acoustics.stft import hann_window
from fullsubnet_tpu.constant import EPSILON
from fullsubnet_tpu.models.fullsubnet import FullSubNet


class StreamingFullSubNet:
    """Frame-in/cRM-out streaming engine for a FullSubNet with
    ``cumulative_laplace_norm``."""

    def __init__(self, model: FullSubNet, params):
        assert model.fb_num_neighbors == 0, "streaming supports fb neighbors=0"
        self.model = model
        self.params = params
        self.F = model.num_freqs
        self.N = model.sb_num_neighbors
        self.look_ahead = model.look_ahead
        self._step = jax.jit(self._step_impl)
        self._block = jax.jit(self._block_impl)

    # -- state ----------------------------------------------------------

    def init_state(self):
        fb = self.model.fb_model
        sb = self.model.sb_model
        return {
            "fb_rnn": fb.init_state(self.params["fb_model"], 1),
            "sb_rnn": sb.init_state(self.params["sb_model"], self.F),
            # cumulative_laplace_norm running sums: scalar for the fullband
            # ([B*C,F,T] with C=1), per-frequency for the subband stage
            # ([B*F, 32, T] -> one running sum per frequency bin)
            "fb_norm_sum": jnp.zeros((), jnp.float32),
            "sb_norm_sum": jnp.zeros((self.F,), jnp.float32),
            "frame_idx": jnp.zeros((), jnp.int32),
        }

    # -- single frame ---------------------------------------------------

    def _unfold_frame(self, frame: jax.Array) -> jax.Array:
        """[F] -> [F, 2N+1] reflect-padded neighborhood units."""
        pad = self.N
        fp = jnp.pad(frame, (pad, pad), mode="reflect")
        idx = np.arange(self.F)[:, None] + np.arange(2 * pad + 1)[None, :]
        return fp[idx]

    def _step_impl(self, params, state, frame):
        """frame: [F] noisy magnitude. Returns (state, cRM [2, F]) for the
        frame ``look_ahead`` steps ago."""
        model = self.model
        k = state["frame_idx"] + 1  # 1-based frame count

        # --- fullband stage -------------------------------------------
        fb_sum = state["fb_norm_sum"] + jnp.sum(frame)
        fb_mu = fb_sum / (k.astype(jnp.float32) * self.F)
        fb_in = frame / (fb_mu + EPSILON)  # [F]
        fb_state, fb_out = model.fb_model.step(
            params["fb_model"], state["fb_rnn"], fb_in[None]
        )  # fb_out [1, F]

        # --- subband stage --------------------------------------------
        noisy_units = self._unfold_frame(frame)  # [F, 2N+1]
        sb_in = jnp.concatenate([noisy_units, fb_out[0][:, None]], axis=1)  # [F, 32]
        sb_sum = state["sb_norm_sum"] + jnp.sum(sb_in, axis=1)  # [F]
        unit = sb_in.shape[1]
        sb_mu = sb_sum / (k.astype(jnp.float32) * unit)
        sb_in = sb_in / (sb_mu[:, None] + EPSILON)
        sb_state, crm = model.sb_model.step(
            params["sb_model"], state["sb_rnn"], sb_in
        )  # crm [F, 2]

        new_state = {
            "fb_rnn": fb_state,
            "sb_rnn": sb_state,
            "fb_norm_sum": fb_sum,
            "sb_norm_sum": sb_sum,
            "frame_idx": k,
        }
        return new_state, crm.T  # [2, F]

    def step(self, state, frame):
        """Host API: one magnitude frame in, one cRM out (delayed)."""
        return self._step(self.params, state, frame)

    # -- block scan -----------------------------------------------------

    def _block_impl(self, params, state, frames):
        """frames: [K, F] -> (state, cRMs [K, 2, F])."""

        def body(st, fr):
            return self._step_impl(params, st, fr)

        return jax.lax.scan(body, state, frames)

    def step_block(self, state, frames):
        return self._block(self.params, state, frames)

    # -- full utterance convenience ------------------------------------

    def enhance_spectrogram(self, noisy_mag: jax.Array) -> jax.Array:
        """[F, T] magnitudes -> [2, F, T] cRM, streaming semantics.

        Feeds ``look_ahead`` trailing zero frames (the offline pad) and
        discards the first ``look_ahead`` outputs — reproducing the offline
        pad-then-slice exactly.
        """
        T = noisy_mag.shape[-1]
        frames = jnp.concatenate(
            [noisy_mag.T, jnp.zeros((self.look_ahead, self.F))], axis=0
        )  # [T+la, F]
        state = self.init_state()
        _, crms = self.step_block(state, frames)  # [T+la, 2, F]
        return jnp.transpose(crms[self.look_ahead :], (1, 2, 0))  # [2, F, T]


class StreamingEnhancer:
    """Push-based wave-in/wave-out real-time enhancer.

    Wires streaming STFT framing (with the offline pipeline's reflect
    center-pad reproduced at stream start), the :class:`StreamingFullSubNet`
    engine, the 2-frame look-ahead delay, cIRM decompression/masking, and
    the streaming OLA iSTFT. Feed hop-sized sample blocks; receive
    hop-sized enhanced blocks after an algorithmic latency of
    ``(1 + look_ahead) · hop`` samples plus the OLA hop.

    Matches the offline ``full_band_crm_mask`` pipeline (cumulative-norm
    checkpoints) in the steady-state interior.
    """

    def __init__(self, model: FullSubNet, params, n_fft=512, hop_length=256):
        from fullsubnet_tpu.acoustics.mask import decompress_cIRM

        self.engine = StreamingFullSubNet(model, params)
        self.n_fft = n_fft
        self.hop = hop_length
        self.window = hann_window(n_fft)
        self.ola = StreamingISTFT(n_fft, hop_length)
        self._decompress = decompress_cIRM
        self.look_ahead = model.look_ahead

    def init_state(self):
        return {
            "samples": np.zeros(0, np.float32),  # host-side frame buffer
            "started": False,
            "engine": self.engine.init_state(),
            "spec_delay": [],  # complex frames awaiting their mask
            "ola": self.ola.init_state(),
        }

    def _emit(self, state, spec_frame):
        """Advance the engine one frame; mask + OLA the delayed frame."""
        state["spec_delay"].append(spec_frame)
        eng, crm = self.engine.step(state["engine"], jnp.abs(spec_frame))
        state["engine"] = eng
        if len(state["spec_delay"]) <= self.look_ahead:
            return None  # warm-up: masks so far belong to future frames
        target = state["spec_delay"].pop(0)
        crm = self._decompress(crm)  # [2, F]
        er = crm[0] * target.real - crm[1] * target.imag
        ei = crm[1] * target.real + crm[0] * target.imag
        state["ola"], out = self.ola.push(
            state["ola"], jax.lax.complex(er, ei)
        )
        return np.asarray(out)

    def push(self, state, samples: np.ndarray):
        """Feed samples; returns (state, enhanced np.ndarray (maybe empty))."""
        if not state["started"]:
            state["samples"] = np.concatenate(
                [state["samples"], np.asarray(samples, np.float32)]
            )
            pad = self.n_fft // 2
            if len(state["samples"]) < pad + 1:  # reflect needs pad+1 samples
                return state, np.zeros(0, np.float32)
            # offline center reflect-pad, reproduced causally at start
            head = state["samples"][1 : pad + 1][::-1]
            state["samples"] = np.concatenate([head, state["samples"]])
            state["started"] = True
        else:
            state["samples"] = np.concatenate(
                [state["samples"], np.asarray(samples, np.float32)]
            )

        outs = []
        while len(state["samples"]) >= self.n_fft:
            frame = state["samples"][: self.n_fft] * np.asarray(self.window)
            state["samples"] = state["samples"][self.hop :]
            spec = jnp.fft.rfft(jnp.asarray(frame))
            out = self._emit(state, spec)
            if out is not None:
                outs.append(out)
        return state, (
            np.concatenate(outs) if outs else np.zeros(0, np.float32)
        )

    def flush(self, state, remaining_padding: int | None = None):
        """End of stream: push zeros until all buffered frames are emitted."""
        outs = []
        flush_blocks = 2 + self.look_ahead + self.n_fft // self.hop
        for _ in range(flush_blocks):
            state, out = self.push(state, np.zeros(self.hop, np.float32))
            if len(out):
                outs.append(out)
        return state, (
            np.concatenate(outs) if outs else np.zeros(0, np.float32)
        )


class StreamingISTFT:
    """Streaming inverse STFT via overlap-add with hop-sized output chunks.

    For 50% overlap (hop = n_fft/2) each output hop is the sum of exactly
    two windowed frames; the steady-state envelope w²[n] + w²[n+hop] is
    precomputed. Latency: one hop after the frame is available.
    """

    def __init__(self, n_fft: int, hop_length: int):
        assert n_fft % hop_length == 0
        self.n_fft = n_fft
        self.hop = hop_length
        self.ratio = n_fft // hop_length
        w = np.asarray(hann_window(n_fft))
        self.window = jnp.asarray(w)
        env = np.zeros(n_fft)
        wsq = w**2
        for r in range(self.ratio):
            env += np.roll(wsq, r * hop_length)
        self.envelope = jnp.asarray(np.maximum(env[: hop_length], 1e-11))

    def init_state(self):
        return jnp.zeros((self.n_fft,), jnp.float32)

    def push(self, state, spec_frame):
        """spec_frame: [F] complex -> (state, hop_samples [hop])."""
        frame = jnp.fft.irfft(spec_frame, n=self.n_fft) * self.window
        acc = state + frame
        out = acc[: self.hop] / self.envelope
        new_state = jnp.concatenate(
            [acc[self.hop :], jnp.zeros((self.hop,), acc.dtype)]
        )
        return new_state, out
