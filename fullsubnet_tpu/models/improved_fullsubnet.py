"""Improved FullSubNet — end-to-end wave-to-wave with finer-to-coarser
multi-resolution sub-band partitioning (up to 48 kHz).

Functional twin of the reference
(``recipes/dns_interspeech_2020/improved_fullsubnet/model.py:252-591``):
the spectrum is split at ``freq_cutoffs`` into sections; each section is
unfolded with its own stride (= number of center bins per unit) and
processed by its own 2-layer LSTM that emits a 2×center-bin cRM per unit.
Lower sections get fine-grained units (1 center bin), higher sections
coarse ones (up to 60) — the compute budget follows perceptual
importance. The whole forward (STFT → FDRC → fullband → sections → mask →
iSTFT) jits as one program.

TPU notes: each section's strided unfold is a static gather; the section
LSTM batches its units in the leading axis (like FullSubNet's sub-band
trick) so every scan step stays a well-shaped GEMM.
"""

import jax
import jax.numpy as jnp
import numpy as np

from fullsubnet_tpu.acoustics.norm import norm_wrapper
from fullsubnet_tpu.acoustics.stft import istft, stft_complex
from fullsubnet_tpu.nn.sequence_model import SequenceModel


def _strided_freq_unfold(
    x: jax.Array,
    lower_cutoff: int,
    upper_cutoff: int,
    num_center_freqs: int,
    num_neighbor_freqs: int,
) -> jax.Array:
    """Strided sub-band unfold of one frequency section.

    x: [B, 1, F, T] -> [B, N_units, 1, center+2·neighbors, T] with
    stride = num_center_freqs (reference ``improved .../model.py:315-400``).
    Edge sections reflect-pad outward; interior sections read their
    neighbors from the adjacent sections directly.
    """
    b, c, f, t = x.shape
    assert c == 1, "Only mono audio is supported."
    if (upper_cutoff - lower_cutoff) % num_center_freqs != 0:
        raise ValueError(
            "The number of center frequencies should be divisible by the "
            f"subband frequency interval. Got num_center_freqs="
            f"{num_center_freqs}, upper_cutoff_freq={upper_cutoff}, "
            f"lower_cutoff_freq={lower_cutoff}."
        )

    nb = num_neighbor_freqs
    if lower_cutoff == 0:
        valid = x[..., 0 : upper_cutoff + nb, :]
        valid = jnp.pad(valid, ((0, 0), (0, 0), (nb, 0), (0, 0)), mode="reflect")
    elif upper_cutoff == f:
        valid = x[..., lower_cutoff - nb : f, :]
        valid = jnp.pad(valid, ((0, 0), (0, 0), (0, nb), (0, 0)), mode="reflect")
    else:
        valid = x[..., lower_cutoff - nb : upper_cutoff + nb, :]

    width = num_center_freqs + 2 * nb
    num_units = (upper_cutoff - lower_cutoff) // num_center_freqs
    starts = np.arange(num_units) * num_center_freqs
    idx = starts[:, None] + np.arange(width)[None, :]  # [N, width]
    units = valid[:, :, idx, :]  # [B, 1, N, width, T]
    return jnp.transpose(units, (0, 2, 1, 3, 4))  # [B, N, 1, width, T]


class SubbandModel:
    """Finer-to-coarser multi-section sub-band stage."""

    def __init__(
        self,
        freq_cutoffs,
        sb_num_center_freqs,
        sb_num_neighbor_freqs,
        fb_num_center_freqs,
        fb_num_neighbor_freqs,
        sequence_model: str,
        hidden_size: int,
        activate_function=None,
        norm_type: str = "offline_laplace_norm",
    ):
        self.freq_cutoffs = list(freq_cutoffs)
        self.sb_num_center_freqs = list(sb_num_center_freqs)
        self.sb_num_neighbor_freqs = list(sb_num_neighbor_freqs)
        self.fb_num_center_freqs = list(fb_num_center_freqs)
        self.fb_num_neighbor_freqs = list(fb_num_neighbor_freqs)
        self.norm = norm_wrapper(norm_type)
        # Pallas kernel path for the section LSTMs (training uses the
        # custom-VJP variant, see ops.subband_lstm.fused_subband_lstm_train)
        self.use_pallas = True
        self.sb_models = [
            SequenceModel(
                input_size=(sc + 2 * sn) + (fc + 2 * fn),
                output_size=sc * 2,
                hidden_size=hidden_size,
                num_layers=2,
                bidirectional=False,
                sequence_model=sequence_model,
                output_activate_function=activate_function,
            )
            for sc, sn, fc, fn in zip(
                self.sb_num_center_freqs,
                self.sb_num_neighbor_freqs,
                self.fb_num_center_freqs,
                self.fb_num_neighbor_freqs,
            )
        ]

    def init(self, key, dtype=jnp.float32, weight_init=False):
        keys = jax.random.split(key, len(self.sb_models))
        return {
            "sb_models": [
                m.init(k, dtype, orthogonal_init=weight_init)
                for m, k in zip(self.sb_models, keys)
            ]
        }

    def _section_bounds(self, sb_idx: int, num_freqs: int):
        if sb_idx == 0:
            return 0, self.freq_cutoffs[0]
        if sb_idx == len(self.sb_models) - 1:
            return self.freq_cutoffs[-1], num_freqs
        return self.freq_cutoffs[sb_idx - 1], self.freq_cutoffs[sb_idx]

    def section_stash_budget(self) -> int:
        """Per-section training stash budget. Sections run sequentially
        under remat, but their VJP residuals are all live until the
        backward, so each section only gets a slice of the default
        budget — enforced both in the kernel-routing gate and inside the
        kernel (whose chunker would otherwise size its stash against the
        full default)."""
        return 6 * 2**30 // max(1, len(self.sb_num_center_freqs))

    def __call__(
        self, params, noisy_input: jax.Array, fb_output: jax.Array,
        training: bool = False, valid_total=None,
    ):
        """noisy_input/fb_output [B, 1, F, T] -> cRM [B, 2, F, T].

        ``valid_total``: optional [b, 1, 1, 1] true frame counts for a
        zero-padded, length-bucketed input — offline section norms then
        use masked (true-count) statistics; causal norms are exact
        under zero tails as-is (``acoustics.norm.masked_offline_norm``).
        """
        b, c, f, t = noisy_input.shape
        assert c == 1, "Only mono audio is supported."

        norm = self.norm
        if valid_total is not None:
            from fullsubnet_tpu.acoustics.norm import masked_offline_norm

            norm = masked_offline_norm(self.norm, valid_total) or self.norm

        section_outputs = []
        for sb_idx, sb_model in enumerate(self.sb_models):
            lower, upper = self._section_bounds(sb_idx, f)
            noisy_sub = _strided_freq_unfold(
                noisy_input, lower, upper,
                self.sb_num_center_freqs[sb_idx],
                self.sb_num_neighbor_freqs[sb_idx],
            )
            fb_sub = _strided_freq_unfold(
                fb_output, lower, upper,
                self.fb_num_center_freqs[sb_idx],
                self.fb_num_neighbor_freqs[sb_idx],
            )
            sb_in = jnp.concatenate([noisy_sub, fb_sub], axis=-2)
            sb_in = norm(sb_in.reshape(b, -1, sb_in.shape[-2], t)).reshape(
                sb_in.shape
            )

            # [B, N, 1, width, T] -> [B·N, width, T] -> LSTM -> [B·N, 2c, T]
            n_units = sb_in.shape[1]
            width = sb_in.shape[-2]
            flat = sb_in.reshape(b * n_units, width, t)
            sb_params = params["sb_models"][sb_idx]
            rows = b * n_units
            section_budget = self.section_stash_budget()
            if training:
                from fullsubnet_tpu.ops.subband_lstm import (
                    train_bwd_peak_bytes,
                )

                # the kernel VJP auto-chunks, but at extreme T x rows even
                # the chunked stash (+ per-chunk backward transients +
                # kernel I/O) can bust HBM; those sections train on the
                # scan path. Transient-aware accounting shared with
                # FullSubNet._grouped_chunk; bound 2x the stash budget
                # (see SequenceModel._pallas_eligible for the rationale).
                itemsize = jnp.dtype(sb_in.dtype).itemsize
                stash_ok = (
                    train_bwd_peak_bytes(
                        t, rows, sb_model.hidden_size, unit=width,
                        out=sb_model.output_size,
                        cell=sb_model.sequence_model.lower(),
                        itemsize=itemsize, stash_budget=section_budget,
                        num_layers=len(sb_params["rnn"]),
                    )
                    <= 2 * section_budget
                )
            else:
                stash_ok = True
            if (
                self.use_pallas
                and jax.default_backend() != "cpu"
                and not sb_model.output_activate_function
                and rows >= 128  # row-tile padding waste dominates below
                and stash_ok
            ):
                # Pallas fused dual-LSTM kernel (weights resident in VMEM);
                # tile sized to the section so lane padding stays small.
                # Under training the custom-VJP variant stashes states for
                # the time-reversed backward kernels.
                from fullsubnet_tpu.ops.subband_lstm import (
                    auto_fwd_row_tile,
                    fused_subband_lstm,
                    fused_subband_lstm_train,
                )

                kernel = fused_subband_lstm_train if training else fused_subband_lstm
                out = kernel(
                    jnp.transpose(flat, (2, 0, 1)),  # [T, B·N, width]
                    *[layer[0] for layer in sb_params["rnn"]],
                    sb_params["fc"],
                    # training: auto (largest VMEM-safe backward tile,
                    # capped by the padded row count); inference:
                    # even-split <=512 tile (48 kHz sections have odd
                    # row counts — 640 rows as 2x384, not 2x512)
                    row_tile=(
                        None if training else auto_fwd_row_tile(rows)
                    ),
                    stash_budget=section_budget,
                )  # [T, B·N, 2c]
                out = jnp.transpose(out, (1, 2, 0))  # [B·N, 2c, T]
            else:
                out = sb_model(sb_params, flat, training=training)
            # -> [B, N, 2, c, T] -> [B, 2, N·c, T]
            out = out.reshape(b, n_units, 2, -1, t)
            out = jnp.transpose(out, (0, 2, 1, 3, 4)).reshape(b, 2, -1, t)
            section_outputs.append(out)

        return jnp.concatenate(section_outputs, axis=-2)


class ImprovedFullSubNet:
    """Wave-to-wave model: STFT, FDRC, fullband LSTM, multi-section
    sub-band cRM, masking, iSTFT — one jittable program."""

    def __init__(
        self,
        n_fft: int = 512,
        hop_length: int = 128,
        win_length: int = 512,
        fdrc: float = 0.5,
        num_freqs: int = 257,
        freq_cutoffs=(20, 80),
        sb_num_center_freqs=(1, 4, 8),
        sb_num_neighbor_freqs=(15, 15, 15),
        fb_num_center_freqs=(1, 4, 8),
        fb_num_neighbor_freqs=(15, 15, 15),
        fb_hidden_size: int = 512,
        sb_hidden_size: int = 384,
        sequence_model: str = "LSTM",
        fb_output_activate_function=None,
        sb_output_activate_function=None,
        norm_type: str = "offline_laplace_norm",
        compute_dtype=None,
    ):
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.win_length = win_length
        self.fdrc = fdrc
        # optional low-precision policy for the recurrent stacks; the
        # STFT/iSTFT and masking stay fp32
        self.compute_dtype = compute_dtype
        self.num_freqs = num_freqs
        self.norm = norm_wrapper(norm_type)

        self.fb_model = SequenceModel(
            input_size=num_freqs - 1,  # last bin dropped for easier processing
            output_size=num_freqs - 1,
            hidden_size=fb_hidden_size,
            num_layers=2,
            bidirectional=False,
            sequence_model=sequence_model,
            output_activate_function=fb_output_activate_function,
        )
        self.sb_model = SubbandModel(
            freq_cutoffs=freq_cutoffs,
            sb_num_center_freqs=sb_num_center_freqs,
            sb_num_neighbor_freqs=sb_num_neighbor_freqs,
            fb_num_center_freqs=fb_num_center_freqs,
            fb_num_neighbor_freqs=fb_num_neighbor_freqs,
            hidden_size=sb_hidden_size,
            sequence_model=sequence_model,
            activate_function=sb_output_activate_function,
            norm_type=norm_type,
        )

    def init(self, key, dtype=jnp.float32, weight_init=False) -> dict:
        kf, ks = jax.random.split(key)
        return {
            "fb_model": self.fb_model.init(kf, dtype, orthogonal_init=weight_init),
            "sb_model": self.sb_model.init(ks, dtype, weight_init=weight_init),
        }

    # usable HBM for the auto grad-accum estimate (same headroom rationale
    # as FullSubNet._ACCUM_HBM_CAP: v5e has 15.75 GB; leave room for XLA
    # fragmentation and optimizer transients)
    _ACCUM_HBM_CAP = int(14 * 2**30)

    def _section_shapes(self):
        """Static (n_units, width) per sub-band section at the model's F
        (last bin dropped), mirroring ``SubbandModel.__call__``'s unfolds."""
        f = self.num_freqs - 1
        shapes = []
        sb = self.sb_model
        for i in range(len(sb.sb_models)):
            lower, upper = sb._section_bounds(i, f)
            sc = sb.sb_num_center_freqs[i]
            sn = sb.sb_num_neighbor_freqs[i]
            fc = sb.fb_num_center_freqs[i]
            fn = sb.fb_num_neighbor_freqs[i]
            shapes.append(
                ((upper - lower) // sc, (sc + 2 * sn) + (fc + 2 * fn))
            )
        return shapes

    def recommended_grad_accum(
        self, b, t, itemsize=2, drop_groups=1, mesh=None, extra_bytes=0
    ):
        """Auto-pick the trainer-level gradient-accumulation split G for a
        (batch, frames) training shape — same contract as
        ``FullSubNet.recommended_grad_accum``.

        The improved family's capacity pinch is the SECTION stash budget:
        the sub-band sections run sequentially but their VJP residuals are
        all live until the backward, so each section gets only
        ``6 GB / num_sections``. Once any section's microbatch stash
        exceeds that, the kernel time-chunks and throughput drops
        (measured, v5e bf16 3.072 s crops: 16 kHz B=64 → 1051 audio-s/s
        monolithic vs B=128 → 883 chunked; G=2 at B=128 restores the
        B=64 step shape). The policy mirrors the flagship's:

        1. the smallest G whose microbatch keeps EVERY section's stash
           monolithic within its budget (and every section on the kernel
           path: rows ≥ 128), else
        2. the smallest G whose estimated HBM total fits the chip.

        ``drop_groups`` is accepted for trainer-interface compatibility
        but unused — the wave-to-wave family has no drop_band.
        ``extra_bytes``: persistent full-batch buffers outside this
        estimate (e.g. device-synthesis components).
        """
        del drop_groups
        sb0 = self.sb_model.sb_models[0]
        hidden = sb0.hidden_size
        n_stash = 4 if sb0.sequence_model.lower() == "lstm" else 2
        t8 = -(-t // 8) * 8
        budget = self.sb_model.section_stash_budget()
        shapes = self._section_shapes()
        data_div = mesh.shape.get("data", 1) if mesh is not None else 1

        def pad128(n):
            return -(-n // 128) * 128

        def valid(g):
            bg = b // g
            return b % g == 0 and bg % max(data_div, 1) == 0

        def stash(bg, n_units):
            # per-device rows: the batch (hence every section's rows)
            # shards over the data axis only
            rows = pad128(-(-bg // max(data_div, 1)) * n_units)
            return t8 * n_stash * rows * hidden * itemsize

        def monolithic(bg):
            return all(stash(bg, n) <= budget for n, _ in shapes)

        def kernel_rows(bg):
            return all((bg // max(data_div, 1)) * n >= 128 for n, _ in shapes)

        def total_bytes(bg):
            bg_dev = -(-bg // max(data_div, 1))
            io = sum(
                3 * t * w * pad128(bg_dev * n) * itemsize for n, w in shapes
            )
            stashes = sum(min(stash(bg, n), 2 * budget) for n, _ in shapes)
            spectra = bg_dev * self.num_freqs * t * 30
            fb = 4 * 2 * bg_dev * self.fb_model.hidden_size * t * itemsize
            return io + stashes + spectra + fb + int(0.3 * 2**30)

        cap = self._ACCUM_HBM_CAP - int(extra_bytes)
        splits = [g for g in (1, 2, 4, 8, 16, 32, 64) if g <= b and valid(g)]
        for g in splits:  # rule 1: every section monolithic + kernel-routed
            bg = b // g
            if (
                bg // max(data_div, 1) >= 16
                and kernel_rows(bg)
                and monolithic(bg)
                and total_bytes(bg) <= cap
            ):
                return g
        for g in splits:  # rule 2: largest microbatch that fits HBM
            if total_bytes(b // g) <= cap:
                return g
        return splits[-1] if splits else 1

    def __call__(
        self,
        params: dict,
        y: jax.Array,
        training: bool = False,
        valid_samples: jax.Array | None = None,
    ) -> jax.Array:
        """y [B, T] or [B, 1, T] noisy waveform -> enhanced [B, 1, T].

        ``valid_samples``: optional (traced) count of real samples in a
        length-bucketed (zero-padded) ``y`` — a scalar or a [B] vector.
        The model re-creates the offline tail reflection at the true
        length, zeroes padded spectrum frames, computes every offline
        norm's statistics with the TRUE frame count (causal norms are
        exact under zero tails as-is), and masks the iSTFT — so the
        first ``valid_samples`` output samples EXACTLY equal an unpadded
        run. One compile then serves every utterance length in a bucket
        (the stacks here are always unidirectional). The caller discards
        output past ``valid_samples``.
        """
        ndim = y.ndim
        assert ndim in (2, 3), "Input must be 2D (B, T) or 3D tensor (B, 1, T)"
        if ndim == 3:
            assert y.shape[1] == 1
            y = y[:, 0]

        num_samples = y.shape[-1]
        frames_real = None
        if valid_samples is not None:
            from fullsubnet_tpu.acoustics.stft import (
                insert_tail_reflection,
                traced_num_frames,
            )

            vs = jnp.asarray(valid_samples).reshape(-1)  # [1] or [B]
            vsb = jnp.broadcast_to(vs, (y.shape[0],))
            y = jax.vmap(
                lambda w, L: insert_tail_reflection(w, L, self.n_fft)
            )(y, vsb)
            frames_real = traced_num_frames(vs, self.hop_length, self.n_fft)

        spec = stft_complex(y, self.n_fft, self.hop_length, self.win_length)
        noisy_real, noisy_imag = spec.real, spec.imag  # [B, F, T]
        noisy_mag = jnp.abs(spec)[:, None]  # [B, 1, F, T]

        tmask = None
        valid_total = None
        if frames_real is not None:
            tmask = (
                jnp.arange(spec.shape[-1])[None, :] < frames_real[:, None]
            ).astype(jnp.float32)  # [b, T'], b in {1, B}
            noisy_mag = noisy_mag * tmask[:, None, None, :]
            valid_total = frames_real.astype(jnp.float32)[
                :, None, None, None
            ]

        # Fullband (on FDRC-compressed magnitudes, last bin dropped)
        noisy_mag = noisy_mag**self.fdrc
        noisy_mag = noisy_mag[..., :-1, :]
        if self.compute_dtype is not None:
            noisy_mag = noisy_mag.astype(self.compute_dtype)
        b, c, f, t = noisy_mag.shape
        norm = self.norm
        if valid_total is not None:
            from fullsubnet_tpu.acoustics.norm import masked_offline_norm

            norm = masked_offline_norm(self.norm, valid_total) or self.norm
        fb_input = norm(noisy_mag).reshape(b, f, t)
        fb_output = self.fb_model(params["fb_model"], fb_input, training=training)
        fb_output = fb_output.reshape(b, 1, f, t)
        if tmask is not None:
            # pad frames would otherwise leak (LSTM biases) into the
            # sub-band sections' offline norm statistics
            fb_output = fb_output * tmask[:, None, None, :].astype(
                fb_output.dtype
            )

        # Subband sections -> cRM over F-1 bins, pad the last bin with 0
        cRM = self.sb_model(
            params["sb_model"], noisy_mag, fb_output, training=training,
            valid_total=valid_total,
        )
        cRM = cRM.astype(jnp.float32)
        cRM = jnp.pad(cRM, ((0, 0), (0, 0), (0, 1), (0, 0)))

        # Masking + iSTFT. NOTE: the reference applies the mask elementwise
        # per component (real mask x real part, imag mask x imag part), NOT
        # as a complex multiplication (``improved .../model.py:575-581``) —
        # replicated exactly for checkpoint parity.
        enhanced_real = cRM[:, 0] * noisy_real
        enhanced_imag = cRM[:, 1] * noisy_imag
        frame_mask = None
        if tmask is not None:
            enhanced_real = enhanced_real * tmask[:, None, :]
            enhanced_imag = enhanced_imag * tmask[:, None, :]
            frame_mask = tmask if tmask.shape[0] > 1 else tmask[0]
        return istft(
            (enhanced_real, enhanced_imag),
            self.n_fft,
            self.hop_length,
            self.win_length,
            length=num_samples,
            input_type="real_imag",
            frame_mask=frame_mask,
        )[:, None, :]
