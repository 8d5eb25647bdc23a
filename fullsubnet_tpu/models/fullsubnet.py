"""FullSubNet — the flagship full-band + sub-band fusion model.

Functional twin of the reference
(``recipes/dns_interspeech_2020/fullsubnet/model.py:9-136``), designed
TPU-first:

* The full-band stage is a stacked LSTM over the F-dim magnitude (one
  [B·T, F]x[F, 4H] MXU matmul per layer outside the scan).
* The sub-band stage runs ONE shared LSTM **batched over all frequencies**:
  the reference's reshape ``[B, F, 32, T] -> [B·F, 32, T]`` becomes the
  leading batch axis of the scan, so every step is a
  [B·F, 32+H] x [·, 4H]-shaped GEMM — large, static, MXU-friendly.
* ``freq_unfold`` is a static gather; ``drop_band`` (training-time
  frequency subsampling, groups=2) is static indexing — both jit-safe.
* Look-ahead pad of 2 frames = the reference's 32 ms algorithmic latency.

~5.6 M params with the paper hyperparameters (F=257, h_fb=512, h_sb=384,
sb neighbors=15, fb neighbors=0).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from fullsubnet_tpu.acoustics.feature import drop_band, freq_unfold
from fullsubnet_tpu.acoustics.norm import norm_wrapper
from fullsubnet_tpu.constant import EPSILON
from fullsubnet_tpu.nn.sequence_model import SequenceModel


class FullSubNet:
    def __init__(
        self,
        num_freqs: int = 257,
        look_ahead: int = 2,
        sequence_model: str = "LSTM",
        fb_num_neighbors: int = 0,
        sb_num_neighbors: int = 15,
        fb_output_activate_function: str | None = "ReLU",
        sb_output_activate_function: str | None = None,
        fb_model_hidden_size: int = 512,
        sb_model_hidden_size: int = 384,
        norm_type: str = "offline_laplace_norm",
        num_groups_in_drop_band: int = 2,
    ):
        assert sequence_model in ("GRU", "LSTM"), (
            "FullSubNet only supports GRU and LSTM."
        )
        self.num_freqs = num_freqs
        self.look_ahead = look_ahead
        self.fb_num_neighbors = fb_num_neighbors
        self.sb_num_neighbors = sb_num_neighbors
        self.num_groups_in_drop_band = num_groups_in_drop_band
        self.norm = norm_wrapper(norm_type)

        self.fb_model = SequenceModel(
            input_size=num_freqs,
            output_size=num_freqs,
            hidden_size=fb_model_hidden_size,
            num_layers=2,
            bidirectional=False,
            sequence_model=sequence_model,
            output_activate_function=fb_output_activate_function,
        )
        self.sb_model = SequenceModel(
            input_size=(sb_num_neighbors * 2 + 1) + (fb_num_neighbors * 2 + 1),
            output_size=2,
            hidden_size=sb_model_hidden_size,
            num_layers=2,
            bidirectional=False,
            sequence_model=sequence_model,
            output_activate_function=sb_output_activate_function,
        )

    def init(self, key, dtype=jnp.float32, weight_init=True) -> dict:
        kf, ks = jax.random.split(key)
        return {
            "fb_model": self.fb_model.init(kf, dtype, orthogonal_init=weight_init),
            "sb_model": self.sb_model.init(ks, dtype, orthogonal_init=weight_init),
        }

    # Above this many unfolded elements (B·F·(2N+1)·T), the [B, F, 32, T]
    # freq_unfold materialization dominates HBM; switch to the fused
    # sub-band pipeline that gathers/normalizes/scans chunk-by-chunk.
    _FUSED_SB_THRESHOLD = 2**28
    # On TPU, run the sub-band scan through the Pallas fused kernel
    # (weights resident in VMEM; ~1.4x the XLA chunked scan). The kernel
    # input [T, unit, B·F] is materialized feature-major (unpadded layout),
    # so cap it by element count.
    use_pallas_subband = True
    # Set True to admit the kernel path on a CPU backend, running it in
    # the Pallas interpreter — lets CPU-mesh tests and the scaling
    # harness compile the REAL shard_map'd sub-band SPMD program
    # (TPU execution is unaffected: interpret stays off there).
    pallas_interpret = False
    _PALLAS_SB_MAX_ELEMENTS = 2**31  # ~4 GB bf16
    # Training stashes 4 (LSTM) / 2 (GRU) [T, B*F', H] state tensors for
    # the backward kernels; above this budget the kernel's custom VJP
    # switches itself to the time-chunked stash (boundary states + per-
    # chunk remat), so the Pallas path stays the training path at any
    # batch size. The flagship has ONE sub-band stage, so that single
    # stash may own most of HBM: 10.5 GB keeps B=128 x 3.072 s monolithic
    # (1072 audio-s/s vs 727 chunked on v5e). Models with several kernel
    # stages (e.g. Improved FullSubNet's sections, whose stashes are all
    # live until the backward) use the kernel's 6 GB default instead.
    _PALLAS_TRAIN_STASH_BUDGET = int(10.5 * 2**30)  # bytes

    def __call__(
        self,
        params: dict,
        noisy_mag: jax.Array,
        dropping_band: bool = True,
        sharding_hint=None,
        training: bool = False,
        valid_frames: jax.Array | None = None,
    ) -> jax.Array:
        """noisy_mag [B, 1, F, T] -> cRM [B, 2, F', T].

        F' = F unless drop_band applies (training batches with B > 1 and
        ``dropping_band``), in which case F' = F // num_groups — matching
        the reference's train-time behavior (``fullsubnet/model.py:114-119``).

        ``sharding_hint``: optional callable applied to the sub-band input
        [B·F, unit, T] — multi-chip runs use it to spread the
        frequency-batched axis over a (data, subband) mesh.

        ``training``: route the sub-band stage through the fused pipeline
        with the differentiable Pallas kernel (custom VJP) — use under
        ``jax.grad``. The fused path then never materializes the
        [B, F, 2N+1, T] unfold, so big-batch training stays in HBM.

        ``valid_frames``: optional (traced) count of real frames in a
        length-bucketed (zero-padded) ``noisy_mag`` — a scalar (one
        shared length) or a [B] vector (per-example lengths, for batched
        bucketed inference). The offline norm statistics are computed
        with the TRUE frame count and the full-band output is masked
        past it, so outputs for the valid frames EXACTLY equal an
        unpadded run — one compile serves every utterance length in the
        bucket. The caller must zero the padded input frames and discard
        outputs past ``valid_frames``. Offline norms (laplace/gaussian)
        get masked statistics; the causal norms (cumulative laplace/
        layer, forgetting) are exact as-is. Requires unidirectional
        stacks (the trainer's ``_bucketing_supported`` gate) — a
        bidirectional RNN would leak pad frames backward.
        """
        assert noisy_mag.ndim == 4
        x = jnp.pad(noisy_mag, ((0, 0), (0, 0), (0, 0), (0, self.look_ahead)))
        batch_size, num_channels, num_freqs, num_frames = x.shape
        assert num_channels == 1, "FullSubNet takes the mag feature as input."

        norm = self.norm
        frame_mask = None
        valid_total = None
        if valid_frames is not None:
            from fullsubnet_tpu.acoustics.norm import masked_offline_norm

            # scalar (one shared length) or [B] (per-example lengths in a
            # padded batch) — normalize to a [b]-vector, b in {1, B}
            vf = jnp.asarray(valid_frames).reshape(-1)
            # the model's own look-ahead zero-pad counts toward the offline
            # statistics, exactly as in an unpadded run
            valid_total = (vf + self.look_ahead).astype(jnp.float32)[
                :, None, None, None
            ]  # [b, 1, 1, 1]
            frame_mask = (
                jnp.arange(num_frames)[None, :] < (vf + self.look_ahead)[:, None]
            ).astype(x.dtype)  # [b, T]
            # causal norms (cumulative laplace/layer, forgetting) return
            # None here: frame t sees only frames <= t, so zero-padded
            # tails leave the valid frames' outputs untouched — use as-is
            norm = masked_offline_norm(self.norm, valid_total) or self.norm

        # Full-band stage
        fb_input = norm(x).reshape(batch_size, num_freqs, num_frames)
        fb_output = self.fb_model(params["fb_model"], fb_input, training=training)
        fb_output = fb_output.reshape(batch_size, 1, num_freqs, num_frames)
        if frame_mask is not None:
            # pad frames would otherwise leak (LSTM biases) into the
            # offline norm statistics of the sub-band stage
            fb_output = fb_output * frame_mask[:, None, None, :]

        # Fused path: unfold + norm + sub-band scan without materializing
        # the [B, F, 2N+1, T] tensor. Used for big batches at inference and
        # (with drop_band grouping) for every training step.
        # the reference gates on batch > 1 (model.py:114) but its
        # drop_band asserts batch > groups — i.e. 1 < B <= G crashes
        # there; we gate on batch > groups so the model, the trainer's
        # target-side drop, and feature.drop_band's domain all agree
        # (tiny batches simply train without dropping)
        drop_applies = (
            batch_size > self.num_groups_in_drop_band
            and dropping_band
            and self.num_groups_in_drop_band > 1
        )
        unfold_elems = (
            batch_size
            * num_freqs
            * (2 * self.sb_num_neighbors + 2 * self.fb_num_neighbors + 2)
            * num_frames
        )
        # the fused path handles valid_frames exactly for both fusable
        # norms: offline laplace gets a masked mu denominator
        # (_sb_norm_mu), cumulative laplace is causal (zero-pad tails
        # leave valid frames untouched); the inputs are already zeroed
        # past the valid region (caller contract + fb_output mask above)
        assert valid_frames is None or not drop_applies, (
            "bucketed (valid_frames) calls are inference-shaped; "
            "drop_band grouping never applies"
        )
        fusable = (
            not self.sb_model.output_activate_function
            and self.norm in (self._norms_fusable())
            and (
                not drop_applies
                or batch_size % self.num_groups_in_drop_band == 0
            )
        )
        if fusable and (
            training
            or (not drop_applies and unfold_elems > self._FUSED_SB_THRESHOLD)
        ):
            sb_mask = self._fused_subband_stage(
                params, x, fb_output, sharding_hint,
                drop_groups=(
                    self.num_groups_in_drop_band if drop_applies else 1
                ),
                training=training,
                valid_total_frames=(
                    None if valid_total is None
                    else valid_total.reshape(-1)
                ),
            )
            return sb_mask[:, :, :, self.look_ahead :]

        # Unfold: [B, F, fb_unit, T] and [B, F, sb_unit, T]
        fb_unfolded = freq_unfold(fb_output, self.fb_num_neighbors)
        fb_unfolded = fb_unfolded.reshape(
            batch_size, num_freqs, self.fb_num_neighbors * 2 + 1, num_frames
        )
        noisy_unfolded = freq_unfold(x, self.sb_num_neighbors)
        noisy_unfolded = noisy_unfolded.reshape(
            batch_size, num_freqs, self.sb_num_neighbors * 2 + 1, num_frames
        )

        sb_input = jnp.concatenate([noisy_unfolded, fb_unfolded], axis=2)
        sb_input = norm(sb_input)

        if drop_applies:  # same batch > groups gate as the fused route
            sb_input = drop_band(
                jnp.transpose(sb_input, (0, 2, 1, 3)),
                num_groups=self.num_groups_in_drop_band,
            )
            num_freqs = sb_input.shape[2]
            sb_input = jnp.transpose(sb_input, (0, 2, 1, 3))

        sb_unit = (self.sb_num_neighbors * 2 + 1) + (self.fb_num_neighbors * 2 + 1)
        sb_input = sb_input.reshape(batch_size * num_freqs, sb_unit, num_frames)
        if sharding_hint is not None:
            sb_input = sharding_hint(sb_input)

        # One shared sub-band LSTM batched over all frequencies.
        sb_mask = self.sb_model(
            params["sb_model"], sb_input, training=training
        )  # [B*F, 2, T]
        sb_mask = sb_mask.reshape(batch_size, num_freqs, 2, num_frames)
        sb_mask = jnp.transpose(sb_mask, (0, 2, 1, 3))  # [B, 2, F, T]

        return sb_mask[:, :, :, self.look_ahead :]

    # ------------------------------------------------------------------
    # Fused sub-band pipeline (inference / big batches)
    # ------------------------------------------------------------------

    def _norms_fusable(self):
        from fullsubnet_tpu.acoustics.norm import (
            cumulative_laplace_norm,
            offline_laplace_norm,
        )

        return (offline_laplace_norm, cumulative_laplace_norm)

    def _sb_norm_mu(self, noisy_pad, fb_pad, f, valid_total_frames=None):
        """Normalization denominator of the concatenated sub-band input,
        computed WITHOUT materializing the unfold.

        noisy_pad: [B, F+2N_sb, T] reflect-padded magnitudes;
        fb_pad:    [B, F+2N_fb, T] reflect-padded full-band output
                   (= fb_flat when fb_num_neighbors == 0).

        offline_laplace_norm over [B, F, unit, T] is a per-batch scalar
        mean; each source's unfold-sum equals a counts-weighted sum over
        its padded bins (bin fp appears in ``count[fp]`` windows).
        cumulative_laplace_norm (input viewed as [B·F, unit, T]) is a
        per-(batch, f) running mean of the unit sums — a frequency box
        filter per source + time cumsum. Returns mu broadcastable against
        [B, F, unit, T].
        """
        from fullsubnet_tpu.acoustics.norm import offline_laplace_norm

        b, _, t = noisy_pad.shape
        n_sb, n_fb = self.sb_num_neighbors, self.fb_num_neighbors
        unit = (2 * n_sb + 1) + (2 * n_fb + 1)

        if self.norm is offline_laplace_norm:
            def weighted_total(arr, n):
                counts = np.zeros(arr.shape[1], np.float32)
                for u in range(2 * n + 1):
                    counts[u : u + f] += 1.0
                return jnp.einsum(
                    "bpt,p->b", arr, jnp.asarray(counts, arr.dtype)
                )

            total = weighted_total(noisy_pad, n_sb) + weighted_total(
                fb_pad, n_fb
            )
            # bucketed calls: inputs past the valid frames are zero, so
            # the sums are already masked — only the denominator needs
            # the true (per-example) frame count
            frames = t if valid_total_frames is None else valid_total_frames
            mu = total / (f * unit * frames)  # [B]
            return mu[:, None, None, None] + 1e-5

        # cumulative_laplace_norm: unit_sum[b,f,t] then running mean
        def box(arr, n):
            csum = jnp.cumsum(arr, axis=1)
            csum = jnp.concatenate(
                [jnp.zeros_like(csum[:, :1]), csum], axis=1
            )  # [B, FP+1, T]
            return csum[:, 2 * n + 1 :, :] - csum[:, : f, :]  # [B, F, T]

        unit_sum = box(noisy_pad, n_sb) + box(fb_pad, n_fb)
        run = jnp.cumsum(unit_sum, axis=-1)  # [B, F, T]
        counts_t = jnp.arange(unit, unit * t + 1, unit, dtype=noisy_pad.dtype)
        mu = run / counts_t[None, None, :]  # [B, F, T]
        return mu[:, :, None, :] + EPSILON

    def _group_selection(self, noisy_pad, fb_pad, mu, mu_is_scalar, groups, f):
        """drop_band as group-strided slicing on the fused-path operands.

        Reorders the batch group-major (matching ``drop_band``'s output
        ordering); the per-group interleaved center-frequency selection
        (``g, g+G, ...``, reference ``feature.py:309-345``) happens later
        as strided slices of the (still fully padded) sources. Returns
        (noisy_pad_r, fb_pad_r, mu_sel, fk).
        """
        b = noisy_pad.shape[0]
        fk = f // groups  # drop_band truncates F to a multiple of G
        sample_groups = [np.arange(g, b, groups) for g in range(groups)]
        regroup = lambda arr: jnp.concatenate(
            [arr[sg] for sg in sample_groups], axis=0
        )
        noisy_pad_r = regroup(noisy_pad)
        fb_pad_r = regroup(fb_pad)
        if mu_is_scalar:
            mu_sel = regroup(mu)
        else:
            freq_sel = lambda arr, g: jax.lax.slice_in_dim(
                arr, g, g + (fk - 1) * groups + 1, groups, axis=1
            )
            mu_sel = jnp.concatenate(
                [freq_sel(mu[sg], g) for g, sg in enumerate(sample_groups)],
                axis=0,
            )
        return noisy_pad_r, fb_pad_r, mu_sel, fk

    @staticmethod
    def _unit_slices(arr_pad, num_neighbors, f, drop_groups, b):
        """Per-unit-position slices of a reflect-padded source.

        Without drop grouping: the 2N+1 shifted [B, F, T] views. With it:
        group g's unit position u for center k reads padded bin g + k·G + u
        — a strided slice per (group, u), concatenated group-major on the
        batch axis (matching ``_group_selection``'s reorder).
        """
        if drop_groups == 1:
            return [
                arr_pad[:, u : u + f, :]
                for u in range(2 * num_neighbors + 1)
            ]
        bp = b // drop_groups
        return [
            jnp.concatenate(
                [
                    jax.lax.slice_in_dim(
                        arr_pad[g * bp : (g + 1) * bp],
                        g + u,
                        g + u + (f - 1) * drop_groups + 1,
                        drop_groups,
                        axis=1,
                    )
                    for g in range(drop_groups)
                ],
                axis=0,
            )
            for u in range(2 * num_neighbors + 1)
        ]

    def _pallas_subband(
        self, params, noisy_pad, fb_pad, f, mu, mu_is_scalar,
        sharding_hint=None, interpret=False, drop_groups=1, training=False,
        row_groups=1, time_chunk=None,
    ):
        """Sub-band stage through the Pallas fused dual-LSTM kernel.

        Builds the normalized kernel input feature-major ([T, unit, B·F'] —
        the layout that keeps the large axis minor/unpadded in HBM), then
        runs both LSTM layers + the output head entirely on-chip. With
        ``training`` the differentiable (custom-VJP) kernel variant runs
        instead, so this is also the training hot path.

        ``row_groups`` > 1 is the ROW-GROUP REMAT capacity escape for
        extreme training shapes (e.g. B=256 x 30 s, where even the
        time-chunked backward stash busts the HBM budget): the batch is
        split into G independent groups and each runs this same stage
        under ``jax.checkpoint`` inside a sequential ``lax.map``, so the
        forward saves only the (small) padded spectra and during the
        backward exactly ONE group's kernel input + state stash is live.
        Rows are independent sequences, so the result equals the
        ungrouped call (with ``drop_groups`` > 1, after a static batch
        re-permutation: each slice's group-major reorder is local, so
        the concatenated outputs are un/re-shuffled to the GLOBAL
        group-major order the drop_band targets use — ``bg %
        drop_groups == 0`` guarantees every sample keeps its correct
        frequency-group offset, only its output position moves); the
        cost is one extra (no-stash) forward per group — the same trade
        the time-chunked stash already makes.
        """
        from fullsubnet_tpu.ops.subband_lstm import (
            fused_subband_lstm,
            fused_subband_lstm_train,
        )

        if row_groups > 1:
            b = noisy_pad.shape[0]
            bg = b // row_groups
            assert bg * row_groups == b and (
                drop_groups == 1 or bg % drop_groups == 0
            )

            def body(args):
                np_g, fb_g, mu_g = args
                return self._pallas_subband(
                    params, np_g, fb_g, f, mu_g, mu_is_scalar,
                    sharding_hint, interpret, drop_groups, training,
                    time_chunk=time_chunk,
                )

            xs = (
                noisy_pad.reshape(row_groups, bg, *noisy_pad.shape[1:]),
                fb_pad.reshape(row_groups, bg, *fb_pad.shape[1:]),
                mu.reshape(row_groups, bg, *mu.shape[1:]),
            )
            out = jax.lax.map(jax.checkpoint(body), xs)  # [G, Bg, 2, F', T]
            out = out.reshape(b, *out.shape[2:])
            if drop_groups > 1:
                # produced order: slice-major, group-major WITHIN each
                # slice; expected (drop_band) order: group-major over the
                # WHOLE batch — a static permutation maps one to the other
                produced = np.concatenate([
                    r * bg + np.concatenate(
                        [np.arange(g, bg, drop_groups)
                         for g in range(drop_groups)]
                    )
                    for r in range(row_groups)
                ])
                expected = np.concatenate(
                    [np.arange(g, b, drop_groups) for g in range(drop_groups)]
                )
                inv = np.empty(b, np.int64)
                inv[produced] = np.arange(b)
                out = out[jnp.asarray(inv[expected])]
            return out

        b = noisy_pad.shape[0]
        t = noisy_pad.shape[2]
        n_sb, n_fb = self.sb_num_neighbors, self.fb_num_neighbors
        unit = (2 * n_sb + 1) + (2 * n_fb + 1)

        if drop_groups > 1:
            noisy_pad, fb_pad, mu, f = self._group_selection(
                noisy_pad, fb_pad, mu, mu_is_scalar, drop_groups, f
            )
        # stack shifted slices (no gather): [unit, B, F', T]
        slices = self._unit_slices(noisy_pad, n_sb, f, drop_groups, b)
        slices += self._unit_slices(fb_pad, n_fb, f, drop_groups, b)
        sb_in = jnp.stack(slices, axis=0)  # [unit, B, F', T]
        # mu is [B,1,1,1] (offline) or [B,F',1,T] (cumulative); both squeeze
        # to a broadcastable [1, B, F', T]
        sb_in = sb_in / mu[None, :, :, 0, :]
        hint_mesh = getattr(sharding_hint, "mesh", None)
        if hint_mesh is not None:
            # Pin the builder's layout BEFORE the [B,F']->rows merge:
            # without it the partitioner can replicate the whole
            # stack/normalize chain (all-gathering the global batch onto
            # every device) and only re-slice at the row constraint
            # below. B-major rows over (data, subband) == B by data,
            # F' by subband, so this is the same sharding, stated where
            # propagation can't miss it.
            from jax.sharding import NamedSharding, PartitionSpec as P

            axes = getattr(sharding_hint, "row_axes", ("data", "subband"))
            if (
                len(axes) == 2
                and b % hint_mesh.shape[axes[0]] == 0
                and f % hint_mesh.shape[axes[1]] == 0
            ):
                sb_in = jax.lax.with_sharding_constraint(
                    sb_in,
                    NamedSharding(hint_mesh, P(None, axes[0], axes[1], None)),
                )
        # -> [T, unit, B·F']
        sb_in = jnp.transpose(sb_in, (3, 0, 1, 2)).reshape(t, unit, b * f)
        sb_in = sb_in.astype(noisy_pad.dtype)
        if sharding_hint is not None:
            # hint expects [B·F, unit, T]
            sb_in = jnp.transpose(
                sharding_hint(jnp.transpose(sb_in, (2, 1, 0))), (2, 1, 0)
            )

        layers = params["sb_model"]["rnn"]
        kernel = fused_subband_lstm_train if training else fused_subband_lstm
        call = functools.partial(
            kernel, time_major_features=True, interpret=interpret,
            stash_budget=self._PALLAS_TRAIN_STASH_BUDGET,
            time_chunk=time_chunk,
        )
        mesh = getattr(sharding_hint, "mesh", None)
        if not training:
            # even-split <=512 inference tile: small-batch bucketed
            # inference (B=4 -> 1028 rows) would pad 3x512 under the
            # kernel default; pick from the PER-SHARD row count when the
            # kernel is shard_mapped below
            from fullsubnet_tpu.ops.subband_lstm import auto_fwd_row_tile

            rows_local = b * f
            if mesh is not None and (b * f) % mesh.size == 0:
                rows_local = (b * f) // mesh.size
            call = functools.partial(
                call, row_tile=auto_fwd_row_tile(rows_local)
            )
        if mesh is not None and (b * f) % mesh.size == 0:
            # Multi-chip: shard_map the kernel over the row axis. Each
            # frequency-batched row is an independent sequence, so the
            # per-shard kernels compute exactly the unsharded result; the
            # custom VJP's weight grads are psummed by shard_map's
            # transpose of the replicated in_specs.
            try:
                from jax import shard_map  # jax >= 0.8 renamed the kwarg
                _sm_kw = {"check_vma": False}
            except ImportError:
                from jax.experimental.shard_map import shard_map
                _sm_kw = {"check_rep": False}
            from jax.sharding import PartitionSpec as P

            row_axes = getattr(sharding_hint, "row_axes", ("data", "subband"))
            call = shard_map(
                call,
                mesh=mesh,
                in_specs=(P(None, None, row_axes), P(), P(), P()),
                out_specs=P(None, row_axes, None),
                **_sm_kw,
            )
        out = call(
            sb_in,
            layers[0][0],
            layers[1][0],
            params["sb_model"]["fc"],
        )  # [T, B·F', 2]
        out = out.reshape(t, b, f, 2)
        return jnp.transpose(out, (1, 3, 2, 0))  # [B, 2, F', T]

    @staticmethod
    def _grouped_chunk(t, n, hidden, unit, cell, itemsize, budget):
        """Stash time-chunk + backward HBM-peak estimate for ONE row
        group's kernel call.

        Unlike the kernel's own ``_pick_chunk`` (stash-only accounting,
        calibrated for the monolithic flagship path), this counts the
        per-chunk backward TRANSIENTS that scale with the chunk — the
        recomputed state stash, the dh1/dh2 cotangent chunks, and the
        x/dx chunks — plus 3x the kernel input for I/O (input, its remat
        copy under ``jax.checkpoint``, and dx). Grows the chunk from the
        peak-minimizing sqrt point toward 0.8x the budget (margin for
        XLA fragmentation, ~13% measured at these shapes). Returns
        (chunk, peak_bytes); chunk == 0 means the full per-step stash.
        """
        n_stash = 4 if cell == "lstm" else 2
        # 128-padded rows (exact: auto_bwd_row_tile never pads beyond it)
        n = -(-n // 128) * 128
        ps = n_stash * n * hidden * itemsize  # stash bytes / step
        # per-chunk transients / step: recomputed stash + dh1 + dh2
        # (H-sized) and x_c + dx_c (unit-sized)
        pc = (n_stash + 2) * n * hidden * itemsize + 2 * n * unit * itemsize
        io = 3 * t * unit * n * itemsize
        t8 = -(-t // 8) * 8
        full_peak = io + t8 * ps + 2 * t8 * n * hidden * itemsize
        if full_peak <= budget:
            return 0, full_peak
        peak = lambda k: io + (-(-t8 // k)) * ps + k * pc
        k = max(8, int(round(((t8 * ps / pc) ** 0.5) / 8.0)) * 8)
        k = min(k, t8)
        grow_cap = int(budget * 0.8)
        best = k
        while k + 8 <= t8 and peak(k + 8) <= grow_cap:
            k += 8
            best = k
        return best, peak(best)

    def _pick_row_groups(
        self, b, f_eff, t, unit, itemsize, drop_groups=1, mesh=None
    ):
        """Training-capacity routing for the Pallas sub-band stage.

        Returns ``(row_groups, time_chunk)``: ``(1, None)`` when the
        (auto-chunked) backward stash + kernel I/O of the full-batch call
        fits ``_PALLAS_TRAIN_STASH_BUDGET``; otherwise the smallest batch
        split G whose PER-GROUP backward peak (transient-aware, see
        :meth:`_grouped_chunk`) fits, along with the chunk that estimate
        chose (the row-group remat keeps only one group live during the
        backward); ``(0, None)`` when no split admits the shape (caller
        falls back to the remat'd scan)."""
        from fullsubnet_tpu.ops.subband_lstm import train_stash_bytes

        budget = self._PALLAS_TRAIN_STASH_BUDGET
        io_full = 2 * t * unit * b * f_eff * itemsize
        hidden = self.sb_model.hidden_size
        cell = self.sb_model.sequence_model.lower()
        if (
            train_stash_bytes(
                t, b * f_eff, hidden, cell, itemsize, stash_budget=budget
            )
            + io_full
            <= budget
        ):
            return 1, None
        for g_try in (2, 4, 8, 16, 32, 64):
            if b % g_try:
                continue
            bg = b // g_try
            if drop_groups > 1 and bg % drop_groups:
                continue
            if mesh is not None and (bg * f_eff) % mesh.size:
                continue
            chunk, peak = self._grouped_chunk(
                t, bg * f_eff, hidden, unit, cell, itemsize, budget
            )
            if peak <= budget:
                return g_try, chunk
        return 0, None

    # usable HBM for the auto grad-accum estimate: a v5e chip has
    # 15.75 GB; leave headroom for XLA fragmentation and the optimizer
    # update's transients (the estimate reproduced a measured
    # 16.21 GB OOM at bg=128 x 30 s to within 2%)
    _ACCUM_HBM_CAP = int(14 * 2**30)

    def _accum_total_bytes(self, bg, f_eff, t, unit, itemsize, mesh_size=1):
        """Estimated per-device HBM for ONE microbatch's train step:
        kernel I/O (input + its remat copy + dx), the auto-chunked
        sub-band stash (the kernel grows its chunk to 0.6x budget), the
        STFT spectra / cIRM target / magnitude buffers, and the fullband
        stage's backward stash. Calibrated against measured peaks
        (16.4 GB estimated vs 16.21 GB observed at bg=128 x 30 s)."""
        from fullsubnet_tpu.ops.subband_lstm import train_stash_bytes

        n = -(-(bg * f_eff) // 128) * 128
        io = 3 * t * unit * n * itemsize
        sb_stash = train_stash_bytes(
            t, bg * f_eff, self.sb_model.hidden_size,
            self.sb_model.sequence_model.lower(), itemsize,
            stash_budget=self._PALLAS_TRAIN_STASH_BUDGET,
        )
        # noisy/clean complex spectra (2 x c64) + cIRM target (2 x f32)
        # + magnitude/cRM working buffers (~6 B/elem)
        spectra = bg * self.num_freqs * t * 30
        fb_stash = 4 * 2 * bg * self.fb_model.hidden_size * t * itemsize
        fixed = int(0.3 * 2**30)  # params + optimizer state + grads
        return (io + sb_stash + spectra + fb_stash) // mesh_size + fixed

    def recommended_grad_accum(
        self, b, t, itemsize=2, drop_groups=1, mesh=None, extra_bytes=0
    ):
        """Auto-pick the trainer-level gradient-accumulation split G for
        a (batch, frames) training shape — the capacity strategy that
        MAXIMIZES measured audio-s/s (VERDICT r3 #7). Grad accumulation
        dominates both in-step capacity escapes because each microbatch
        runs the plain fused step (no extra no-stash forward, and the
        fullband stage + spectra split too). Measured on v5e, bf16,
        flagship: B=256 x 3.072 s: 1220 audio-s/s (G=2) vs 887
        (time-chunked stash); B=160 x 3.072 s: 1183 (G=2) vs 926;
        B=256 x 30 s: 986 (G=4) vs 852 (row-group remat), and G=8 gives
        945 — so the policy is:

        1. the smallest G whose microbatch (>= 64 rows of batch) runs the
           sub-band stash MONOLITHICALLY within the budget (monolithic
           B=128 measured 1169 vs 887 chunked), else
        2. the smallest G whose estimated total HBM fits the chip
           (bigger microbatches use the MXU better: G=4 > G=8 at 30 s).

        Returns 1 when no split helps (e.g. the shipped B<=128 x 3.072 s
        recipes, which already run monolithic), so auto mode never
        changes behavior where the current path is already optimal.

        ``extra_bytes``: per-device bytes of persistent full-batch
        buffers that live through the whole step but are NOT in
        :meth:`_accum_total_bytes`'s calibration — e.g. the raw mixture
        components under device synthesis (the synthesis runs once over
        the full batch regardless of G, so its buffers shrink the
        headroom available to the train step rather than splitting).
        """
        unit = (2 * self.sb_num_neighbors + 1) + (2 * self.fb_num_neighbors + 1)
        f_eff = (
            self.num_freqs // drop_groups if drop_groups > 1 else self.num_freqs
        )
        mesh_size = mesh.size if mesh is not None else 1
        data_div = mesh.shape.get("data", 1) if mesh is not None else 1
        hidden = self.sb_model.hidden_size
        n_stash = 4 if self.sb_model.sequence_model.lower() == "lstm" else 2
        t8 = -(-t // 8) * 8

        def valid(g):
            bg = b // g
            return (
                b % g == 0
                and (drop_groups <= 1 or bg % drop_groups == 0)
                and bg % max(data_div, 1) == 0
                and (mesh is None or (bg * f_eff) % mesh_size == 0)
            )

        def monolithic(bg):
            n = -(-(bg * f_eff) // 128) * 128
            return (
                t8 * n_stash * n * hidden * itemsize
                <= self._PALLAS_TRAIN_STASH_BUDGET * mesh_size
            )

        cap = self._ACCUM_HBM_CAP - int(extra_bytes)
        splits = [g for g in (1, 2, 4, 8, 16, 32, 64) if g <= b and valid(g)]
        for g in splits:  # rule 1: monolithic microbatch, not too small
            bg = b // g
            if bg >= 64 and monolithic(bg) and self._accum_total_bytes(
                bg, f_eff, t, unit, itemsize, mesh_size
            ) <= cap:
                return g
        for g in splits:  # rule 2: largest microbatch that fits HBM
            if self._accum_total_bytes(
                b // g, f_eff, t, unit, itemsize, mesh_size
            ) <= cap:
                return g
        return splits[-1] if splits else 1

    def _fused_subband_stage(
        self, params, x, fb_output, sharding_hint=None, drop_groups=1,
        training=False, valid_total_frames=None,
    ):
        """Chunk-fused sub-band stage: per time chunk, gather the
        (2N+1)-bin units, concat the fb bin, normalize, and advance the
        sub-band LSTM layers — the full [B, F, 32, T] tensor never exists.

        x: [B, 1, F, T] padded magnitudes; fb_output: [B, 1, F, T].
        With ``drop_groups`` > 1 the training-time drop_band subsampling
        happens inside the fusion (group-strided gathers after the
        full-spectrum normalization statistics, matching the reference's
        norm-then-drop order). Returns [B, 2, F//drop_groups, T].
        """
        b, _, f, t = x.shape
        n_sb, n_fb = self.sb_num_neighbors, self.fb_num_neighbors
        unit = (2 * n_sb + 1) + (2 * n_fb + 1)
        noisy_pad = jnp.pad(
            x[:, 0], ((0, 0), (n_sb, n_sb), (0, 0)), mode="reflect"
        )  # [B, F+2N_sb, T]
        fb_pad = fb_output[:, 0]  # [B, F, T]
        if n_fb > 0:
            fb_pad = jnp.pad(
                fb_pad, ((0, 0), (n_fb, n_fb), (0, 0)), mode="reflect"
            )
        mu = self._sb_norm_mu(
            noisy_pad, fb_pad, f, valid_total_frames
        )  # [B,1,1,1] or [B,F,1,T]
        mu_is_scalar = mu.shape[1] == 1

        # the kernel input materializes AFTER drop_band subsampling, so the
        # element cap is on F' = F / drop_groups, not the full spectrum
        f_eff = f // drop_groups if drop_groups > 1 else f
        if training:
            # the kernel VJP auto-chunks its stash; shapes whose CHUNKED
            # footprint (plus the materialized kernel input and its
            # cotangent) still busts the budget split into row groups
            # (one group live in the backward); only shapes no split
            # admits fall back to the remat'd scan below.
            itemsize = jnp.dtype(x.dtype).itemsize
            row_groups, group_chunk = self._pick_row_groups(
                b, f_eff, t, unit, itemsize, drop_groups,
                getattr(sharding_hint, "mesh", None),
            )
            stash_ok = row_groups > 0
        else:
            stash_ok = True
            row_groups, group_chunk = 1, None
        if (
            self.use_pallas_subband
            and len(params["sb_model"]["rnn"]) == 2
            and (jax.default_backend() != "cpu" or self.pallas_interpret)
            # the kernel input materializes PER ROW GROUP, so the element
            # cap applies to one group's slice, not the full batch
            and (b // max(row_groups, 1)) * f_eff * unit * t
            <= self._PALLAS_SB_MAX_ELEMENTS
            and stash_ok
        ):
            return self._pallas_subband(
                params, noisy_pad, fb_pad, f, mu, mu_is_scalar, sharding_hint,
                interpret=self.pallas_interpret
                and jax.default_backend() == "cpu",
                drop_groups=drop_groups, training=training,
                row_groups=row_groups, time_chunk=group_chunk,
            )

        if drop_groups > 1:
            noisy_pad, fb_pad, mu, f = self._group_selection(
                noisy_pad, fb_pad, mu, mu_is_scalar, drop_groups, f
            )
            # both sources keep their full padded spectra (units read
            # strided bins); mu is already the per-group selection
            mk_idx = lambda n: jnp.asarray(
                np.stack(
                    [
                        (np.arange(f) * drop_groups + g)[:, None]
                        + np.arange(2 * n + 1)[None, :]
                        for g in range(drop_groups)
                    ]
                )
            )  # [G, F', 2N+1]
        else:
            mk_idx = lambda n: jnp.asarray(
                np.arange(f)[:, None] + np.arange(2 * n + 1)[None, :]
            )[None]  # [1, F, 2N+1]
        gather_sb = mk_idx(n_sb)
        gather_fb = mk_idx(n_fb)

        sb = self.sb_model
        hidden = sb.hidden_size
        if training:
            # training memory = chunk-boundary states (T/chunk) + one
            # chunk's per-step states (chunk, via the inner per-step
            # remat) -> balance both at sqrt(T)
            chunk = int(round(t**0.5 / 8.0) * 8)
            chunk = max(8, min(128, chunk))
        else:
            chunk = max(8, 2**25 // (b * f * hidden // 8 + 1))
        chunk = min(chunk, t)
        num_chunks = -(-t // chunk)
        t_pad = num_chunks * chunk

        if t_pad != t:
            pad_t = ((0, 0), (0, 0), (0, t_pad - t))
            noisy_pad = jnp.pad(noisy_pad, pad_t)
            fb_pad = jnp.pad(fb_pad, pad_t)
            if not mu_is_scalar:
                # padded steps' outputs are trimmed; any positive mu works
                mu = jnp.pad(
                    mu,
                    ((0, 0), (0, 0), (0, 0), (0, t_pad - t)),
                    constant_values=1.0,
                )
        layer_params = [layer[0] for layer in params["sb_model"]["rnn"]]
        fc = params["sb_model"].get("fc")
        is_lstm = self.sb_model.sequence_model == "LSTM"

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
            else:
                from fullsubnet_tpu.nn import rnn as _rnn

                hidden_g = p["w_hh"].shape[1]

                def step(h, x_t):
                    x_proj = x_t @ p["w_ih"].T + p["b_ih"]
                    parts = (
                        x_proj[..., : 2 * hidden_g],
                        x_proj[..., 2 * hidden_g :],
                    )
                    return _rnn.gru_step(p, h, parts)

            # per-step remat: the backward keeps only the states per step
            # and recomputes the gate tensor — the same trade the Pallas
            # backward kernel makes
            body = jax.checkpoint(step) if training else step
            return jax.lax.scan(body, carry, h_seq)

        # [num_chunks, B, *, chunk] views
        noisy_cs = noisy_pad.reshape(b, noisy_pad.shape[1], num_chunks, chunk)
        fb_cs = fb_pad.reshape(b, fb_pad.shape[1], num_chunks, chunk)
        noisy_cs = jnp.transpose(noisy_cs, (2, 0, 1, 3))
        fb_cs = jnp.transpose(fb_cs, (2, 0, 1, 3))
        if mu_is_scalar:
            mu_cs = jnp.broadcast_to(
                mu[None, :, 0, 0, 0], (num_chunks, b)
            )  # [C, B]
        else:
            mu_cs = jnp.transpose(
                mu[:, :, 0].reshape(b, f, num_chunks, chunk), (2, 0, 1, 3)
            )  # [C, B, F, chunk]

        @jax.checkpoint
        def chunk_body(states, inputs):
            # rematerialized: training stores only chunk-boundary LSTM
            # states and recomputes in-chunk activations in the backward —
            # this is what lifts the big-batch training HBM ceiling
            noisy_c, fb_c, mu_c = inputs  # [B, F+2Ns, K], [B, F+2Nf, K], mu

            def gather_units(arr_c, gi):
                if gi.shape[0] == 1:
                    return arr_c[:, gi[0], :]  # [B, F', 2N+1, K]
                bp = b // gi.shape[0]
                return jnp.concatenate(
                    [
                        arr_c[g * bp : (g + 1) * bp][:, gi[g], :]
                        for g in range(gi.shape[0])
                    ],
                    axis=0,
                )

            sb_in = jnp.concatenate(
                [gather_units(noisy_c, gather_sb), gather_units(fb_c, gather_fb)],
                axis=2,
            )
            if mu_is_scalar:
                sb_in = sb_in / mu_c[:, None, None, None]
            else:
                sb_in = sb_in / mu_c[:, :, None, :]
            k = sb_in.shape[-1]
            # [B, F, 32, K] -> time-major [K, B·F, 32]
            h_seq = (
                jnp.transpose(sb_in, (3, 0, 1, 2))
                .reshape(k, b * f, -1)
                .astype(x.dtype)
            )
            if sharding_hint is not None:
                # hint expects [B·F, unit, T]; our chunk is time-major
                h_seq = jnp.swapaxes(
                    sharding_hint(jnp.swapaxes(h_seq, 0, 1)), 0, 1
                )
            new_states = []
            for li, p in enumerate(layer_params):
                st, h_seq = layer_scan(p, states[li], h_seq)
                new_states.append(st)
            if fc is not None:
                h_seq = h_seq @ fc["weight"].T + fc["bias"]
            return new_states, h_seq  # [K, B·F, 2]

        h0 = jnp.zeros((b * f, hidden), x.dtype)
        states0 = [((h0, h0) if is_lstm else h0) for _ in layer_params]
        _, ys = jax.lax.scan(chunk_body, states0, (noisy_cs, fb_cs, mu_cs))
        # ys: [num_chunks, chunk, B·F, 2] -> [B, 2, F, T]
        ys = ys.reshape(t_pad, b, f, 2)[:t]
        return jnp.transpose(ys, (1, 3, 2, 0))
