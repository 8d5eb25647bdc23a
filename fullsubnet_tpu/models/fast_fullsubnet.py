"""Fast FullSubNet — mel-domain acceleration of FullSubNet.

Functional twin of the reference
(``recipes/dns_interspeech_2020/fast_fullsubnet/model.py:11-202``):
encoder F_l2m (two stacked sequence models on 64-mel magnitudes), a
sub-band bottleneck S on time-downsampled mel units (shrink_size block
means), and decoder F_m2l emitting the full-resolution 2F cRM. The mel
projection matrix is built natively (HTK scale, matching torchaudio
``MelScale``) and applied as one MXU matmul.

``real_time_downsampling`` keeps frame 0, block-averages the interior, and
averages the (possibly partial) tail block — replicated with static
shapes; ``real_time_upsampling`` is a repeat + trim.
"""

import jax
import jax.numpy as jnp

from fullsubnet_tpu.acoustics.feature import freq_unfold
from fullsubnet_tpu.acoustics.filterbank import mel_filterbank
from fullsubnet_tpu.acoustics.norm import norm_wrapper
from fullsubnet_tpu.nn.sequence_model import SequenceModel


class FastFullSubNet:
    def __init__(
        self,
        look_ahead: int = 2,
        shrink_size: int = 2,
        sequence_model: str = "LSTM",
        num_mels: int = 64,
        encoder_input_size: int = 257,
        bottleneck_hidden_size: int = 384,
        bottleneck_num_layers: int = 2,
        noisy_input_num_neighbors: int = 5,
        encoder_output_num_neighbors: int = 0,
        norm_type: str = "offline_laplace_norm",
        sample_rate: int = 16000,
    ):
        assert sequence_model in ("GRU", "LSTM"), (
            "FastFullSubNet only supports GRU and LSTM."
        )
        self.look_ahead = look_ahead
        self.shrink_size = shrink_size
        self.num_mels = num_mels
        self.num_freqs = encoder_input_size
        self.noisy_input_num_neighbors = noisy_input_num_neighbors
        self.enc_output_num_neighbors = encoder_output_num_neighbors
        self.norm = norm_wrapper(norm_type)

        # F_l2m (encoder): hidden sizes fixed per the reference constructor
        self.encoder = [
            SequenceModel(num_mels, 0, 384, 1, False, sequence_model, None),
            SequenceModel(384, num_mels, 257, 1, False, sequence_model, "ReLU"),
        ]
        # S (bottleneck)
        self.bottleneck = SequenceModel(
            (noisy_input_num_neighbors * 2 + 1)
            + (encoder_output_num_neighbors * 2 + 1),
            1,
            bottleneck_hidden_size,
            bottleneck_num_layers,
            False,
            sequence_model,
            "ReLU",
        )
        # F_m2l (decoder)
        self.decoder_lstm = [
            SequenceModel(num_mels + num_mels, 0, 512, 1, False, sequence_model, None),
            SequenceModel(512, encoder_input_size * 2, 512, 1, False, sequence_model, None),
        ]
        self.mel_fb = jnp.asarray(
            mel_filterbank(encoder_input_size, num_mels, sample_rate, 0.0, sample_rate / 2)
        )

    def init(self, key, dtype=jnp.float32, weight_init=False) -> dict:
        keys = jax.random.split(key, 5)
        oi = weight_init
        return {
            "encoder": [
                self.encoder[0].init(keys[0], dtype, orthogonal_init=oi),
                self.encoder[1].init(keys[1], dtype, orthogonal_init=oi),
            ],
            "bottleneck": self.bottleneck.init(keys[2], dtype, orthogonal_init=oi),
            "decoder_lstm": [
                self.decoder_lstm[0].init(keys[3], dtype, orthogonal_init=oi),
                self.decoder_lstm[1].init(keys[4], dtype, orthogonal_init=oi),
            ],
        }

    def recommended_grad_accum(
        self, b, t, itemsize=2, drop_groups=1, mesh=None, extra_bytes=0
    ):
        """Auto-pick the trainer-level gradient-accumulation split G —
        same contract as ``FullSubNet.recommended_grad_accum``, scoped to
        the measured policy only.

        Measured (v5e, bf16, 3.072 s crops): B=64 G=1 2243 audio-s/s,
        B=128 G=1 2024, B=128 G=2 (microbatch 64) **2702** — the
        microbatch-64 step shape is the fast family's sweet spot (its
        bottleneck runs 8 row tiles of 512; bigger microbatches scale the
        split-dW accumulator traffic), and accumulation amortizes the
        per-step fixed costs. The policy: the smallest G that lands the
        per-device microbatch in the measured [64, 72] window (72 = the
        shipped recipe batch, which stays unsplit). Shapes outside the
        window return 1 — capacity at extreme shapes is still owned by
        the kernel's internal escapes (chunked stash / split-dW), which
        keep any shape trainable.

        The window was measured at 3.072 s crops (~193 mel frames); it
        is applied only for crops up to ~4x that regime (t <= 800
        frames). Longer crops return 1 rather than extrapolate a
        throughput policy that was never measured there — HBM fit for
        this family is owned by the kernel's chunked-stash escape, not
        by G.

        ``drop_groups``/``extra_bytes`` accepted for trainer-interface
        compatibility; the mel-domain family has no drop_band and the
        policy is throughput-only.
        """
        del itemsize, drop_groups, extra_bytes
        if t > 800:
            return 1
        data_div = mesh.shape.get("data", 1) if mesh is not None else 1
        for g in range(1, b + 1):
            if b % g or (b // g) % max(data_div, 1):
                continue
            if 64 <= (b // g) // max(data_div, 1) <= 72:
                return g
        return 1

    # -- time down/up-sampling (reference :108-140) ---------------------

    def real_time_downsampling(self, x: jax.Array) -> jax.Array:
        """[B, C, F, T] -> [B, C, F, ceil((T-1)/shrink)+1] block means."""
        s = self.shrink_size
        t = x.shape[-1]
        first = x[..., 0:1]
        rest = x[..., 1:]
        n_rest = t - 1
        n_full = n_rest // s
        r = n_rest % s
        if r == 0:
            # last full block is averaged separately (mirrors torch.split)
            body = rest[..., : (n_full - 1) * s]
            body = body.reshape(*body.shape[:-1], n_full - 1, s).mean(axis=-1)
            last = rest[..., (n_full - 1) * s :].mean(axis=-1, keepdims=True)
        else:
            body = rest[..., : n_full * s]
            body = body.reshape(*body.shape[:-1], n_full, s).mean(axis=-1)
            last = rest[..., n_full * s :].mean(axis=-1, keepdims=True)
        return jnp.concatenate([first, body, last], axis=-1)

    def real_time_upsampling(self, x: jax.Array, target_len=None) -> jax.Array:
        """Repeat each frame shrink_size times along T, trim to target_len."""
        t = x.shape[-1]
        out = jnp.repeat(x, self.shrink_size, axis=-1)
        if target_len:
            out = out[..., :target_len]
        return out

    # -- bucketed (valid_frames) downsampled-clock norm ------------------

    def _masked_down_norm(self, bn_shrunk, bn_input, vt, s):
        """Masked offline norm for the BOTTLENECK stage of a zero-padded,
        length-bucketed run, exactly reproducing the unpadded run's
        statistics.

        The unpadded run downsamples ``vt`` frames into
        ``T'_u = 1 + n_full + (r > 0)`` blocks (frame 0, full s-blocks,
        and — when ``r = (vt-1) % s > 0`` — a PARTIAL tail block of r
        frames) and computes one offline statistic over all of them. The
        bucketed run's blocks 0..n_full hold identical values (they read
        only valid frames), but its framing never produces the partial
        tail block — so its contribution (sum / sum-of-squares over the
        last r valid frames, averaged) is reconstructed here from
        ``bn_input`` [B, M, unit, T] with a traced frame mask, and the
        statistics divide by the true block count. Blocks past n_full
        are normalized with the same statistics; they only feed the
        causal bottleneck AFTER every needed block, so their (junk)
        values never reach valid outputs.
        """
        from fullsubnet_tpu.acoustics.norm import (
            gaussian_norm_from_stats,
            laplace_norm_from_stats,
            offline_gaussian_norm,
            offline_laplace_norm,
        )

        if self.norm not in (offline_laplace_norm, offline_gaussian_norm):
            return self.norm(bn_shrunk)  # causal norms: exact as-is

        b, m, unit, t_down = bn_shrunk.shape
        t = bn_input.shape[-1]
        n_rest = vt - 1                      # [b]
        n_full = n_rest // s                 # [b]
        r = n_rest % s                       # [b]
        has_tail = (r > 0).astype(jnp.float32)
        t_down_u = 1.0 + n_full.astype(jnp.float32) + has_tail  # [b]

        # blocks 0..n_full match the unpadded run (never read pad frames)
        dmask = (
            jnp.arange(t_down)[None, :] <= n_full[:, None]
        ).astype(jnp.float32)  # [b, T']
        dm = dmask[:, None, None, :]

        # the unpadded run's partial tail block: mean over valid frames
        # [1 + n_full*s, vt) of the FRAME-clock units
        tail_start = 1 + n_full * s
        fmask = (
            (jnp.arange(t)[None, :] >= tail_start[:, None])
            & (jnp.arange(t)[None, :] < vt[:, None])
        ).astype(jnp.float32)  # [b, T]
        r_safe = jnp.maximum(r.astype(jnp.float32), 1.0)
        tail = (
            jnp.sum(bn_input * fmask[:, None, None, :], axis=-1)
            / r_safe[:, None, None]
        )  # [B, M, unit]
        tail = tail * has_tail[:, None, None]

        count = (m * unit) * t_down_u[:, None, None, None]  # [b,1,1,1]
        total = (
            jnp.sum(bn_shrunk * dm, axis=(1, 2, 3), keepdims=True)
            + jnp.sum(tail, axis=(1, 2), keepdims=True)[..., None]
        )
        if self.norm is offline_laplace_norm:
            return laplace_norm_from_stats(bn_shrunk, total, count)
        sumsq = (
            jnp.sum(jnp.square(bn_shrunk) * dm, axis=(1, 2, 3), keepdims=True)
            + jnp.sum(jnp.square(tail), axis=(1, 2), keepdims=True)[..., None]
        )
        return gaussian_norm_from_stats(bn_shrunk, total, sumsq, count)

    # -- forward --------------------------------------------------------

    def __call__(
        self,
        params: dict,
        mix_mag: jax.Array,
        training: bool = False,
        valid_frames: jax.Array | None = None,
    ) -> jax.Array:
        """mix_mag [B, 1, F, T] -> cRM [B, 2, F, T].

        ``valid_frames``: optional (traced) count of real frames in a
        length-bucketed (zero-padded) input — a scalar or a [B] vector.
        Offline norm statistics at BOTH clocks (mel frames and the
        shrink-block downsampled units, incl. the unpadded run's partial
        tail block) use the true counts, so valid outputs EXACTLY equal
        an unpadded run; causal norms are exact under zero tails as-is.
        The caller zeroes padded input frames and discards outputs past
        ``valid_frames``. Same contract as ``FullSubNet.__call__``.
        """
        assert mix_mag.ndim == 4
        x = jnp.pad(mix_mag, ((0, 0), (0, 0), (0, 0), (0, self.look_ahead)))
        batch_size, num_channels, num_freqs, num_frames = x.shape
        assert num_channels == 1, "FastFullSubNet takes a magnitude feature."

        vt = None
        frame_mask = None
        norm = self.norm
        if valid_frames is not None:
            from fullsubnet_tpu.acoustics.norm import masked_offline_norm

            vf = jnp.asarray(valid_frames).reshape(-1)  # [1] or [B]
            # the model's look-ahead zero-pad counts toward the offline
            # statistics, exactly as in an unpadded run
            vt = vf + self.look_ahead
            frame_mask = (
                jnp.arange(num_frames)[None, :] < vt[:, None]
            ).astype(x.dtype)  # [b, T]
            valid_total = vt.astype(jnp.float32)[:, None, None, None]
            norm = masked_offline_norm(self.norm, valid_total) or self.norm

        # Mel projection: [B, C, F, T] -> [B, C, F_mel, T]
        mix_mel = jnp.einsum("bcft,fm->bcmt", x, self.mel_fb)

        # F_l2m
        enc = norm(mix_mel).reshape(batch_size, -1, num_frames)
        enc = self.encoder[0](params["encoder"][0], enc, training=training)
        enc = self.encoder[1](params["encoder"][1], enc, training=training)
        enc_output = enc.reshape(batch_size, num_channels, -1, num_frames)
        if frame_mask is not None:
            # pad-frame encoder outputs (LSTM bias ringing) would leak
            # into the downsampled blocks and the bottleneck's offline
            # statistics; valid outputs only need blocks built from
            # valid frames
            enc_output = enc_output * frame_mask[:, None, None, :]

        # Unfold noisy mel + encoder output into sub-band units
        mix_unfold = freq_unfold(mix_mel, self.noisy_input_num_neighbors).reshape(
            batch_size, self.num_mels, self.noisy_input_num_neighbors * 2 + 1, num_frames
        )
        enc_unfold = freq_unfold(enc_output, self.enc_output_num_neighbors).reshape(
            batch_size, self.num_mels, self.enc_output_num_neighbors * 2 + 1, num_frames
        )

        bn_input = jnp.concatenate([mix_unfold, enc_unfold], axis=2)
        num_sb_unit_freqs = bn_input.shape[2]

        # Bottleneck on time-downsampled units
        bn_shrunk = self.real_time_downsampling(bn_input)
        if vt is not None:
            bn_shrunk = self._masked_down_norm(
                bn_shrunk, bn_input, vt, self.shrink_size
            )
        else:
            bn_shrunk = self.norm(bn_shrunk)
        bn_shrunk = bn_shrunk.reshape(
            batch_size * self.num_mels, num_sb_unit_freqs, -1
        )
        bn_out = self.bottleneck(
            params["bottleneck"], bn_shrunk, training=training
        )  # [B*M, 1, T']
        bn_out = bn_out.reshape(batch_size, self.num_mels, 1, -1)
        bn_out = jnp.transpose(bn_out, (0, 2, 1, 3))  # [B, 1, F_mel, T']
        bn_out = self.real_time_upsampling(bn_out, target_len=num_frames)

        # F_m2l
        dec_input = jnp.concatenate([enc_output, bn_out], axis=2)
        dec_input = dec_input.reshape(batch_size, -1, num_frames)
        dec = self.decoder_lstm[0](params["decoder_lstm"][0], dec_input, training=training)
        dec = self.decoder_lstm[1](params["decoder_lstm"][1], dec, training=training)
        dec_output = dec.reshape(batch_size, 2, num_freqs, num_frames)

        return dec_output[:, :, :, self.look_ahead :]
