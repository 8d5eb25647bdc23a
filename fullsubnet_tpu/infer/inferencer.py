"""Inference runtime: config-driven enhancement strategies.

Twin of the reference inferencer stack
(``audio_zen/inferencer/base_inferencer.py`` +
``recipes/dns_interspeech_2020/inferencer.py``) with the same six
strategies — ``mag``, ``scaled_mask``, ``sub_band_crm_mask``,
``full_band_crm_mask`` (the one all shipped configs use),
``overlapped_chunk``, ``time_domain`` — dispatched by
``config["inferencer"]["type"]``.

TPU design: each strategy's compute path (STFT → model → decompress →
mask-mul → iSTFT) is one jitted program per input length; compiled
programs are cached per shape. Wav I/O and int16 peak normalization stay
on host.

Conscious fixes vs the reference (documented quirks): the reference's
``mag``/``scaled_mask`` strategies treat the 4-tuple ``stft`` return as a
complex tensor and crash if called (``inferencer.py:60-61,74``; only
``full_band_crm_mask`` is exercised by shipped configs). Here they are
implemented correctly.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from fullsubnet_tpu import config as config_lib
from fullsubnet_tpu.acoustics.mask import decompress_cIRM
from fullsubnet_tpu.acoustics.stft import istft, stft_complex
from fullsubnet_tpu.checkpoint import CONVERTERS, load_torch_state_dict
from fullsubnet_tpu.data.wavio import write_wav
from fullsubnet_tpu.infer.host import pad_bucket_batch  # noqa: F401  (re-exported)
from fullsubnet_tpu.utils import prepare_empty_dir


def _model_key_from_path(path: str) -> str:
    # longest match wins: 'fullsubnet' is a substring of
    # 'fast_fullsubnet' and 'improved_fullsubnet'
    matches = [key for key in CONVERTERS if key in path]
    return max(matches, key=len) if matches else "fullsubnet"


def model_call_kwargs(model, sharding_hint=None) -> dict:
    """Inference-shaped extra kwargs for ``model(params, mag, ...)``,
    derived from the model's actual signature — the ONE source of truth
    for 'which kwargs does this family's ``__call__`` take' (shared by
    the Inferencer, the trainer's enhance paths, and the bucketed/
    serving builders). Models with ``dropping_band`` must never drop at
    inference; ``sharding_hint`` is forwarded when supported and an
    error to request otherwise."""
    import inspect

    sig = inspect.signature(model.__call__).parameters
    kwargs = {}
    if "dropping_band" in sig:
        kwargs["dropping_band"] = False
    if "sharding_hint" in sig:
        if sharding_hint is not None:
            kwargs["sharding_hint"] = sharding_hint
    elif sharding_hint is not None:
        raise ValueError(
            f"{type(model).__name__} does not support sharding_hint"
        )
    return kwargs


def bucketed_capable(model, strategy: str) -> bool:
    """Length-bucketed enhancement is EXACT only for models implementing
    ``valid_frames`` (FullSubNet, the fullband baseline, Fast FullSubNet)
    under ``full_band_crm_mask`` with unidirectional stacks: offline
    norms get masked statistics over the true frame count (Fast
    FullSubNet additionally reconstructs the downsampled clock's partial
    tail block), causal norms ignore zero-padded tails by construction
    (same gate as the trainer's bucketed validation,
    ``train/trainer.py:_bucketing_supported``)."""
    from fullsubnet_tpu.models import (
        FastFullSubNet,
        FullBandModel,
        FullSubNet,
    )

    if strategy != "full_band_crm_mask":
        return False
    if isinstance(model, FullSubNet):
        return (
            not model.fb_model.bidirectional
            and not model.sb_model.bidirectional
        )
    if isinstance(model, FullBandModel):
        return not model.fullband_model.bidirectional
    if isinstance(model, FastFullSubNet):
        return True  # every stack in this family is unidirectional
    return False


def time_domain_bucketed_capable(model) -> bool:
    """Wave-to-wave models implementing ``valid_samples`` (Improved
    FullSubNet) bucket the ``time_domain`` strategy: the model re-creates
    the tail reflection and masks its norms/iSTFT at the true length, so
    one compile per bucket is exact for any length in it. Every
    dispatchable norm is covered (offline norms via masked statistics,
    causal norms exact under zero tails); the stacks are always
    unidirectional in this family."""
    import inspect

    return "valid_samples" in inspect.signature(model.__call__).parameters


def build_bucketed_enhance_fn(model, acoustics: dict, sharding_hint=None):
    """(params, wave[B, bucket], true_len) -> enhanced[B, bucket]; each
    example's first ``true_len[b]`` samples equal its unpadded run
    exactly. ``true_len`` is a traced scalar (B=1, one shared length) or
    a [B] int32 vector (batched bucketed inference: many utterances of
    different lengths padded into ONE device call). One compile serves
    every utterance length in the bucket — on a remote-compile relay each
    new exact length would otherwise cost a minutes-long compile. Shared
    by the Inferencer, the AOT serving export
    (``fullsubnet_tpu/serving.py``), and the multi-chip enhancer
    (``parallel/inference.py``, which passes ``sharding_hint`` to spread
    the sub-band rows over the mesh)."""
    from fullsubnet_tpu.acoustics.stft import (
        insert_tail_reflection,
        traced_num_frames,
    )

    n_fft = acoustics["n_fft"]
    hop = acoustics["hop_length"]
    win = acoustics["win_length"]

    extra_kwargs = model_call_kwargs(model, sharding_hint)

    def fn(params, noisy, true_len):
        tl = jnp.asarray(true_len).reshape(-1)  # [1] or [B]
        tlb = jnp.broadcast_to(tl, (noisy.shape[0],))
        reflected = jax.vmap(
            lambda y, L: insert_tail_reflection(y, L, n_fft)
        )(noisy, tlb)
        spec = stft_complex(reflected, n_fft, hop, win)
        t_pad = spec.shape[-1]
        frames_real = traced_num_frames(tl, hop, n_fft)  # [1] or [B]
        tmask = (
            jnp.arange(t_pad)[None, :] < frames_real[:, None]
        ).astype(jnp.float32)  # [b, T']
        noisy_mag = jnp.abs(spec)[:, None] * tmask[:, None, None, :]
        crm = model(
            params, noisy_mag, valid_frames=frames_real, **extra_kwargs
        )
        crm = jnp.transpose(crm, (0, 2, 3, 1))
        crm = decompress_cIRM(crm)
        m3 = tmask[:, None, :]
        er = (crm[..., 0] * spec.real - crm[..., 1] * spec.imag) * m3
        ei = (crm[..., 1] * spec.real + crm[..., 0] * spec.imag) * m3
        fm = tmask if tmask.shape[0] > 1 else tmask[0]
        return istft(
            (er, ei), n_fft, hop, win,
            length=noisy.shape[-1], input_type="real_imag", frame_mask=fm,
        )

    return fn


class Inferencer:
    def __init__(
        self, config: dict, checkpoint_path: str, output_dir: str | None
    ):
        self.config = config
        self.acoustics = config_lib.acoustics_args(config)
        self.inference_config = config.get("inferencer", {})
        self.strategy = self.inference_config.get("type", "full_band_crm_mask")
        self.inference_args = self.inference_config.get("args", {}) or {}
        self.sr = self.acoustics["sr"]

        # dataset (optional: serving/export builds only the compute path)
        ds_section = config.get("dataset", config.get("inference_dataset"))
        self.dataset = (
            config_lib.build_dataset(ds_section, "inference")
            if ds_section is not None
            else None
        )

        # model + params
        self.model, _ = config_lib.build_model(config)
        self.params = self._load_params(checkpoint_path)

        # output dirs (optional, as above)
        if output_dir is not None:
            self.output_dir = Path(output_dir).expanduser().absolute()
            self.enhanced_dir = self.output_dir / "enhanced"
            self.noisy_dir = self.output_dir / "noisy"
            prepare_empty_dir([self.enhanced_dir, self.noisy_dir])
        else:
            self.output_dir = self.enhanced_dir = self.noisy_dir = None

        self._jitted = {}
        # inference never subsamples frequencies, even for batched inputs
        self._model_kwargs = model_call_kwargs(self.model)

    # ------------------------------------------------------------------
    # checkpoint loading: torch (.tar/.pth) or orbax dir
    # ------------------------------------------------------------------

    def _load_params(self, checkpoint_path: str):
        path = Path(checkpoint_path).expanduser()
        model_path = self.config["model"].get("path", "fullsubnet")
        key = _model_key_from_path(model_path)
        if path.is_dir():  # orbax
            from fullsubnet_tpu.checkpoint import CheckpointManager

            # recover=False: a read-only consumer must never sweep a LIVE
            # trainer's in-flight tmp dirs in the directory it reads from
            mgr = CheckpointManager(path.parent, recover=False)
            state = mgr.restore(path.name)
            return state["params"] if "params" in state else state
        state = load_torch_state_dict(path)
        conv = CONVERTERS[key]
        if key == "improved_fullsubnet":
            n_sections = len(self.model.sb_model.sb_models)
            return conv(state, n_sections)
        return conv(state)

    # ------------------------------------------------------------------
    # jitted strategy kernels (cached per input length)
    # ------------------------------------------------------------------

    def _jit_for(self, name: str):
        if name not in self._jitted:
            fn = getattr(self, f"_{name}_fn")
            self._jitted[name] = jax.jit(fn)
        return self._jitted[name]

    def _stft(self, y):
        a = self.acoustics
        return stft_complex(y, a["n_fft"], a["hop_length"], a["win_length"])

    def _istft(self, features, length, input_type="complex"):
        a = self.acoustics
        return istft(
            features,
            a["n_fft"],
            a["hop_length"],
            a["win_length"],
            length=length,
            input_type=input_type,
        )

    def _full_band_crm_mask_fn(self, params, noisy):
        """noisy [1, T] -> enhanced [1, T] (reference :130-145)."""
        spec = self._stft(noisy)
        noisy_real, noisy_imag = spec.real, spec.imag
        noisy_mag = jnp.abs(spec)[:, None]  # [B, 1, F, T]
        pred_crm = self.model(params, noisy_mag, **self._model_kwargs)  # [B, 2, F, T]
        pred_crm = jnp.transpose(pred_crm, (0, 2, 3, 1))  # [B, F, T, 2]
        pred_crm = decompress_cIRM(pred_crm)
        enhanced_real = pred_crm[..., 0] * noisy_real - pred_crm[..., 1] * noisy_imag
        enhanced_imag = pred_crm[..., 1] * noisy_real + pred_crm[..., 0] * noisy_imag
        return self._istft(
            (enhanced_real, enhanced_imag), noisy.shape[-1], input_type="real_imag"
        )

    def _mag_fn(self, params, noisy):
        """Magnitude-mask strategy with the noisy phase."""
        spec = self._stft(noisy)
        noisy_mag, noisy_phase = jnp.abs(spec), jnp.angle(spec)
        enhanced_mag = self.model(params, noisy_mag[:, None], **self._model_kwargs)[:, 0]
        return self._istft(
            (enhanced_mag, noisy_phase), noisy.shape[-1], input_type="mag_phase"
        )

    def _scaled_mask_fn(self, params, noisy):
        spec = self._stft(noisy)
        noisy_mag = jnp.abs(spec)[:, None]
        mask = self.model(params, noisy_mag, **self._model_kwargs)  # [B, 2, F, T]
        mask = jnp.transpose(mask, (0, 2, 3, 1))
        enhanced = spec * jax.lax.complex(mask[..., 0], mask[..., 1])
        return self._istft(enhanced, noisy.shape[-1])

    def _sub_band_crm_mask_fn(self, params, noisy):
        """Per-frequency sub-band batch strategy (reference :88-128): the
        model consumes [F, F_s, T] sub-band units directly."""
        from fullsubnet_tpu.acoustics.feature import freq_unfold

        n_neighbors = self.inference_args.get("n_neighbor", 15)
        # the reference honors inference_args["pad_mode"] for the unfold
        # (base_inferencer.py:99); torch 'constant' == jnp 'constant'
        pad_mode = self.inference_args.get("pad_mode", "reflect")
        spec = self._stft(noisy)
        noisy_real, noisy_imag = spec.real[0], spec.imag[0]
        noisy_mag = jnp.sqrt(jnp.square(noisy_real) + jnp.square(noisy_imag))
        units = freq_unfold(
            noisy_mag[None, None], n_neighbors, mode=pad_mode
        )  # [1, F, 1, F_s, T]
        units = units[0, :, 0]  # [F, F_s, T]
        pred_crm = self.model(params, units)  # [F, 2, T]
        pred_crm = jnp.transpose(pred_crm, (0, 2, 1))  # [F, T, 2]
        pred_crm = decompress_cIRM(pred_crm, limit=9.99)
        enhanced_real = pred_crm[..., 0] * noisy_real - pred_crm[..., 1] * noisy_imag
        enhanced_imag = pred_crm[..., 1] * noisy_real + pred_crm[..., 0] * noisy_imag
        return self._istft(
            (enhanced_real[None], enhanced_imag[None]),
            noisy.shape[-1],
            input_type="real_imag",
        )

    def _time_domain_fn(self, params, noisy):
        return self.model(params, noisy)

    # ------------------------------------------------------------------
    # strategies (host-visible entry points)
    # ------------------------------------------------------------------

    def mag(self, noisy, inference_args=None):
        return np.asarray(self._jit_for("mag")(self.params, noisy))[0]

    def scaled_mask(self, noisy, inference_args=None):
        return np.asarray(self._jit_for("scaled_mask")(self.params, noisy))[0]

    def sub_band_crm_mask(self, noisy, inference_args=None):
        return np.asarray(self._jit_for("sub_band_crm_mask")(self.params, noisy))[0]

    # utterances are padded up to a multiple of this many seconds (+ one
    # FFT frame of reflection headroom); override with
    # [inferencer] bucket_seconds = 0 to force exact-length compiles
    _BUCKET_SECONDS = 1.0

    @property
    def bucket_seconds(self) -> float:
        return float(
            self.inference_config.get("bucket_seconds", self._BUCKET_SECONDS)
        )

    def full_band_crm_mask(self, noisy, inference_args=None):
        bucket_seconds = self.bucket_seconds
        n_fft = self.acoustics["n_fft"]
        length = int(noisy.shape[-1])
        if (
            bucket_seconds > 0
            and length > n_fft // 2  # tail reflection needs this headroom
            and bucketed_capable(self.model, "full_band_crm_mask")
        ):
            if "bucketed" not in self._jitted:
                self._jitted["bucketed"] = jax.jit(
                    build_bucketed_enhance_fn(self.model, self.acoustics)
                )
            step = int(bucket_seconds * self.sr)
            bucket = -(-(length + n_fft) // step) * step
            padded = jnp.pad(noisy, ((0, 0), (0, bucket - length)))
            out = self._jitted["bucketed"](
                self.params, padded, jnp.asarray(length, jnp.int32)
            )
            return np.asarray(out)[0][:length]
        return np.asarray(self._jit_for("full_band_crm_mask")(self.params, noisy))[0]

    def time_domain(self, noisy, inference_args=None):
        bucket_seconds = self.bucket_seconds
        n_fft = self.acoustics["n_fft"]
        length = int(noisy.shape[-1])
        if (
            bucket_seconds > 0
            and length > n_fft // 2  # tail reflection needs this headroom
            and time_domain_bucketed_capable(self.model)
        ):
            # wave-to-wave models (Improved FullSubNet) take the true
            # sample count as a traced arg: one compile per bucket, exact
            # for any length in it (minutes per distinct length otherwise
            # on a remote-compile relay)
            if "bucketed_td" not in self._jitted:
                model = self.model
                self._jitted["bucketed_td"] = jax.jit(
                    lambda p, w, L: model(p, w, valid_samples=L)
                )
            step = int(bucket_seconds * self.sr)
            bucket = -(-(length + n_fft) // step) * step
            padded = jnp.pad(
                jnp.atleast_2d(jnp.asarray(noisy)),
                ((0, 0), (0, bucket - length)),
            )
            out = self._jitted["bucketed_td"](
                self.params, padded, jnp.asarray(length, jnp.int32)
            )
            return np.squeeze(np.asarray(out), axis=(0, 1))[:length]
        out = np.asarray(self._jit_for("time_domain")(self.params, noisy))
        return np.squeeze(out)

    def overlapped_chunk(self, noisy, inference_args=None):
        """Hann 50%-overlap chunked streaming for time-domain models
        (reference :147-209) with a 256-sample history pad."""
        args = inference_args or self.inference_args
        chunk_length = int(self.sr * args.get("chunk_length", 4))
        hop = chunk_length // 2
        noisy = np.atleast_2d(np.asarray(noisy))  # [C, T]
        num_chunks = int(noisy.shape[-1] / hop) + 1
        win = 0.5 * (1 - np.cos(2 * np.pi * np.arange(chunk_length) / chunk_length))

        fn = self._jit_for("time_domain")
        prev = None
        pieces = []
        for chunk_idx in range(num_chunks):
            start = chunk_idx * hop
            if chunk_idx == 0:
                pad = np.zeros((noisy.shape[0], 256), dtype=noisy.dtype)
            else:
                pad = noisy[:, start - 256 : start]
            chunk = np.concatenate([pad, noisy[:, start : start + chunk_length]], axis=1)
            enhanced_chunk = np.squeeze(np.asarray(fn(self.params, chunk[None])))
            enhanced_chunk = enhanced_chunk[256:]
            if chunk_idx == 0:
                pieces.append(enhanced_chunk[:hop])
                # utterances shorter than chunk_length yield a short tail
                # (the reference crashes here — conscious fix, see
                # docs/parity.md)
                tail = enhanced_chunk[hop:]
                prev = tail * win[hop : hop + len(tail)]
            else:
                enhanced_chunk = enhanced_chunk * win[: len(enhanced_chunk)]
                cur = enhanced_chunk[:hop]
                n = min(len(cur), len(prev))
                pieces.append(cur[:n] + prev[:n])
                prev = enhanced_chunk[hop:]
        enhanced = np.concatenate(pieces)
        return enhanced[: noisy.shape[-1]]

    # ------------------------------------------------------------------

    def _write_outputs(self, enhanced: np.ndarray, noisy, name: str):
        enhanced = np.asarray(enhanced, dtype=np.float32)
        # UNCONDITIONAL peak normalization to 0.8 FS, exactly the
        # reference's `0.8 * amp * enhanced / max(|enhanced|)`
        # (base_inferencer.py:181-182) — every written file is
        # peak-scaled, not just clipping ones
        peak = np.max(np.abs(enhanced))
        if peak > 0:
            enhanced = enhanced / peak * 0.8
        write_wav(self.enhanced_dir / f"{name}.wav", enhanced, self.sr)
        # reference writes the first channel, trimmed to the
        # enhanced length (base_inferencer.py:189-192)
        noisy_out = np.asarray(noisy, np.float32)
        if noisy_out.ndim > 1:
            noisy_out = noisy_out[0]
        noisy_out = noisy_out[: enhanced.shape[-1]]
        write_wav(self.noisy_dir / f"{name}.wav", noisy_out, self.sr)

    def _call_batched(self, batch_size: int):
        """Batched bucketed enhancement: utterances are grouped by length
        bucket and padded into [batch_size, bucket] device calls with a
        per-example true-length vector (exact under padding). On an
        accelerator this is the throughput path — a single utterance
        leaves the chip almost idle. Covers ``full_band_crm_mask`` and
        the wave-to-wave ``time_domain`` strategy (the model masks its
        norms/iSTFT at each example's true length)."""
        from tqdm import tqdm

        step = int(self.bucket_seconds * self.sr)
        n_fft = self.acoustics["n_fft"]
        if self.strategy == "time_domain":
            if "bucketed_td_batched" not in self._jitted:
                model = self.model
                self._jitted["bucketed_td_batched"] = jax.jit(
                    lambda p, w, L: model(p, w, valid_samples=L)[:, 0]
                )
            fn = self._jitted["bucketed_td_batched"]
        else:
            if "bucketed" not in self._jitted:
                self._jitted["bucketed"] = jax.jit(
                    build_bucketed_enhance_fn(self.model, self.acoustics)
                )
            fn = self._jitted["bucketed"]

        def flush(bucket, items):
            padded, lengths = pad_bucket_batch(
                [y for y, _ in items], batch_size, bucket
            )
            out = np.asarray(
                fn(self.params, jnp.asarray(padded), jnp.asarray(lengths))
            )
            for i, (y, name) in enumerate(items):
                self._write_outputs(out[i, : len(y)], y, name)

        groups: dict[int, list] = {}
        progress = tqdm(range(len(self.dataset)), desc="Inference (batched)")
        for i in progress:
            noisy, name = self.dataset[i]
            noisy = np.asarray(noisy, np.float32)
            if noisy.ndim > 1:
                noisy = noisy[0]
            if len(noisy) <= n_fft // 2:  # degenerate: exact path
                enhanced = np.asarray(
                    self._jit_for(self.strategy)(
                        self.params, jnp.asarray(noisy[None])
                    )
                )[0]
                enhanced = enhanced[0] if enhanced.ndim > 1 else enhanced
                self._write_outputs(enhanced, noisy, name)
                continue
            bucket = -(-(len(noisy) + n_fft) // step) * step
            groups.setdefault(bucket, []).append((noisy, name))
            if len(groups[bucket]) == batch_size:
                flush(bucket, groups.pop(bucket))
        for bucket in sorted(groups):
            flush(bucket, groups[bucket])
        return self.enhanced_dir

    def __call__(self):
        from tqdm import tqdm

        if self.dataset is None or self.enhanced_dir is None:
            raise RuntimeError(
                "Inferencer was built without a dataset/output_dir "
                "(serving mode); batch enhancement needs both"
            )
        strategy = getattr(self, self.strategy, None)
        if strategy is None:
            raise NotImplementedError(
                f"Unknown inference type {self.strategy!r}; choose from "
                "mag, scaled_mask, sub_band_crm_mask, full_band_crm_mask, "
                "overlapped_chunk, time_domain."
            )
        batch_size = int(self.inference_config.get("batch_size", 1))
        if (
            batch_size > 1
            and self.bucket_seconds > 0
            and (
                bucketed_capable(self.model, self.strategy)
                or (
                    self.strategy == "time_domain"
                    and time_domain_bucketed_capable(self.model)
                )
            )
        ):
            return self._call_batched(batch_size)
        for i in tqdm(range(len(self.dataset)), desc="Inference"):
            noisy, name = self.dataset[i]
            enhanced = strategy(jnp.asarray(noisy[None]))
            self._write_outputs(enhanced, noisy, name)
        return self.enhanced_dir
