"""DNS-2020 datasets: on-the-fly noisy-mixture synthesis, validation pairs,
inference listing.

Host-side NumPy pipeline feeding the device (the reference's
``recipes/dns_interspeech_2020/dataset_{train,validation,inference}.py``).
Per-sample RNG is derived from (seed, epoch, index) so multi-host sharding
is reproducible without shared state — each host synthesizes only its shard.

Synthesis semantics follow ``dataset_train.py:109-224``: random crop of the
clean utterance, noise concatenated with silence gaps, optional
multichannel-RIR reverb via fftconvolve, amplitude+loudness normalization
of both signals, SNR gain, random target loudness, anti-clipping rescale.
"""

from __future__ import annotations

import os
import random
from pathlib import Path

import numpy as np
from scipy import signal

from fullsubnet_tpu.acoustics.feature import (
    is_clipped,
    norm_amplitude,
    subsample,
    tailor_dB_FS,
)
from fullsubnet_tpu.data.wavio import load_wav
from fullsubnet_tpu.utils import basename, expand_path

_AUDIO_EXTS = (".wav", ".flac", ".aif", ".aiff", ".ogg")


def _quantize_int16(x: np.ndarray) -> np.ndarray:
    """Float waveform -> wav-native int16 PCM (round-half-even, clipped).
    Exact inverse of wavio's int16 read (x * 32768) for on-grid values."""
    return np.clip(
        np.round(np.asarray(x, np.float32) * 32768.0), -32768, 32767
    ).astype(np.int16)


def find_audio_files(directory: str | os.PathLike) -> list[str]:
    """Recursively list audio files, sorted (librosa.util.find_files twin)."""
    out = []
    for root, _dirs, files in os.walk(os.fspath(directory)):
        for f in files:
            if f.lower().endswith(_AUDIO_EXTS):
                out.append(os.path.join(root, f))
    return sorted(out)


class BaseDataset:
    @staticmethod
    def _offset_and_limit(dataset_list, offset, limit):
        dataset_list = dataset_list[offset:]
        if limit:
            dataset_list = dataset_list[:limit]
        return dataset_list

    @staticmethod
    def _parse_snr_range(snr_range):
        assert len(snr_range) == 2, (
            f"The range of SNR should be [low, high], not {snr_range}."
        )
        assert snr_range[0] <= snr_range[-1], (
            "The low SNR should not be larger than the high SNR."
        )
        return list(range(snr_range[0], snr_range[-1] + 1))


class TrainDataset(BaseDataset):
    """On-the-fly noisy synthesis from clean/noise/RIR scp lists."""

    def __init__(
        self,
        clean_dataset,
        noise_dataset,
        rir_dataset,
        snr_range=(-5, 20),
        reverb_proportion=0.75,
        silence_length=0.2,
        target_dB_FS=-25,
        target_dB_FS_floating_value=10,
        sub_sample_length=3.072,
        sr=16000,
        clean_dataset_limit=None,
        clean_dataset_offset=0,
        noise_dataset_limit=None,
        noise_dataset_offset=0,
        rir_dataset_limit=None,
        rir_dataset_offset=0,
        pre_load_clean_dataset=False,
        pre_load_noise=False,
        pre_load_rir=False,
        num_workers=0,
        seed=0,
        device_synthesis=False,
        device_synthesis_transfer="f32",
    ):
        self.sr = sr
        self.num_workers = num_workers

        read_list = lambda p: [ln.rstrip("\n") for ln in open(expand_path(p))]
        clean_list = self._offset_and_limit(
            read_list(clean_dataset), clean_dataset_offset, clean_dataset_limit
        )
        noise_list = self._offset_and_limit(
            read_list(noise_dataset), noise_dataset_offset, noise_dataset_limit
        )
        rir_list = self._offset_and_limit(
            read_list(rir_dataset), rir_dataset_offset, rir_dataset_limit
        )

        if pre_load_clean_dataset:
            clean_list = self._preload(clean_list, "Clean Dataset")
        if pre_load_noise:
            noise_list = self._preload(noise_list, "Noise Dataset")
        if pre_load_rir:
            rir_list = self._preload(rir_list, "RIR Dataset")

        self.clean_dataset_list = clean_list
        self.noise_dataset_list = noise_list
        self.rir_dataset_list = rir_list
        self._header_cache: dict = {}  # path -> wav_frames() or None
        self.snr_list = self._parse_snr_range(list(snr_range))

        assert 0 <= reverb_proportion <= 1, (
            "The 'reverb_proportion' should be in [0, 1]."
        )
        self.reverb_proportion = reverb_proportion
        self.silence_length = silence_length
        self.target_dB_FS = target_dB_FS
        self.target_dB_FS_floating_value = target_dB_FS_floating_value
        self.sub_sample_length = sub_sample_length
        self.seed = seed
        self.epoch = 0
        self.length = len(self.clean_dataset_list)

        # device synthesis: __getitem__ returns the raw mixture
        # components (fixed shapes) instead of running snr_mix on the
        # host; the trainer fuses data/device_mixer.py:device_snr_mix
        # into the jitted step. RIRs ride in a [rir_samples] buffer, so
        # the max post-resample RIR length is sized up front from wav
        # headers alone (no sample decode).
        self.device_synthesis = bool(device_synthesis)
        # "int16" ships the waveform components as wav-native PCM (half
        # the host->device bytes; the device mixer upcasts by an exact
        # 1/32768). Bit-identical to "f32" when the sources are 16-bit
        # PCM read at their native rate; resampled or float-format
        # sources quantize to the int16 grid (~1e-5 — inaudible, but
        # keep "f32" where exact host-mixer parity is being certified).
        if device_synthesis_transfer not in ("f32", "int16"):
            raise ValueError(
                "device_synthesis_transfer must be 'f32' or 'int16', got "
                f"{device_synthesis_transfer!r}"
            )
        self.device_synthesis_transfer = device_synthesis_transfer
        self.rir_samples = 1
        if self.device_synthesis and self.rir_dataset_list:
            self.rir_samples = max(
                self._rir_length(entry) for entry in self.rir_dataset_list
            )

    def _rir_length(self, entry) -> int:
        from fullsubnet_tpu.data.wavio import resampled_length, wav_frames

        if not isinstance(entry, (str, os.PathLike)) and len(entry) == 2:
            return int(np.shape(entry[-1])[-1])  # preloaded (path, array)
        frames, file_sr, _ = wav_frames(expand_path(os.fspath(entry)))
        return resampled_length(frames, file_sr, self.sr)

    def set_epoch(self, epoch: int):
        """Changes the per-sample RNG stream so every epoch mixes differently."""
        self.epoch = epoch

    def _preload(self, file_path_list, remark=""):
        from joblib import Parallel, delayed

        n_jobs = max(1, self.num_workers)
        waveforms = Parallel(n_jobs=n_jobs)(
            delayed(load_wav)(p, self.sr) for p in file_path_list
        )
        return list(zip(file_path_list, waveforms))

    def __len__(self):
        return self.length

    def _wav_info(self, entry):
        """Header ``(frames, sr, channels)`` of a path entry, cached
        per path; None for preloaded (name, array) pairs or unparsable
        files (callers fall back to a full decode)."""
        if not isinstance(entry, (str, os.PathLike)):
            return None
        if not hasattr(self, "_header_cache"):
            # dataset pickled by an older build than the worker's module
            self._header_cache = {}
        cached = self._header_cache.get(entry, False)
        if cached is not False:
            return cached
        try:
            from fullsubnet_tpu.data.wavio import wav_frames

            info = wav_frames(expand_path(os.fspath(entry)))
        except Exception:
            info = None
        self._header_cache[entry] = info
        return info

    def _sliceable(self, entry):
        """Frame count when ``entry`` can be read as a partial slice
        (mono wav at the dataset rate — no resample, no channel mix),
        else None."""
        info = self._wav_info(entry)
        if info is not None and info[1] == self.sr and info[2] == 1:
            return info[0]
        return None

    def _select_noise_y(self, target_length: int, rng: np.random.Generator):
        """Assemble ``target_length`` samples of noise: whole files with
        silence gaps, random-cropped. Draw-for-draw identical to the
        naive read-everything loop (the reference's,
        ``dataset_train.py:102-128``), but the assembly is PLANNED from
        wav headers first and only the byte ranges that survive the
        final crop are decoded — the dominant IO saving when noise files
        are much longer than the crop."""
        silence_len_full = int(self.sr * self.silence_length)
        remaining_length = target_length

        # plan: (kind, payload, appended_samples); rng consumption and
        # the loop arithmetic exactly mirror the naive implementation
        # (incl. its len() semantics: a [C, T] preloaded array decrements
        # the remaining length by C but appends C*T flattened samples,
        # as np.append did)
        segments = []
        total = 0
        while remaining_length > 0:
            entry = self.noise_dataset_list[
                int(rng.integers(0, len(self.noise_dataset_list)))
            ]
            frames = self._sliceable(entry)
            if frames is not None:
                segments.append(("slice", entry, frames))
                total += frames
                remaining_length -= frames
            else:
                arr = load_wav(entry, sr=self.sr)
                segments.append(("array", np.ravel(arr), arr.size))
                total += arr.size
                remaining_length -= len(arr)
            if remaining_length > 0:
                silence_len = min(remaining_length, silence_len_full)
                segments.append(("silence", None, silence_len))
                total += silence_len
                remaining_length -= silence_len

        idx_start = 0
        if total > target_length:
            idx_start = int(rng.integers(0, total - target_length))

        # materialize only [idx_start, idx_start + target_length)
        out = np.zeros(min(total, target_length), dtype=np.float32)
        pos = 0  # global sample cursor over the planned assembly
        end = idx_start + len(out)
        for kind, payload, n in segments:
            lo, hi = max(pos, idx_start), min(pos + n, end)
            if hi > lo:
                if kind == "slice":
                    from fullsubnet_tpu.data.wavio import read_wav_slice

                    try:
                        seg = read_wav_slice(
                            expand_path(os.fspath(payload)),
                            lo - pos, hi - lo,
                        )
                    except Exception:  # unmappable format: full decode
                        seg = np.ravel(load_wav(payload, sr=self.sr))[
                            lo - pos : hi - pos
                        ]
                elif kind == "array":
                    seg = payload[lo - pos : hi - pos]
                else:
                    seg = None  # silence: out is already zeros
                if seg is not None:
                    out[lo - idx_start : hi - idx_start] = seg
            pos += n
            if pos >= end:
                break
        return out

    @staticmethod
    def mix_draws(rng, rir, target_dB_FS, target_dB_FS_floating_value):
        """The two RNG draws ``snr_mix`` consumes, in its exact order:
        the RIR channel pick (multichannel RIRs only), then the mixture
        loudness target. Single source of truth so the device-synthesis
        path stays draw-for-draw in sync with the host mixer — any new
        draw must be added HERE, never inline in one of the consumers.
        Returns (mono_rir_or_None, noisy_target_dB_FS)."""
        if rir is not None and rir.ndim > 1:
            rir = rir[int(rng.integers(0, rir.shape[0])), :]
        noisy_target_dB_FS = int(
            rng.integers(
                target_dB_FS - target_dB_FS_floating_value,
                target_dB_FS + target_dB_FS_floating_value,
            )
        )
        return rir, noisy_target_dB_FS

    @staticmethod
    def snr_mix(
        clean_y,
        noise_y,
        snr,
        target_dB_FS,
        target_dB_FS_floating_value,
        rir=None,
        eps=1e-6,
        rng: np.random.Generator | None = None,
    ):
        """Mix clean and noise at an SNR, with optional RIR reverb.

        Reference semantics (``dataset_train.py:136-195``): reverb the clean
        signal (random channel of a multichannel RIR), normalize amplitude +
        loudness of both, apply the SNR gain to the noise, re-target the
        mixture loudness to target±floating dBFS, rescale both if clipped.
        """
        rng = rng or np.random.default_rng()
        rir, noisy_target_dB_FS = TrainDataset.mix_draws(
            rng, rir, target_dB_FS, target_dB_FS_floating_value
        )
        if rir is not None:
            # convolve up front with scipy's pocketfft (SIMD native,
            # GIL-releasing) — measured ~2x our C++ radix-2 engine. scipy
            # is a hard dependency of this module; the C++ engine
            # (native.fft_convolve_trunc) serves thread-pool callers that
            # want the whole mix GIL-free, not this path.
            clean_y = signal.fftconvolve(clean_y, rir)[: len(clean_y)]

        # native C++ fast path for the pointwise mix (GIL-free)
        from fullsubnet_tpu import native

        mixed = native.snr_mix(
            clean_y, noise_y, snr, target_dB_FS, noisy_target_dB_FS,
            rir=None, eps=eps,
        )
        if mixed is not None:
            return mixed

        clean_y, _ = norm_amplitude(clean_y)
        clean_y, _, _ = tailor_dB_FS(clean_y, target_dB_FS)
        clean_rms = (clean_y**2).mean() ** 0.5

        noise_y, _ = norm_amplitude(noise_y)
        noise_y, _, _ = tailor_dB_FS(noise_y, target_dB_FS)
        noise_rms = (noise_y**2).mean() ** 0.5

        snr_scalar = clean_rms / (10 ** (snr / 20)) / (noise_rms + eps)
        noise_y = noise_y * snr_scalar
        noisy_y = clean_y + noise_y

        noisy_y, _, noisy_scalar = tailor_dB_FS(noisy_y, noisy_target_dB_FS)
        clean_y = clean_y * noisy_scalar

        if is_clipped(noisy_y):
            noisy_y_scalar = np.max(np.abs(noisy_y)) / (0.99 - eps)
            noisy_y = noisy_y / noisy_y_scalar
            clean_y = clean_y / noisy_y_scalar

        return noisy_y, clean_y

    def __getitem__(self, item: int):
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, self.epoch, item])
        )
        clean_fpath = self.clean_dataset_list[item]
        crop = int(self.sub_sample_length * self.sr)
        frames = self._sliceable(clean_fpath)
        if frames is not None and frames > crop:
            # header-planned partial read: same crop-start draw as
            # subsample(), but only the cropped frames are decoded
            start = int(rng.integers(0, frames - crop))
            try:
                from fullsubnet_tpu.data.wavio import read_wav_slice

                clean_y = read_wav_slice(
                    expand_path(os.fspath(clean_fpath)), start, crop
                )
            except Exception:  # unmappable format: full decode
                clean_y = load_wav(clean_fpath, sr=self.sr)[
                    start : start + crop
                ]
            return self._getitem_with_clean(clean_y, rng)
        clean_y = load_wav(clean_fpath, sr=self.sr)
        clean_y = subsample(
            clean_y,
            sub_sample_length=int(self.sub_sample_length * self.sr),
            rng=rng,
        )
        return self._getitem_with_clean(clean_y, rng)

    def _getitem_with_clean(self, clean_y, rng):
        """The rest of the item pipeline after the clean crop (shared by
        the partial-read and full-decode clean paths)."""
        noise_y = self._select_noise_y(target_length=len(clean_y), rng=rng)
        assert len(clean_y) == len(noise_y)

        snr = self.snr_list[int(rng.integers(0, len(self.snr_list)))]
        use_reverb = bool(rng.random() < self.reverb_proportion)
        rir = (
            load_wav(
                self.rir_dataset_list[int(rng.integers(0, len(self.rir_dataset_list)))],
                sr=self.sr,
            )
            if use_reverb
            else None
        )

        if self.device_synthesis:
            # consume the SAME RNG stream snr_mix would (shared helper)
            rir, noisy_target_dB_FS = self.mix_draws(
                rng, rir, self.target_dB_FS,
                self.target_dB_FS_floating_value,
            )
            rir_buf = np.zeros(self.rir_samples, dtype=np.float32)
            if rir is not None:
                if len(rir) > self.rir_samples:
                    raise ValueError(
                        f"RIR of {len(rir)} samples exceeds the header-"
                        f"sized buffer ({self.rir_samples}); is the RIR "
                        "list stable since dataset construction?"
                    )
                rir_buf[: len(rir)] = rir
            # getattr: loader workers re-import this module fresh, so a
            # dataset pickled by an older build must not crash mid-epoch
            if getattr(self, "device_synthesis_transfer", "f32") == "int16":
                # wav-native PCM: half the transfer bytes; the device
                # mixer upcasts by 1/32768 (exact). The mixer is per-row
                # scale-invariant, so only the int16 GRID matters — and
                # 16-bit sources land on it exactly.
                q = _quantize_int16
                clean_y, noise_y, rir_buf = q(clean_y), q(noise_y), q(rir_buf)
            else:
                clean_y = clean_y.astype(np.float32)
                noise_y = noise_y.astype(np.float32)
            return (
                clean_y,
                noise_y,
                rir_buf,
                np.float32(rir is not None),
                np.float32(snr),
                np.float32(noisy_target_dB_FS),
            )

        noisy_y, clean_y = self.snr_mix(
            clean_y=clean_y,
            noise_y=noise_y,
            snr=snr,
            target_dB_FS=self.target_dB_FS,
            target_dB_FS_floating_value=self.target_dB_FS_floating_value,
            rir=rir,
            rng=rng,
        )
        return noisy_y.astype(np.float32), clean_y.astype(np.float32)


class ValidationDataset(BaseDataset):
    """DNS test_set/synthetic pairs; returns (noisy, clean, name, speech_type).

    Clean paths are derived from the noisy fileid like the reference
    (``dataset_validation.py:42-93``), including dns_2 layouts.
    """

    def __init__(self, dataset_dir_list, sr=16000):
        self.noisy_files_list = []
        for dataset_dir in dataset_dir_list:
            d = Path(dataset_dir).expanduser().absolute()
            self.noisy_files_list += find_audio_files(d / "noisy")
        self.length = len(self.noisy_files_list)
        self.sr = sr

    def __len__(self):
        return self.length

    _SPEECH_TYPES = {
        "with_reverb": "With_reverb",
        "no_reverb": "No_reverb",
        "dns_2_non_english": "Non_english",
        "dns_2_emotion": "Emotion",
        "dns_2_singing": "Singing",
    }

    def speech_type_of(self, item: int) -> str:
        """Speech type of item ``item`` from its path alone (no audio IO) —
        lets a sharded validation pass enumerate the full type set without
        every host touching every file."""
        parent_dir = Path(self.noisy_files_list[item]).parents[1].name
        try:
            return self._SPEECH_TYPES[parent_dir]
        except KeyError:
            raise NotImplementedError(f"Not supported dir: {parent_dir}") from None

    def __getitem__(self, item: int):
        noisy_file_path = self.noisy_files_list[item]
        parent_dir = Path(noisy_file_path).parents[1].name
        noisy_filename, _ = basename(noisy_file_path)
        reverb_remark = ""
        speech_type = self.speech_type_of(item)

        file_id = noisy_filename.split("_")[-1]
        if parent_dir in ("dns_2_emotion", "dns_2_singing"):
            clean_filename = f"synthetic_{speech_type.lower()}_clean_fileid_{file_id}"
        elif parent_dir == "dns_2_non_english":
            clean_filename = f"synthetic_clean_fileid_{file_id}"
        else:
            if parent_dir == "with_reverb":
                reverb_remark = "with_reverb"
            clean_filename = f"clean_fileid_{file_id}"

        clean_file_path = noisy_file_path.replace(
            f"noisy/{noisy_filename}", f"clean/{clean_filename}"
        )

        noisy = load_wav(expand_path(noisy_file_path), sr=self.sr)
        clean = load_wav(expand_path(clean_file_path), sr=self.sr)
        return noisy, clean, reverb_remark + noisy_filename, speech_type


class InferenceDataset(BaseDataset):
    """Noisy-only recursive listing; returns (waveform, basename)."""

    def __init__(self, dataset_dir_list, sr=16000):
        assert isinstance(dataset_dir_list, list)
        self.sr = sr
        self.noisy_file_path_list = []
        for dataset_dir in dataset_dir_list:
            d = Path(dataset_dir).expanduser().absolute()
            self.noisy_file_path_list += find_audio_files(d)
        self.length = len(self.noisy_file_path_list)

    def __len__(self):
        return self.length

    def __getitem__(self, item: int):
        noisy_file_path = self.noisy_file_path_list[item]
        noisy_y = load_wav(noisy_file_path, sr=self.sr).astype(np.float32)
        return noisy_y, basename(noisy_file_path)[0]
