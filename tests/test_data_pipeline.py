"""Datasets, loader sharding, and synthesis pipeline tests."""

import numpy as np
import pytest

from fullsubnet_tpu.data.datasets import (
    InferenceDataset,
    TrainDataset,
    ValidationDataset,
    find_audio_files,
)
from fullsubnet_tpu.data.loader import DataLoader
from fullsubnet_tpu.data.wavio import write_wav


@pytest.fixture
def dns_layout(tmp_path):
    """Create a miniature DNS-style dataset with scp lists."""
    sr = 16000
    rng = np.random.default_rng(0)

    clean_dir = tmp_path / "clean"
    noise_dir = tmp_path / "noise"
    rir_dir = tmp_path / "rir"
    for d in (clean_dir, noise_dir, rir_dir):
        d.mkdir()

    clean_paths, noise_paths, rir_paths = [], [], []
    t = np.arange(sr) / sr
    for i in range(6):
        p = clean_dir / f"clean_{i}.wav"
        write_wav(p, (0.5 * np.sin(2 * np.pi * (200 + 50 * i) * t)).astype(np.float32), sr)
        clean_paths.append(str(p))
    for i in range(3):
        p = noise_dir / f"noise_{i}.wav"
        write_wav(p, (0.1 * rng.standard_normal(sr // 2)).astype(np.float32), sr)
        noise_paths.append(str(p))
    rir = np.zeros(800, dtype=np.float32)
    rir[0] = 1.0
    rir[200] = 0.4
    p = rir_dir / "rir_0.wav"
    write_wav(p, rir, sr)
    rir_paths.append(str(p))

    scp = {}
    for name, paths in [("clean", clean_paths), ("noise", noise_paths), ("rir", rir_paths)]:
        f = tmp_path / f"{name}.txt"
        f.write_text("\n".join(paths) + "\n")
        scp[name] = str(f)

    # validation layout: synthetic/{no_reverb,with_reverb}/{noisy,clean}
    for cond in ("no_reverb", "with_reverb"):
        noisy_d = tmp_path / "test_set" / "synthetic" / cond / "noisy"
        clean_d = tmp_path / "test_set" / "synthetic" / cond / "clean"
        noisy_d.mkdir(parents=True)
        clean_d.mkdir(parents=True)
        for fid in (0, 1):
            write_wav(
                noisy_d / f"clnsp1_noise_snr10_tl-25_fileid_{fid}.wav",
                (0.3 * rng.standard_normal(sr)).astype(np.float32),
                sr,
            )
            write_wav(
                clean_d / f"clean_fileid_{fid}.wav",
                (0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32),
                sr,
            )
    return tmp_path, scp, sr


def test_train_dataset_synthesis(dns_layout):
    tmp_path, scp, sr = dns_layout
    ds = TrainDataset(
        clean_dataset=scp["clean"],
        noise_dataset=scp["noise"],
        rir_dataset=scp["rir"],
        snr_range=(-5, 20),
        reverb_proportion=0.5,
        silence_length=0.2,
        target_dB_FS=-25,
        target_dB_FS_floating_value=10,
        sub_sample_length=0.5,
        sr=sr,
    )
    assert len(ds) == 6
    noisy, clean = ds[0]
    assert noisy.shape == clean.shape == (int(0.5 * sr),)
    assert noisy.dtype == clean.dtype == np.float32
    assert not np.any(np.abs(noisy) > 1.0)
    # determinism per (seed, epoch, idx)
    noisy2, clean2 = ds[0]
    np.testing.assert_array_equal(noisy, noisy2)
    ds.set_epoch(1)
    noisy3, _ = ds[0]
    assert not np.array_equal(noisy, noisy3)


def test_train_dataset_snr_controls_noise_level(dns_layout):
    tmp_path, scp, sr = dns_layout
    common = dict(
        clean_dataset=scp["clean"], noise_dataset=scp["noise"],
        rir_dataset=scp["rir"], reverb_proportion=0.0, silence_length=0.2,
        target_dB_FS=-25, target_dB_FS_floating_value=1,
        sub_sample_length=0.5, sr=sr,
    )
    ds_clean = TrainDataset(snr_range=(30, 30), **common)
    ds_noisy = TrainDataset(snr_range=(-5, -5), **common)
    err_hi_snr = 0.0
    err_lo_snr = 0.0
    for i in range(4):
        n, c = ds_clean[i]
        err_hi_snr += np.mean((n - c) ** 2) / np.mean(c**2)
        n, c = ds_noisy[i]
        err_lo_snr += np.mean((n - c) ** 2) / np.mean(c**2)
    assert err_hi_snr < err_lo_snr


def test_validation_dataset(dns_layout):
    tmp_path, scp, sr = dns_layout
    ds = ValidationDataset(
        [
            str(tmp_path / "test_set" / "synthetic" / "with_reverb"),
            str(tmp_path / "test_set" / "synthetic" / "no_reverb"),
        ],
        sr=sr,
    )
    assert len(ds) == 4
    types = set()
    for i in range(len(ds)):
        noisy, clean, name, speech_type = ds[i]
        assert noisy.shape == clean.shape
        types.add(speech_type)
    assert types == {"With_reverb", "No_reverb"}


def test_inference_dataset(dns_layout):
    tmp_path, scp, sr = dns_layout
    ds = InferenceDataset(
        [str(tmp_path / "test_set" / "synthetic" / "no_reverb" / "noisy")], sr=sr
    )
    assert len(ds) == 2
    wav, name = ds[0]
    assert wav.ndim == 1 and isinstance(name, str)


def test_find_audio_files_sorted(tmp_path):
    for n in ("b.wav", "a.wav", "c.txt"):
        (tmp_path / n).write_bytes(b"")
    out = find_audio_files(tmp_path)
    assert [p.split("/")[-1] for p in out] == ["a.wav", "b.wav"]


class _RangeDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return np.full((4,), i, dtype=np.float32), np.float32(i)


def test_loader_basic():
    dl = DataLoader(_RangeDataset(10), batch_size=3, drop_last=True)
    batches = list(dl)
    assert len(batches) == 3 == len(dl)
    x, y = batches[0]
    assert x.shape == (3, 4) and y.shape == (3,)


def test_loader_sharding_is_partition():
    ds = _RangeDataset(8)
    seen = []
    for shard in range(2):
        dl = DataLoader(
            ds, batch_size=2, shuffle=True, seed=7, shard_index=shard, num_shards=2
        )
        for x, y in dl:
            seen.extend(y.tolist())
    assert sorted(int(v) for v in seen) == list(range(8))


def test_loader_shuffle_depends_on_epoch():
    ds = _RangeDataset(16)
    dl = DataLoader(ds, batch_size=16, shuffle=True, seed=0)
    dl.set_epoch(0)
    (x0, _), = list(dl)
    dl.set_epoch(1)
    (x1, _), = list(dl)
    assert not np.array_equal(x0, x1)
    dl.set_epoch(0)
    (x0b, _), = list(dl)
    np.testing.assert_array_equal(x0, x0b)


def test_loader_parallel_matches_serial(dns_layout):
    tmp_path, scp, sr = dns_layout
    ds = TrainDataset(
        clean_dataset=scp["clean"], noise_dataset=scp["noise"],
        rir_dataset=scp["rir"], snr_range=(0, 10), reverb_proportion=0.5,
        silence_length=0.2, target_dB_FS=-25, target_dB_FS_floating_value=10,
        sub_sample_length=0.25, sr=sr,
    )
    serial = list(DataLoader(ds, batch_size=2, drop_last=True))
    parallel = list(DataLoader(ds, batch_size=2, drop_last=True, num_workers=2))
    assert len(serial) == len(parallel) == 3
    for (sn, sc), (pn, pc) in zip(serial, parallel):
        np.testing.assert_array_equal(sn, pn)
        np.testing.assert_array_equal(sc, pc)


def test_preload_options_match_lazy_loading(dns_layout):
    """pre_load_* stores (path, waveform) pairs that load_wav unwraps
    (reference feature.py:117 quirk) — preloaded synthesis must be
    byte-identical to lazy file reads."""
    tmp_path, scp, sr = dns_layout
    kwargs = dict(
        clean_dataset=scp["clean"], noise_dataset=scp["noise"],
        rir_dataset=scp["rir"], snr_range=(0, 10), reverb_proportion=1.0,
        silence_length=0.2, target_dB_FS=-25, target_dB_FS_floating_value=10,
        sub_sample_length=0.25, sr=sr,
    )
    lazy = TrainDataset(**kwargs)
    pre = TrainDataset(
        **kwargs, pre_load_clean_dataset=True, pre_load_noise=True,
        pre_load_rir=True,
    )
    for i in range(len(lazy)):
        ln, lc = lazy[i]
        pn, pc = pre[i]
        np.testing.assert_array_equal(ln, pn)
        np.testing.assert_array_equal(lc, pc)


def test_loader_abandoned_iteration_releases_pool(dns_layout):
    """Breaking out of a parallel epoch must not deadlock or leak the
    worker pool: the loader can be re-iterated immediately."""
    import time

    tmp_path, scp, sr = dns_layout
    ds = TrainDataset(
        clean_dataset=scp["clean"], noise_dataset=scp["noise"],
        rir_dataset=scp["rir"], snr_range=(0, 10), reverb_proportion=0.5,
        silence_length=0.2, target_dB_FS=-25, target_dB_FS_floating_value=10,
        sub_sample_length=0.25, sr=sr,
    )
    dl = DataLoader(ds, batch_size=1, num_workers=2, prefetch_batches=1)
    t0 = time.monotonic()
    for i, _ in enumerate(dl):
        if i == 0:
            break  # abandon mid-epoch
    # full epoch afterwards still works and terminates
    n = sum(1 for _ in dl)
    assert n == len(dl)
    assert time.monotonic() - t0 < 120


def test_collate_keeps_strings():
    from fullsubnet_tpu.data.loader import default_collate

    out = default_collate([("a.wav", 1.0), ("b.wav", 2.0)])
    assert out[0] == ["a.wav", "b.wav"]
    assert all(isinstance(s, str) for s in out[0])
    np.testing.assert_array_equal(out[1], np.asarray([1.0, 2.0]))


def test_partial_reads_bit_identical_to_full_decode(dns_layout, tmp_path):
    """The header-planned partial-read fast path (clean crop slice +
    noise-assembly range reads) must be draw-for-draw AND bit-for-bit
    identical to the naive decode-everything path, across epochs, for
    both host-mix and device-synthesis items — incl. a non-native-rate
    noise file that forces the per-entry resample fallback mid-plan."""
    tmp, scp, sr = dns_layout

    # add an 8 kHz noise file: not sliceable (resampled), exercises the
    # mixed fast/fallback plan without disturbing the draw stream
    rng = np.random.default_rng(3)
    p8 = tmp / "noise" / "noise_8k.wav"
    write_wav(p8, (0.1 * rng.standard_normal(4000)).astype(np.float32), 8000)
    noise_scp = tmp / "noise_mixed.txt"
    noise_scp.write_text(
        open(scp["noise"]).read().rstrip("\n") + "\n" + str(p8) + "\n"
    )

    common = dict(
        clean_dataset=scp["clean"], noise_dataset=str(noise_scp),
        rir_dataset=scp["rir"], snr_range=(-5, 20), reverb_proportion=0.6,
        silence_length=0.08, target_dB_FS=-25,
        target_dB_FS_floating_value=10, sub_sample_length=0.35, sr=sr,
        seed=11,
    )
    for dev in (False, True):
        fast = TrainDataset(device_synthesis=dev, **common)
        naive = TrainDataset(device_synthesis=dev, **common)
        naive._sliceable = lambda entry: None  # force full decodes
        for epoch in (0, 2):
            fast.set_epoch(epoch)
            naive.set_epoch(epoch)
            for item in range(len(fast)):
                a, b = fast[item], naive[item]
                if dev:
                    for x, y in zip(a, b):
                        np.testing.assert_array_equal(
                            np.asarray(x), np.asarray(y)
                        )
                else:
                    np.testing.assert_array_equal(a[0], b[0])
                    np.testing.assert_array_equal(a[1], b[1])
