"""Native C++ DSP core vs NumPy/SciPy references."""

import numpy as np
import pytest
from scipy.signal import fftconvolve

from fullsubnet_tpu import native
from fullsubnet_tpu.acoustics.feature import norm_amplitude, tailor_dB_FS


def test_native_builds():
    assert native.available(), "g++ toolchain present; native core must build"


def test_fft_convolve_matches_scipy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(10000).astype(np.float32)
    h = rng.standard_normal(1234).astype(np.float32)
    ref = fftconvolve(x, h)[: len(x)]
    out = native.fft_convolve_trunc(x, h)
    np.testing.assert_allclose(out, ref, atol=5e-3, rtol=1e-3)


def test_snr_mix_matches_numpy_reference():
    rng = np.random.default_rng(1)
    n = 16000
    clean = (0.5 * np.sin(2 * np.pi * 300 * np.arange(n) / 16000)).astype(np.float32)
    noise = (0.3 * rng.standard_normal(n)).astype(np.float32)
    rir = np.zeros(500, dtype=np.float32)
    rir[0], rir[100] = 1.0, 0.35
    snr, target, noisy_target, eps = 5.0, -25.0, -20.0, 1e-6

    for use_rir in (None, rir):
        got = native.snr_mix(clean, noise, snr, target, noisy_target, rir=use_rir)
        assert got is not None
        noisy_n, clean_n = got

        # NumPy restatement of the same math
        c = clean.copy()
        if use_rir is not None:
            c = fftconvolve(c, use_rir)[: len(c)].astype(np.float32)
        c, _ = norm_amplitude(c, eps=eps)
        c, _, _ = tailor_dB_FS(c, target, eps=eps)
        c_rms = (c**2).mean() ** 0.5
        m = noise.copy()
        m, _ = norm_amplitude(m, eps=eps)
        m, _, _ = tailor_dB_FS(m, target, eps=eps)
        m_rms = (m**2).mean() ** 0.5
        m = m * (c_rms / (10 ** (snr / 20)) / (m_rms + eps))
        ny = c + m
        ny, _, sc = tailor_dB_FS(ny, noisy_target, eps=eps)
        c = c * sc
        if np.any(np.abs(ny) > 0.999):
            rescale = np.max(np.abs(ny)) / (0.99 - eps)
            ny, c = ny / rescale, c / rescale

        np.testing.assert_allclose(noisy_n, ny, atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(clean_n, c, atol=2e-4, rtol=1e-3)


def test_frame_energies():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(4000).astype(np.float32)
    out = native.frame_energies_db(x, window=800)
    assert out.shape == (5,)
    ref = [
        20 * np.log10(np.sum(x[s : s + 800].astype(np.float64) ** 2) + 1e-6)
        for s in range(0, 4000, 800)
    ]
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_dataset_uses_native_and_matches_shapes(tmp_path):
    """TrainDataset mixing through the native path yields valid samples."""
    from fullsubnet_tpu.data.datasets import TrainDataset
    from fullsubnet_tpu.data.wavio import write_wav

    sr = 16000
    t = np.arange(sr) / sr
    for sub in ("clean", "noise", "rir"):
        (tmp_path / sub).mkdir()
    write_wav(tmp_path / "clean" / "c.wav", (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), sr)
    write_wav(tmp_path / "noise" / "n.wav", (0.1 * np.random.default_rng(0).standard_normal(sr)).astype(np.float32), sr)
    rir = np.zeros(300, dtype=np.float32)
    rir[0] = 1.0
    write_wav(tmp_path / "rir" / "r.wav", rir, sr)
    for sub in ("clean", "noise", "rir"):
        (tmp_path / f"{sub}.txt").write_text(str(tmp_path / sub / f"{sub[0]}.wav") + "\n")

    ds = TrainDataset(
        clean_dataset=str(tmp_path / "clean.txt"),
        noise_dataset=str(tmp_path / "noise.txt"),
        rir_dataset=str(tmp_path / "rir.txt"),
        snr_range=(0, 5),
        reverb_proportion=1.0,
        silence_length=0.1,
        target_dB_FS=-25,
        target_dB_FS_floating_value=5,
        sub_sample_length=0.5,
        sr=sr,
    )
    noisy, clean = ds[0]
    assert noisy.shape == clean.shape == (8000,)
    assert np.isfinite(noisy).all() and np.isfinite(clean).all()
    assert np.max(np.abs(noisy)) <= 1.0
