"""Metrics (SI-SDR, STOI) and wav I/O tests."""

import numpy as np
import pytest

from fullsubnet_tpu.data.wavio import read_wav, write_wav, load_wav
from fullsubnet_tpu.metrics import SI_SDR, STOI, transform_pesq_range


def _speech_like(sr=16000, seconds=2.0, seed=0):
    """Amplitude-modulated multi-tone signal, speech-ish for STOI."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    sig = np.zeros_like(t)
    for f in (220, 440, 880, 1760):
        sig += np.sin(2 * np.pi * f * t + rng.uniform(0, np.pi))
    envelope = 0.5 * (1 + np.sin(2 * np.pi * 3 * t))
    return (sig * envelope / 4).astype(np.float32)


def test_si_sdr_properties():
    x = _speech_like()
    assert SI_SDR(x, x) > 80  # identical
    assert SI_SDR(x, 0.5 * x) > 80  # scale-invariant
    noisy = x + 0.1 * np.random.default_rng(1).standard_normal(len(x)).astype(np.float32)
    val = SI_SDR(x, noisy)
    assert 0 < val < 40
    # known value: snr of 10:1 amplitude ratio noise
    n = np.zeros_like(x)
    n[0] = 1.0  # impulse noise
    assert SI_SDR(x, x + 0.001 * n) > SI_SDR(x, x + 0.1 * n)


def test_stoi_properties():
    sr = 16000
    x = _speech_like(sr)
    rng = np.random.default_rng(2)
    clean_score = STOI(x, x, sr=sr)
    assert clean_score > 0.95, clean_score
    light = STOI(x, x + 0.05 * rng.standard_normal(len(x)), sr=sr)
    heavy = STOI(x, x + 1.0 * rng.standard_normal(len(x)), sr=sr)
    assert clean_score >= light > heavy, (clean_score, light, heavy)
    assert heavy < 0.7


def test_stoi_invariant_to_scale():
    x = _speech_like()
    y = x + 0.1 * np.random.default_rng(3).standard_normal(len(x))
    a = STOI(x, y)
    b = STOI(x, 3.0 * y)
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_transform_pesq_range():
    assert transform_pesq_range(-0.5) == 0
    assert transform_pesq_range(4.5) == 1


def test_wav_roundtrip(tmp_path):
    sr = 16000
    x = _speech_like(sr, 0.5)
    p = tmp_path / "x.wav"
    write_wav(p, x, sr)
    y, got_sr = read_wav(p)
    assert got_sr == sr
    np.testing.assert_allclose(y, x, atol=1e-4)  # int16 quantization


def test_wav_resample(tmp_path):
    sr = 8000
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    p = tmp_path / "x.wav"
    write_wav(p, x, sr)
    y, got_sr = read_wav(p, sr=16000)
    assert got_sr == 16000
    assert abs(len(y) - 2 * len(x)) <= 1
    # still a 440 Hz tone
    spec = np.abs(np.fft.rfft(y))
    peak_hz = np.argmax(spec) * 16000 / len(y)
    assert abs(peak_hz - 440) < 5


def test_wav_multichannel(tmp_path):
    sr = 16000
    x = np.stack([_speech_like(sr, 0.3), _speech_like(sr, 0.3, seed=1)])
    p = tmp_path / "mc.wav"
    write_wav(p, x, sr)
    y, _ = read_wav(p)
    assert y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1e-4)
    mono, _ = read_wav(p, mono=True)
    assert mono.shape == (x.shape[1],)
    assert load_wav(p, sr=sr).shape == x.shape
