"""freq_unfold / drop_band / waveform utility parity vs reference semantics."""

import jax.numpy as jnp
import numpy as np
import torch
from torch.nn import functional as F

from fullsubnet_tpu.acoustics import (
    freq_unfold,
    drop_band,
    overlap_cat,
    subsample,
    aligned_subsample,
    norm_amplitude,
    tailor_dB_FS,
    is_clipped,
    activity_detector,
    batch_shuffle_frequency,
    mel_filterbank,
    apply_filterbank,
    inverse_filterbank,
)


def _torch_freq_unfold(x, num_neighbors):
    """Reference base_model.py:13-46 restated with torch."""
    x = torch.from_numpy(x)
    b, c, f, t = x.shape
    if num_neighbors <= 0:
        return x.permute(0, 2, 1, 3).reshape(b, f, c, 1, t).numpy()
    out = x.reshape(b * c, 1, f, t)
    size = num_neighbors * 2 + 1
    out = F.pad(out, [0, 0, num_neighbors, num_neighbors], mode="reflect")
    out = F.unfold(out, kernel_size=(size, t))
    out = out.reshape(b, c, size, t, f)
    return out.permute(0, 4, 1, 2, 3).contiguous().numpy()


def test_freq_unfold_matches_reference():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 1, 257, 30)).astype(np.float32)
    for n in (0, 1, 15):
        ref = _torch_freq_unfold(x, n)
        ours = np.asarray(freq_unfold(jnp.asarray(x), n))
        assert ours.shape == ref.shape, (n, ours.shape, ref.shape)
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_freq_unfold_multichannel():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, 64, 10)).astype(np.float32)
    ref = _torch_freq_unfold(x, 2)
    np.testing.assert_allclose(np.asarray(freq_unfold(jnp.asarray(x), 2)), ref, atol=1e-6)


def _torch_drop_band(x, num_groups):
    """Reference feature.py:309-345 restated with torch."""
    x = torch.from_numpy(x)
    batch_size, _, num_freqs, _ = x.shape
    if num_groups <= 1:
        return x.numpy()
    if num_freqs % num_groups != 0:
        x = x[..., : num_freqs - (num_freqs % num_groups), :]
        num_freqs = x.shape[2]
    out = []
    for g in range(num_groups):
        s = torch.arange(g, batch_size, num_groups)
        fr = torch.arange(g, num_freqs, num_groups)
        out.append(torch.index_select(torch.index_select(x, 0, s), 2, fr))
    return torch.cat(out, dim=0).numpy()


def test_drop_band_matches_reference():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((6, 2, 257, 10)).astype(np.float32)
    for g in (2, 3):
        ref = _torch_drop_band(x, g)
        ours = np.asarray(drop_band(jnp.asarray(x), g))
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_overlap_cat():
    chunks = [jnp.ones((2, 8)) * i for i in range(1, 4)]
    out = np.asarray(overlap_cat(chunks))
    assert out.shape == (2, 16)
    # [1(first half) | avg(1,2) | avg(2,3) | 3(last half)]
    np.testing.assert_allclose(out[0, :4], 1.0)
    np.testing.assert_allclose(out[0, 4:8], 1.5)
    np.testing.assert_allclose(out[0, 8:12], 2.5)
    np.testing.assert_allclose(out[0, 12:], 3.0)


def test_subsample_and_aligned():
    rng = np.random.default_rng(3)
    data = rng.standard_normal(100).astype(np.float32)
    out = subsample(data, 50, start_position=10)
    np.testing.assert_allclose(out, data[10:60])
    out = subsample(data, 150)
    assert len(out) == 150 and np.all(out[100:] == 0)
    a, b = aligned_subsample(data, data * 2, 150)
    assert a.shape == b.shape == (150,)
    np.testing.assert_allclose(b[:100], a[:100] * 2)


def test_waveform_utils():
    rng = np.random.default_rng(4)
    y = rng.standard_normal(1000).astype(np.float32)
    yn, scalar = norm_amplitude(y)
    assert np.max(np.abs(yn)) <= 1.0
    yt, rms, sc = tailor_dB_FS(y, -25)
    np.testing.assert_allclose(
        np.sqrt(np.mean(yt**2)), 10 ** (-25 / 20), rtol=1e-3
    )
    assert is_clipped(np.array([0.0, 1.5]))
    assert not is_clipped(np.array([0.0, 0.5]))


def test_activity_detector():
    sr = 16000
    t = np.arange(sr) / sr
    speechlike = np.sin(2 * np.pi * 300 * t).astype(np.float32)
    silence = np.zeros(sr, dtype=np.float32)
    assert activity_detector(speechlike, fs=sr) > 0.9
    assert activity_detector(silence, fs=sr) < 0.1


def test_batch_shuffle_frequency_roundtrip():
    import jax

    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 1, 16, 5)).astype(np.float32)
    out, idx = batch_shuffle_frequency(jnp.asarray(x), key=jax.random.PRNGKey(0))
    assert out.shape == x.shape
    # every original row appears exactly once
    for b in range(2):
        assert sorted(np.asarray(idx)[b].tolist()) == list(range(16))


def test_mel_filterbank_properties():
    fb = mel_filterbank(num_freqs=257, num_mels=64, sample_rate=16000)
    assert fb.shape == (257, 64)
    assert (fb >= 0).all()
    # each filter has nonzero support, spectral coverage is contiguous-ish
    assert (fb.sum(axis=0) > 0).all()
    x = jnp.asarray(np.random.default_rng(6).random((2, 257, 10)).astype(np.float32))
    mel = apply_filterbank(x, jnp.asarray(fb))
    assert mel.shape == (2, 64, 10)
    rec = inverse_filterbank(mel, jnp.asarray(fb))
    assert rec.shape == (2, 257, 10)
