"""STFT/iSTFT parity vs torch.stft/istft — the #1 correctness gate."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fullsubnet_tpu.acoustics import stft, istft, stft_complex, hann_window


@pytest.mark.parametrize("n_fft,hop,win", [(512, 256, 512), (960, 480, 960), (320, 160, 320)])
@pytest.mark.parametrize("num_samples", [16000, 3072, 49151])
def test_stft_matches_torch(n_fft, hop, win, num_samples):
    rng = np.random.default_rng(0)
    y = rng.standard_normal((2, num_samples)).astype(np.float32)

    ref = torch.stft(
        torch.from_numpy(y),
        n_fft,
        hop,
        win,
        window=torch.hann_window(n_fft),
        return_complex=True,
    ).numpy()

    ours = np.asarray(stft_complex(jnp.asarray(y), n_fft, hop, win))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours.real, ref.real, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(ours.imag, ref.imag, atol=2e-4, rtol=1e-4)


def test_stft_window_shorter_than_nfft():
    rng = np.random.default_rng(1)
    y = rng.standard_normal((1, 8000)).astype(np.float32)
    n_fft, hop, win = 512, 128, 400
    ref = torch.stft(
        torch.from_numpy(y),
        n_fft,
        hop,
        win,
        window=torch.hann_window(win),
        return_complex=True,
    ).numpy()
    ours = np.asarray(stft_complex(jnp.asarray(y), n_fft, hop, win))
    np.testing.assert_allclose(ours.real, ref.real, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(ours.imag, ref.imag, atol=2e-4, rtol=1e-4)


def test_stft_four_tuple_and_multichannel():
    rng = np.random.default_rng(2)
    y = rng.standard_normal((2, 3, 4096)).astype(np.float32)
    mag, phase, real, imag = stft(jnp.asarray(y), 512, 256, 512)
    assert mag.shape == (2, 3, 257, 17)
    np.testing.assert_allclose(
        np.asarray(mag), np.hypot(np.asarray(real), np.asarray(imag)), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(phase), np.arctan2(np.asarray(imag), np.asarray(real)), atol=1e-5
    )


@pytest.mark.parametrize("num_samples", [16000, 3072])
def test_istft_matches_torch(num_samples):
    rng = np.random.default_rng(3)
    y = rng.standard_normal((2, num_samples)).astype(np.float32)
    n_fft, hop, win = 512, 256, 512

    spec_t = torch.stft(
        torch.from_numpy(y), n_fft, hop, win,
        window=torch.hann_window(n_fft), return_complex=True,
    )
    ref = torch.istft(
        spec_t, n_fft, hop, win, window=torch.hann_window(n_fft), length=num_samples
    ).numpy()

    spec_j = stft_complex(jnp.asarray(y), n_fft, hop, win)
    ours = np.asarray(istft(spec_j, n_fft, hop, win, length=num_samples))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-4)


def test_istft_roundtrip_reconstruction():
    rng = np.random.default_rng(4)
    y = rng.standard_normal((1, 16000)).astype(np.float32)
    spec = stft_complex(jnp.asarray(y), 512, 256, 512)
    recon = np.asarray(istft(spec, 512, 256, 512, length=16000))
    np.testing.assert_allclose(recon, y, atol=1e-4)


def test_istft_input_types():
    rng = np.random.default_rng(5)
    y = rng.standard_normal((1, 4096)).astype(np.float32)
    spec = stft_complex(jnp.asarray(y), 512, 256, 512)
    base = np.asarray(istft(spec, 512, 256, 512, length=4096))
    via_ri = np.asarray(
        istft((spec.real, spec.imag), 512, 256, 512, length=4096, input_type="real_imag")
    )
    mag, phase = jnp.abs(spec), jnp.angle(spec)
    via_mp = np.asarray(
        istft((mag, phase), 512, 256, 512, length=4096, input_type="mag_phase")
    )
    np.testing.assert_allclose(via_ri, base, atol=1e-6)
    np.testing.assert_allclose(via_mp, base, atol=1e-5)


def test_hann_window_matches_torch():
    for n in (320, 512, 960):
        np.testing.assert_allclose(
            np.asarray(hann_window(n)), torch.hann_window(n).numpy(), atol=1e-6
        )
