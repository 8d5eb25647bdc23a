"""Native PESQ (ITU-T P.862 family) behavioral tests.

No oracle implementation exists in this environment (the ITU C extension
is absent and there is no network), so these tests pin the exact structural
anchors of the standard, the documented invariances, strict monotonicity in
distortion, and regression values of this implementation.
"""

import numpy as np
import pytest

from fullsubnet_tpu.pesq import pesq, pesq_raw

SR = 16000


def _pseudo_speech(seconds=6, seed=1, sr=SR):
    """Broadband modulated pink-ish noise with pauses (speech-like)."""
    rng = np.random.default_rng(seed)
    n = int(seconds * sr)
    spec = np.fft.rfft(rng.standard_normal(n))
    f = np.fft.rfftfreq(n, 1 / sr)
    shape = (1.0 / np.maximum(f, 100)) * (
        np.exp(-(((f - 500) / 2500) ** 2)) + 0.3
    )
    x = np.fft.irfft(spec * shape, n)
    t = np.arange(n) / sr
    env = np.clip(np.sin(2 * np.pi * 3.1 * t) + 0.3, 0, None) ** 0.7
    env *= np.sin(2 * np.pi * 0.4 * t) > -0.6
    x = x * env
    return x / (np.sqrt(np.mean(x[env > 0.01] ** 2)) + 1e-12) * 0.1


def _with_noise(speech, snr_db, seed=7):
    rng = np.random.default_rng(seed)
    nz = rng.standard_normal(len(speech))
    act = np.sqrt(np.mean(speech**2))
    return speech + nz * act / np.sqrt(np.mean(nz**2)) * 10 ** (-snr_db / 20)


@pytest.fixture(scope="module")
def speech():
    return _pseudo_speech()


def test_identity_anchors(speech):
    """Identical signals: raw = 4.5 exactly; the P.862.2/P.862.1 logistic
    maps give WB 4.6439 / NB 4.5486 (the standards' maximum scores)."""
    assert pesq_raw(speech, speech) == pytest.approx(4.5, abs=1e-9)
    assert pesq(speech, speech, mode="wb") == pytest.approx(4.6439, abs=1e-3)
    assert pesq(speech, speech, mode="nb") == pytest.approx(4.5486, abs=1e-3)


def test_monotone_in_snr(speech):
    """Strictly decreasing with noise level, for both modes."""
    for mode in ("wb", "nb"):
        scores = [
            pesq(speech, _with_noise(speech, snr), mode=mode)
            for snr in (40, 30, 20, 10, 0)
        ]
        assert all(a > b for a, b in zip(scores, scores[1:])), scores


def test_plausible_operating_points(speech):
    """WB scores land in the right MOS regions (the aggregation scales are
    calibrated so a DNS-like testbed reproduces the reference-published
    DNS noisy baselines — tools/pesq_calibrate.py)."""
    assert 2.6 < pesq(speech, _with_noise(speech, 30)) < 3.5
    assert 1.9 < pesq(speech, _with_noise(speech, 20)) < 2.7
    assert 1.3 < pesq(speech, _with_noise(speech, 10)) < 2.0
    assert 1.0 < pesq(speech, _with_noise(speech, 0)) < 1.7


def test_level_and_delay_invariance(speech):
    """P.862 level-aligns both inputs and compensates constant delay."""
    base = pesq(speech, _with_noise(speech, 15))
    scaled = pesq(0.5 * speech, 0.25 * _with_noise(speech, 15))
    assert scaled == pytest.approx(base, abs=0.02)

    delayed = np.concatenate([np.zeros(137), speech])[: len(speech)]
    assert pesq(speech, delayed) == pytest.approx(4.6439, abs=1e-3)


def test_asymmetry(speech):
    """Additive noise (added distortion) must hurt more than the same
    power removed by spectral attenuation (the asymmetry property)."""
    noisy = _with_noise(speech, 10)
    # low-pass the speech: removes content instead of adding it
    spec = np.fft.rfft(speech)
    f = np.fft.rfftfreq(len(speech), 1 / SR)
    muffled = np.fft.irfft(spec * (f < 2500), len(speech))
    assert pesq(speech, muffled) > pesq(speech, noisy)


def test_range_bounds(speech):
    """MOS-LQO stays within the mapping's range for garbage input."""
    rng = np.random.default_rng(3)
    garbage = rng.standard_normal(len(speech)) * 0.1
    s = pesq(speech, garbage)
    assert 1.0 <= s <= 4.644


def test_nb_mode_at_8k(speech):
    from scipy.signal import resample_poly

    s8 = resample_poly(speech, 1, 2)
    assert pesq_raw(s8, s8, sr=8000, mode="nb") == pytest.approx(4.5, abs=1e-9)
    n8 = resample_poly(_with_noise(speech, 10), 1, 2)
    assert pesq(s8, n8, sr=8000, mode="nb") < 3.0


def test_short_input_degrades_softly():
    assert pesq(np.zeros(100), np.zeros(100)) <= 1.1


def test_regression_values(speech):
    """Pinned scores of THIS implementation (catch accidental changes;
    these are not ITU reference values — see module docstring)."""
    vals = {
        snr: pesq(speech, _with_noise(speech, snr)) for snr in (30, 10)
    }
    assert vals[30] == pytest.approx(3.020, abs=0.02)
    assert vals[10] == pytest.approx(1.603, abs=0.02)
    assert pesq(speech, _with_noise(speech, 10), mode="nb") == pytest.approx(
        2.215, abs=0.02
    )


def test_metrics_integration(speech):
    """metrics.WB_PESQ/NB_PESQ route to the native implementation and the
    model-selection score machinery is live again."""
    from fullsubnet_tpu.metrics import (
        NB_PESQ,
        WB_PESQ,
        pesq_available,
        transform_pesq_range,
    )

    assert pesq_available()
    wb = WB_PESQ(speech, _with_noise(speech, 20))
    nb = NB_PESQ(speech, _with_noise(speech, 20))
    # NB is the more lenient mode on noisy speech (matches the published
    # DNS noisy baselines: NB 2.454 vs WB 1.582)
    assert 1.0 < wb < nb < 4.65
    assert 0.0 < transform_pesq_range(wb) < 1.05


def test_metrics_pesq_resamples_unsupported_rates(speech):
    """WB_PESQ at 48 kHz (improved 48k recipe) resamples to 16 kHz instead
    of crashing the validation epoch."""
    from scipy.signal import resample_poly

    from fullsubnet_tpu.metrics import WB_PESQ

    s48 = resample_poly(speech, 3, 1)
    n48 = resample_poly(_with_noise(speech, 10), 3, 1)
    score48 = WB_PESQ(s48, n48, sr=48000)
    score16 = WB_PESQ(speech, _with_noise(speech, 10), sr=16000)
    assert abs(score48 - score16) < 0.25
    assert 1.0 <= score48 <= 4.65


def test_identity_on_periodic_signals():
    """Quasi-periodic content ties the aligner's cross-correlation at
    period multiples; the NCC crude align + near-tie preference must
    still find lag 0 (identity == max score even for a pure tone)."""
    t = np.arange(4 * SR) / SR
    tone = 0.1 * np.sin(2 * np.pi * 440 * t) * (np.sin(2 * np.pi * 2.0 * t) > -0.5)
    assert pesq_raw(tone, tone) == pytest.approx(4.5, abs=1e-9)


def test_variable_delay_utterance_split(speech):
    """A delay that JUMPS mid-file (the condition P.862's utterance
    splitting exists for): per-utterance alignment must keep the score
    near the maximum, far above what a single global delay could."""
    n = len(speech)
    half = n // 2
    shift = 480  # 30 ms
    deg = np.concatenate([
        speech[:half],
        speech[half - shift : n - shift],
    ])
    assert pesq(speech, deg) > 3.4


def test_bark_table_internal_consistency():
    """The transcribed ITU tables cohere: centre/width recurrence
    (centre[i+1]-centre[i] == (width[i]+width[i+1])/2) and the per-band
    bin counts tile the FFT half-spectrum exactly."""
    from fullsubnet_tpu.pesq import (
        _CENTRE_OF_BAND_BARK_16K,
        _NR_OF_HZ_BANDS_16K,
        _WIDTH_OF_BAND_BARK_16K,
        _model,
    )

    c, w = _CENTRE_OF_BAND_BARK_16K, _WIDTH_OF_BAND_BARK_16K
    np.testing.assert_allclose(np.diff(c), (w[:-1] + w[1:]) / 2, atol=5e-4)
    assert _NR_OF_HZ_BANDS_16K.sum() == 256
    assert _model(8000).nr_of_hz_bands.sum() == 128


def test_dns_anchor_calibration():
    """Four clips from the calibration testbed distribution score in the
    DNS-noisy-baseline region and keep NB > WB (the fitted scales must
    reproduce the published relationship; full fit in
    tools/pesq_calibrate.py)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from tools.pesq_calibrate import build_testbed

    clips = build_testbed(4, 6.0)
    wb = [pesq(sp, noisy) for sp, noisy, _, _ in clips]
    nb = [pesq(sp, noisy, mode="nb") for sp, noisy, _, _ in clips]
    assert 1.0 < float(np.mean(wb)) < 2.3
    assert float(np.mean(nb)) > float(np.mean(wb))
