"""PESQ fidelity evidence: spec-derivation and property tests for the
documented deviations from the ITU C implementation (docs/parity.md).

The native PESQ (fullsubnet_tpu/pesq.py) replaces the reference's ITU C
extension (/root/reference/audio_zen/metrics.py:38-45). Its deviations
are documented; these tests turn each documented claim into a pinned,
measured bound instead of an assertion of faith:

* the fitted ``_ASYM_SCALE`` matches the claimed width-normalization
  identity (1/totalBandWidth) — i.e. it is structurally derived, with
  the fit only absorbing <3% residual;
* the zero-phase IRS-receive filter realizes exactly the spec's
  magnitude table (the transcription + construction is right), and the
  score sensitivity to the filter's PHASE (the actual deviation from
  the ITU IIR cascade) is bounded by measurement;
* the normalized-cross-correlation crude aligner satisfies the delay
  invariance the ITU algorithm is designed around (constant-delay
  inputs score like undelayed inputs), including the extreme-lag
  sliver-overlap pathology that motivated the energy-coverage gate in
  ``_ncc_argmax``.
"""

import numpy as np
import pytest

from fullsubnet_tpu import pesq as P
from tools.pesq_calibrate import build_testbed


@pytest.fixture(scope="module")
def clips():
    return build_testbed(8, 6.0)


# ---------------------------------------------------------------------------
# spec-derivation of the calibrated scales
# ---------------------------------------------------------------------------

def test_asym_scale_width_normalization_identity():
    """docs/parity.md claims the fitted asym scale "lands at
    1/totalBandWidth, consistent with a width-normalized ITU power
    mean": our ``_pseudo_lp`` rescales by total_w, so 1/total_w exactly
    cancels it. Verify the fitted constant is within 3% of the derived
    value at the fit's sample rate (16 kHz) — the calibration absorbs a
    residual, it does not invent the constant."""
    m = P._model(16000)
    derived = 1.0 / m.total_w
    assert abs(P._ASYM_SCALE / derived - 1.0) < 0.03, (
        f"_ASYM_SCALE {P._ASYM_SCALE} vs 1/total_w {derived}"
    )


def test_calibrated_scales_pinned():
    """The two fitted constants are part of the metric's contract
    (BASELINE anchors reproduce through them) — any drift must be a
    deliberate re-calibration, not an accident."""
    assert P._SYM_SCALE == pytest.approx(0.139115, abs=1e-6)
    assert P._ASYM_SCALE == pytest.approx(0.0482088, abs=1e-7)


# ---------------------------------------------------------------------------
# IRS filter: exact magnitude, bounded phase sensitivity
# ---------------------------------------------------------------------------

def test_irs_fft_filter_magnitude_matches_table():
    """The realized transfer of the zero-phase NB input filter equals the
    spec's IRS-receive dB table (re 1 kHz) at the table frequencies: a
    unit impulse through ``_apply_fft_filter`` measures |H(f)| directly."""
    m = P._model(8000)
    n = 4096
    x = np.zeros(n + 2 * m.buf)
    x[m.buf + n // 2] = 1.0
    y = P._apply_fft_filter(x, m, P._IRS_FILTER_DB, (m.buf, n), re_1khz=True)
    H = np.abs(np.fft.rfft(y[m.buf: m.buf + n], n))
    f = np.arange(len(H)) * (m.sr / n)
    ref_1k = P._interp_db(1000.0, P._IRS_FILTER_DB)
    for hz, db in P._IRS_FILTER_DB:
        if hz <= 0 or hz >= m.sr / 2 or db <= -100:
            continue  # stopband sentinels (-500 dB) underflow to ~0
        k = int(round(hz / (m.sr / n)))
        # compare at the realized bin frequency (grid quantization aside,
        # the transfer must be the dB-linearly-interpolated table re 1 kHz)
        want = P._interp_db(f[k], P._IRS_FILTER_DB) - ref_1k
        got_db = 20 * np.log10(max(H[k], 1e-12))
        assert got_db == pytest.approx(want, abs=0.05), f"{hz} Hz (bin {f[k]})"


def _apply_fft_filter_minphase(x, m, curve, active, re_1khz):
    """Minimum-phase FIR with the same magnitude response (cepstral
    construction) — a stand-in for 'an IIR-like phase' to measure how
    much the zero-phase choice can move scores."""
    start, n = active
    seg = x[start: start + n]
    nfft = int(2 ** np.ceil(np.log2(max(n, 2))))
    spec = np.fft.rfft(seg, nfft)
    f = np.arange(len(spec)) * (m.sr / nfft)
    db = P._interp_db(f, curve)
    if re_1khz:
        db = db - P._interp_db(1000.0, curve)
    gain = 10.0 ** (db / 20.0)
    cep = np.fft.irfft(np.log(np.maximum(gain, 1e-8)), nfft)
    fold = np.zeros_like(cep)
    fold[0] = cep[0]
    fold[1: nfft // 2] = 2 * cep[1: nfft // 2]
    fold[nfft // 2] = cep[nfft // 2]
    h_min = np.exp(np.fft.rfft(fold, nfft))
    out = x.copy()
    out[start: start + n] = np.fft.irfft(spec * h_min, nfft)[:n]
    return out


def test_nb_filter_phase_sensitivity_bounded(clips, monkeypatch):
    """The deviation from ITU is the filter's PHASE (magnitude is
    table-exact above). Measure the score shift from swapping zero-phase
    for minimum-phase (same magnitude): the documented bound is that
    phase choice moves NB scores < 0.25 MOS worst-case on the noisy
    testbed, with a small typical effect (median < 0.05). Measured on
    this testbed: max 0.17, median 0.004."""
    deltas = []
    for sp, noisy, _snr, _kind in clips[:6]:
        a = P.pesq(sp, noisy, 16000, "nb")
        monkeypatch.setattr(P, "_apply_fft_filter", _apply_fft_filter_minphase)
        b = P.pesq(sp, noisy, 16000, "nb")
        monkeypatch.undo()
        deltas.append(abs(b - a))
    assert max(deltas) < 0.25, deltas
    assert float(np.median(deltas)) < 0.05, deltas


# ---------------------------------------------------------------------------
# alignment: delay invariance (the property that justifies the NCC choice)
# ---------------------------------------------------------------------------

def test_delay_invariance_sweep(clips):
    """P.862 is built to score through constant transmission delay: a
    zero-padded degraded signal must score like the unpadded one. This is
    the end-to-end property the crude/fine alignment chain must satisfy,
    and the measured bound for the documented aligner deviation. Sweep
    frame-aligned and odd delays across all testbed noise kinds."""
    worst = 0.0
    for sp, noisy, _snr, _kind in clips:
        base = P.pesq(sp, noisy, 16000, "wb")
        for d in (64, 1200, 7777):
            deg = np.concatenate([np.zeros(d, np.float32),
                                  noisy.astype(np.float32)])
            worst = max(worst, abs(P.pesq(sp, deg, 16000, "wb") - base))
    # measured 0.18 worst (periodic hum noise at 0.49 s delay); the
    # pre-fix sliver-overlap pathology was 1.50
    assert worst < 0.25, worst


def test_extreme_lag_sliver_rejected(clips):
    """Regression for the ``_ncc_argmax`` energy-coverage gate: on the
    quasi-periodic 'white' clip, a ~0.49 s delay used to align the
    reference envelope onto a 29%-overlap sliver at a ~4.7 s lag (NCC
    0.84 vs 0.68 at truth), parking active speech on silence and
    inflating the score by +1.5 MOS. The gate (overlap must cover half
    the ref envelope energy) keeps the score at the undelayed level."""
    sp, noisy, _snr, _kind = clips[0]
    base = P.pesq(sp, noisy, 16000, "wb")
    deg = np.concatenate([np.zeros(7777, np.float32),
                          noisy.astype(np.float32)])
    assert abs(P.pesq(sp, deg, 16000, "wb") - base) < 0.15


def test_truncated_degraded_still_scored(clips):
    """The energy-coverage gate must not be a hard wall: a degraded
    signal much shorter than the reference (truncated call — no lag can
    cover half the reference envelope energy) falls back to overlap-only
    admission and still aligns the surviving half, instead of scoring a
    guaranteed-wrong zero-lag alignment."""
    sp, noisy, _snr, _kind = clips[0]
    n = len(noisy)
    # keep only the middle 40% of the call: zero-lag is wrong by ~30%
    # of the file; the correct crude lag is ~ -0.3*n samples
    deg = noisy[int(0.3 * n): int(0.7 * n)].astype(np.float32)
    got = P.pesq(sp, deg, 16000, "wb")
    assert 1.0 <= got <= 4.64  # scored, not a sentinel

    # and the aligner itself: a deg envelope that is a 40% slice of the
    # ref envelope can never cover half the ref energy, so the strict
    # gate admits nothing — the fallback must still recover the true lag
    rng = np.random.default_rng(0)
    a = np.abs(rng.standard_normal(1000)) + 0.1  # ref envelope
    lo = 300
    b = a[lo:700].copy()                         # deg = interior slice
    lag, score = P._ncc_argmax(a, b, prefer=0, min_overlap=50)
    assert lag == -lo, (lag, score)  # true lag, not the prefer sentinel
    assert score > 0.99
