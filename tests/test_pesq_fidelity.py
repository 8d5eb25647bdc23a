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


def test_nb_filter_phase_sensitivity_bounded(clips):
    """The deviation from ITU is the filter's PHASE (magnitude is
    table-exact above). ``irs_phase='minimum'`` (a first-class option in
    pesq.py) realizes the same magnitude with minimum phase — the ITU C
    IIR cascade is minimum-phase-like, so the zero-vs-minimum delta
    BOUNDS the deviation: < 0.25 MOS worst-case on the noisy testbed,
    small typical effect (median < 0.05). Measured: max 0.17,
    median 0.004 (8-clip testbed); 0.10 / 0.006 (6-clip)."""
    deltas = []
    for sp, noisy, _snr, _kind in clips[:6]:
        a = P.pesq(sp, noisy, 16000, "nb")
        b = P.pesq(sp, noisy, 16000, "nb", irs_phase="minimum")
        deltas.append(abs(b - a))
    assert max(deltas) < 0.25, deltas
    assert float(np.median(deltas)) < 0.05, deltas


def test_min_phase_keeps_table_magnitude():
    """The minimum-phase construction must not move the magnitude
    response: filter an impulse both ways and compare |FFT|."""
    m = P._model(16000)
    n = 8192
    x = np.zeros(n + 2 * m.buf)
    x[m.buf + 100] = 1.0
    a = P._apply_fft_filter(x, m, P._IRS_FILTER_DB, (m.buf, n), re_1khz=True)
    b = P._apply_fft_filter(x, m, P._IRS_FILTER_DB, (m.buf, n), re_1khz=True,
                            phase="minimum")
    fa = np.abs(np.fft.rfft(a[m.buf: m.buf + n]))
    fb = np.abs(np.fft.rfft(b[m.buf: m.buf + n]))
    keep = fa > 1e-3 * fa.max()  # away from the stopband noise floor
    assert np.max(np.abs(fb[keep] / fa[keep] - 1.0)) < 5e-3


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


def test_tiny_matching_slice_aligns_unrelated_returns_sentinel():
    """Below-10%-coverage fallback: a genuinely matching slice (<10% of
    the reference energy at every lag) still aligns via the overlap-only
    + NCC>=0.5 floor path, while UNRELATED audio of the same length must
    return the ``prefer`` sentinel instead of a confident wrong lag —
    the two halves of the round-4 advisor finding."""
    rng = np.random.default_rng(3)
    a = np.abs(rng.standard_normal(4000)) + 0.1   # ref envelope
    lo = 1500
    b = a[lo:lo + 300].copy()                     # 7.5% interior slice
    lag, score = P._ncc_argmax(a, b, prefer=0, min_overlap=50)
    assert lag == -lo, (lag, score)
    assert score >= 0.5

    unrelated = np.abs(rng.standard_normal(300)) + 0.1
    lag_u, score_u = P._ncc_argmax(a, unrelated, prefer=0, min_overlap=50)
    assert lag_u == 0 and score_u == 0.0, (lag_u, score_u)


def test_wb_rejects_irs_phase():
    """wb mode uses the IIR pre-filter; a non-default ``irs_phase``
    must raise, not be silently ignored (round-4 review finding)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal(16000 * 2).astype(np.float32) * 0.1
    with pytest.raises(ValueError, match="irs_phase"):
        P.pesq(x, x, 16000, "wb", irs_phase="minimum")


# ---------------------------------------------------------------------------
# stimuli beyond the noisy testbed (VERDICT r4 #6): reverberant, tonal,
# level-swept, clipped, dropout, mid-stream delay change — each behavior
# a pinned measured bound, not an assertion of faith
# ---------------------------------------------------------------------------


def _rir(decay_s, sr=16000, seconds=0.25, seed=7):
    rng = np.random.default_rng(seed)
    n = int(sr * seconds)
    h = rng.standard_normal(n) * np.exp(-np.arange(n) / (decay_s * sr))
    h[0] = 1.0
    return h / np.max(np.abs(h))


def test_level_sweep_invariance(clips):
    """P.862's fix_power_level normalizes both signals to the active
    speech level, so input gain on the degraded must be score-neutral.
    Measured: bit-identical scores across +/-20 dB."""
    sp, noisy, _snr, _kind = clips[0]
    base = P.pesq(sp, noisy, 16000, "wb")
    for db in (-20.0, -10.0, 10.0, 20.0):
        got = P.pesq(sp, noisy * 10 ** (db / 20.0), 16000, "wb")
        assert abs(got - base) < 1e-6, (db, got, base)


def test_reverberation_degrades_and_orders(clips):
    """Reverberant degraded audio scores well below clean-vs-clean, and
    a long tail scores below a short one. Measured (6 s speechlike):
    self 4.64, decay 10 ms -> 2.79, decay 80 ms -> 1.55."""
    sp = clips[0][0].astype(np.float64)
    self_score = P.pesq(sp, sp, 16000, "wb")

    def rev(decay):
        y = np.convolve(sp, _rir(decay))[: len(sp)]
        return P.pesq(sp, y * np.sqrt(np.mean(sp**2) / (np.mean(y**2) + 1e-12)),
                      16000, "wb")

    short, long_ = rev(0.01), rev(0.08)
    assert self_score - short > 1.5, (self_score, short)
    assert long_ < short - 1.0, (short, long_)


def test_tonal_hum_monotone(clips):
    """Additive hum (170 Hz) must order scores monotonically with hum
    level. Measured: 0.003 -> 3.90, 0.01 -> 2.81, 0.03 -> 1.50,
    0.1 -> 1.06."""
    sp = clips[0][0].astype(np.float64)
    hum = np.sin(2 * np.pi * 170 * np.arange(len(sp)) / 16000)
    scores = [P.pesq(sp, sp + a * hum, 16000, "wb")
              for a in (0.003, 0.01, 0.03, 0.1)]
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 3.5 and scores[-1] < 1.3, scores


def test_clipping_monotone(clips):
    """Hard clipping at tighter thresholds must not raise the score.
    Measured: thr 0.5 -> 4.50, 0.2 -> 2.91, 0.08 -> 2.83, 0.03 -> 2.77."""
    sp = clips[0][0].astype(np.float64)
    peak = np.max(np.abs(sp))
    scores = [P.pesq(sp, np.clip(sp, -c * peak, c * peak), 16000, "wb")
              for c in (0.5, 0.2, 0.08, 0.03)]
    assert scores[0] > 4.3, scores
    for a, b in zip(scores, scores[1:]):
        assert b <= a + 0.02, scores  # non-increasing (tiny tolerance)


def _with_dropouts(sp, k, sr=16000, width=2400):
    y = sp.copy()
    for i in range(k):
        s = int((0.8 + i) * sr * 0.7) % (len(sp) - width)
        y[s: s + width] = 0.0
    return y


def test_dropouts_exercise_bad_interval_realignment(clips, monkeypatch):
    """Zeroed 150 ms holes drive per-frame disturbances past the bad
    threshold: the bad-interval machinery must actually run (interval
    formed, re-alignment applied) and the score must drop with more
    holes. Measured: 1 hole -> 4.54, 6 holes -> 3.47 (1 bad interval)."""
    sp = clips[0][0].astype(np.float64)
    rec = []
    orig = P._bad_intervals

    def wrapped(bad):
        out = orig(bad)
        rec.append(len(out))
        return out

    monkeypatch.setattr(P, "_bad_intervals", wrapped)
    one = P.pesq(sp, _with_dropouts(sp, 1), 16000, "wb")
    six = P.pesq(sp, _with_dropouts(sp, 6), 16000, "wb")
    assert sum(rec) >= 1, "bad-interval path never ran"
    assert one > 4.2, one
    assert 2.8 < six < 4.0, six
    assert six < one - 0.5, (one, six)


def test_midstream_delay_change_realigns(clips):
    """A 60 ms delay inserted mid-file (time-VARYING delay — the case
    utterance splitting exists for) must score like the constant-delay
    version of the same signal, not like a misaligned one. Measured:
    splice 1.2172 vs constant-delay 1.2172 (noisy); clean splice 4.33
    (the spliced region itself is genuinely degraded)."""
    sp, noisy, _snr, _kind = clips[0]
    sp = sp.astype(np.float64)
    noisy = noisy.astype(np.float64)
    d = int(0.06 * 16000)
    half = len(noisy) // 2
    spliced = np.concatenate([noisy[:half], np.zeros(d), noisy[half:]])
    const = np.concatenate([np.zeros(d), noisy])
    assert abs(P.pesq(sp, spliced, 16000, "wb")
               - P.pesq(sp, const, 16000, "wb")) < 0.05

    half_sp = len(sp) // 2
    clean_spliced = np.concatenate([sp[:half_sp], np.zeros(d), sp[half_sp:]])
    assert P.pesq(sp, clean_spliced, 16000, "wb") > 3.8
