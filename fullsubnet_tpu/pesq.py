"""PESQ — Perceptual Evaluation of Speech Quality (ITU-T P.862 family).

A from-scratch NumPy implementation of the P.862 perceptual model with the
P.862.1 (narrowband) and P.862.2 (wideband) MOS-LQO mappings, replacing the
reference's dependency on the ITU C extension (``audio_zen/metrics.py:38-45``
via the ``pesq`` package) which is unavailable in this environment.

Pipeline (following the published P.862 algorithm structure):

1.  Level alignment: both signals scaled so the mean power in the
    350-3250 Hz band equals the fixed calibration target.
2.  Input filtering: IRS-receive-like bandpass for NB, 100 Hz highpass for
    WB (P.862.2 drops the IRS characteristic), applied as a full-signal FFT
    filter with a piecewise-linear dB response.
3.  Time alignment: global delay via frame-energy cross-correlation plus a
    sample-level refinement. (The full P.862 utterance-splitting variable
    delay tracker targets VoIP conditions; speech-enhancement evaluation
    compares time-aligned files, where a global delay is exact.)
4.  Perceptual model: Hann-windowed 32 ms frames (50% overlap), power
    spectra grouped into Bark bands (49 bands at 16 kHz, 42 at 8 kHz,
    uniform in the P.862 transform z = 6*asinh(f/600)), partial frequency
    compensation of the reference, short-term gain compensation, Zwicker
    loudness with the low-band modified exponent, center-clipped loudness
    difference, asymmetry weighting ((deg+c)/(ref+c))^1.2 gated at 3 and
    capped at 12.
5.  Aggregation: per-frame weighted L2 (symmetric) / L1 (asymmetric) over
    bands, L6 over 20-frame "syllable" splits, L2 over splits, frames
    weighted by ((audible ref power + 1e5)/1e7)^0.04 and capped at 45.
6.  Raw score = 4.5 - 0.1*D_sym - 0.0309*D_asym, mapped to MOS-LQO with
    the published logistic (P.862.1 / P.862.2).

Fidelity note (documented in docs/parity.md): the band tables are computed
from the Bark transform and a standard threshold-in-quiet curve rather than
transcribed from the (licensed) ITU tables, the time aligner handles a
single global delay, and three free normalization constants (the power
calibration gain ``_CAL`` and the symmetric/asymmetric aggregation scales)
were fitted so the score tracks the published WB-PESQ-vs-SNR operating
curve for speech in white noise (raw RMSE ~0.2 over 0-40 dB SNR).
Structural anchors are exact — identical signals score raw 4.5 (WB MOS-LQO
4.644, NB 4.549), the mappings and aggregation powers follow the
standard — and scores are strictly monotone in distortion (tested), but
individual scores may deviate from the ITU C implementation by ~0.1-0.2
MOS. The ITU C extension is preferred automatically when installed
(see ``fullsubnet_tpu.metrics``).
"""

from __future__ import annotations

import numpy as np

_EPS = np.finfo(np.float64).eps

# Calibration target for the 350-3250 Hz band mean power (16-bit domain).
_TARGET_AVG_POWER = 1e7

# Power/loudness scaling (P.862 values).
_SP = {16000: 6.910853e-6, 8000: 2.764344e-5}
_SL = {16000: 1.866055e-1, 8000: 1.866055e-1}

# Fitted normalization (see module docstring): power calibration gain (also
# scales every absolute power constant, so only the loudness magnitude
# changes), symmetric L2 scale, asymmetric L1 divisor.
_CAL = 10.0
_SYM_SCALE = 0.85
_ASYM_DIV = 8.0

_ZWICKER_POWER = 0.23

# MOS-LQO logistic: y = 0.999 + 4 / (1 + exp(-a*x + b))
_MAPPING = {"wb": (1.3669, 3.8224), "nb": (1.4945, 4.6607)}

# Threshold-in-quiet anchors (Hz, dB) — the standard absolute hearing
# threshold shape sampled for interpolation at band centers.
_ABS_THRESH_DB = np.array([
    (0.0, 77.0), (31.0, 64.0), (62.0, 48.5), (94.0, 37.0), (125.0, 31.0),
    (156.0, 26.0), (219.0, 20.0), (281.0, 16.6), (375.0, 12.5), (469.0, 10.0),
    (625.0, 7.0), (750.0, 5.0), (900.0, 3.0), (1000.0, 1.0), (1100.0, -0.1),
    (1250.0, -1.4), (1400.0, -2.5), (1550.0, -3.4), (1700.0, -4.1),
    (1900.0, -4.8), (2100.0, -5.3), (2300.0, -5.7), (2500.0, -5.9),
    (2700.0, -6.0), (3200.0, -6.0), (3700.0, -5.4), (4200.0, -4.7),
    (4800.0, -3.8), (5400.0, -3.2), (6000.0, -3.0), (6600.0, -2.9),
    (7200.0, -2.8), (7700.0, -3.5), (8000.0, -2.7),
])


def _bark(f):
    return 6.0 * np.arcsinh(np.asarray(f, np.float64) / 600.0)


def _bark_inv(z):
    return 600.0 * np.sinh(np.asarray(z, np.float64) / 6.0)


class _Model:
    """Per-sample-rate precomputed tables."""

    def __init__(self, sr: int):
        self.sr = sr
        self.frame = 512 if sr == 16000 else 256
        self.shift = self.frame // 2
        self.nb = 49 if sr == 16000 else 42
        self.window = 0.5 * (
            1.0 - np.cos(2.0 * np.pi * np.arange(self.frame) / self.frame)
        )
        self.sp = _SP[sr]
        self.sl = _SL[sr]

        nbins = self.frame // 2 + 1
        f_bin = np.arange(nbins) * (sr / self.frame)
        z_edges = np.linspace(0.0, float(_bark(sr / 2)), self.nb + 1)
        band_of_bin = np.clip(
            np.searchsorted(z_edges, _bark(f_bin), side="right") - 1,
            0,
            self.nb - 1,
        )
        self.band_masks = [band_of_bin == b for b in range(self.nb)]
        assert all(m.any() for m in self.band_masks), "empty Bark band"

        centre_hz = _bark_inv(0.5 * (z_edges[:-1] + z_edges[1:]))
        self.centre_bark = _bark(centre_hz)
        self.width_bark = np.diff(z_edges)  # uniform by construction
        # power-density correction: nominal band width in Hz over the Hz
        # width actually covered by the member bins
        bin_width = sr / self.frame
        nominal_hz = np.diff(_bark_inv(z_edges))
        actual_hz = np.array([m.sum() * bin_width for m in self.band_masks])
        self.pow_dens_correction = nominal_hz / actual_hz

        thr_db = np.interp(
            centre_hz, _ABS_THRESH_DB[:, 0], _ABS_THRESH_DB[:, 1]
        )
        self.abs_thresh = 10.0 ** (thr_db / 10.0)

        # Zwicker exponent, raised below 4 Bark (P.862's low-band
        # modification: h = min(6/(z+2), 2) ** 0.15)
        h = np.minimum(6.0 / (self.centre_bark + 2.0), 2.0)
        h = np.where(self.centre_bark < 4.0, h, 1.0)
        self.zwicker = _ZWICKER_POWER * h**0.15


_MODELS: dict[int, _Model] = {}


def _model(sr: int) -> _Model:
    if sr not in _MODELS:
        _MODELS[sr] = _Model(sr)
    return _MODELS[sr]


# --------------------------------------------------------------------------
# Pre-processing
# --------------------------------------------------------------------------


def _fft_filter(x, sr, curve):
    """Filter the whole signal with a piecewise-linear |H| in dB.

    curve: [(hz, db), ...] anchors; the response interpolates linearly in
    (hz, db) and holds the end values outside the range.
    """
    n = int(2 ** np.ceil(np.log2(max(len(x), 2))))
    spec = np.fft.rfft(x, n)
    f = np.arange(len(spec)) * (sr / n)
    hz, db = np.asarray(curve, np.float64).T
    gain = 10.0 ** (np.interp(f, hz, db) / 20.0)
    return np.fft.irfft(spec * gain, n)[: len(x)]


# IRS receive characteristic approximation (NB mode): telephone-band
# emphasis rising to the 2-3 kHz region, cut below 200 Hz and above 3.6 kHz.
_IRS_CURVE = [
    (0, -200.0), (50, -40.0), (100, -20.0), (125, -12.0), (160, -6.0),
    (200, 0.0), (250, 4.0), (300, 6.0), (350, 8.0), (400, 10.0),
    (500, 11.0), (600, 12.0), (3000, 12.0), (3250, 12.0), (3500, 4.0),
    (4000, -200.0), (8000, -200.0),
]

# P.862.2 wideband input filter: flat above 100 Hz.
_WB_CURVE = [(0, -500.0), (50, -75.0), (100, 0.0), (8000, 0.0)]


def _level_align(x, sr):
    """Scale so the 350-3250 Hz mean power hits the calibration target."""
    n = int(2 ** np.ceil(np.log2(max(len(x), 2))))
    spec = np.abs(np.fft.rfft(x, n)) ** 2
    f = np.arange(len(spec)) * (sr / n)
    band = (f >= 350.0) & (f <= 3250.0)
    # mean band power per sample (Parseval: sum|X|^2 / n^2 * 2 ~ power)
    power = 2.0 * np.sum(spec[band]) / (n * float(len(x)))
    return x * np.sqrt(_TARGET_AVG_POWER / (power + _EPS))


def _global_delay(ref, deg, sr):
    """Single global delay estimate (samples): coarse frame-energy
    cross-correlation refined by sample-level cross-correlation."""
    frame = sr // 250  # 4 ms
    n = min(len(ref), len(deg)) // frame
    if n < 8:
        return 0
    re = np.log1p(
        np.sum(ref[: n * frame].reshape(n, frame) ** 2, axis=1)
    )
    de = np.log1p(
        np.sum(deg[: n * frame].reshape(n, frame) ** 2, axis=1)
    )
    re = re - re.mean()
    de = de - de.mean()
    corr = np.correlate(de, re, mode="full")
    coarse = (int(np.argmax(corr)) - (n - 1)) * frame

    # refine ±1 coarse frame at sample resolution on a power envelope
    lo, hi = coarse - frame, coarse + frame
    seg = min(len(ref), len(deg), 4 * sr)
    r = ref[:seg]
    d = deg[:seg]
    best, best_v = coarse, -np.inf
    for delay in range(lo, hi + 1):
        if delay >= 0:
            a, b = r[: seg - delay], d[delay:seg]
        else:
            a, b = r[-delay:seg], d[: seg + delay]
        if len(a) < sr // 4:
            continue
        v = float(np.dot(a, b)) / (
            np.linalg.norm(a) * np.linalg.norm(b) + _EPS
        )
        if v > best_v:
            best_v, best = v, delay
    return best


# --------------------------------------------------------------------------
# Perceptual model
# --------------------------------------------------------------------------


def _bark_power(frames_fft_power, m: _Model):
    """[T, bins] power spectra -> [T, Nb] Bark power densities."""
    bands = np.stack(
        [frames_fft_power[:, mask].sum(axis=1) for mask in m.band_masks],
        axis=1,
    )
    return bands * m.pow_dens_correction[None, :] * (m.sp * _CAL)


def _total_audible(pp, m: _Model, factor: float):
    """Total power of bands above factor * absolute threshold."""
    audible = np.where(pp > factor * m.abs_thresh[None, :], pp, 0.0)
    return audible.sum(axis=1)


def _loudness(pp, m: _Model):
    """Zwicker loudness (Sone) per band."""
    ratio = 0.5 + 0.5 * pp / m.abs_thresh[None, :]
    loud = (
        m.sl
        * (m.abs_thresh[None, :] / 0.5) ** m.zwicker[None, :]
        * (ratio ** m.zwicker[None, :] - 1.0)
    )
    return np.where(pp > m.abs_thresh[None, :], loud, 0.0)


def _sym_disturbance(d, widths):
    """Symmetric per-frame disturbance: scaled width-weighted L2."""
    return _SYM_SCALE * np.sqrt(np.sum((d**2) * widths[None, :], axis=1))


def _time_aggregate(frame_d, split=20, hop=10, p_split=6.0, p_time=2.0):
    """L6 over 20-frame splits, L2 over splits (P.862 aggregation)."""
    t = len(frame_d)
    if t == 0:
        return 0.0
    splits = []
    start = 0
    while start < t:
        # the slice naturally shortens at the tail; no special-casing
        seg = frame_d[start : start + split]
        splits.append(np.mean(seg**p_split) ** (1.0 / p_split))
        start += hop
    s = np.asarray(splits)
    return float(np.mean(s**p_time) ** (1.0 / p_time))


def pesq_raw(ref, deg, sr: int = 16000, mode: str = "wb") -> float:
    """Raw P.862 score in ~[-0.5, 4.5] (before the MOS-LQO mapping)."""
    assert mode in ("wb", "nb")
    assert sr in (8000, 16000), "PESQ is defined for 8 kHz / 16 kHz input"
    if mode == "wb":
        assert sr == 16000, "wideband PESQ requires 16 kHz input"
    m = _model(sr)

    ref = np.asarray(ref, np.float64).reshape(-1) * 32768.0
    deg = np.asarray(deg, np.float64).reshape(-1) * 32768.0
    length = min(len(ref), len(deg))
    ref, deg = ref[:length], deg[:length]
    if length < 4 * m.frame:
        return -0.5

    ref = _level_align(ref, sr)
    deg = _level_align(deg, sr)
    curve = _WB_CURVE if mode == "wb" else _IRS_CURVE
    ref = _fft_filter(ref, sr, curve)
    deg = _fft_filter(deg, sr, curve)

    delay = _global_delay(ref, deg, sr)
    if delay > 0:
        ref, deg = ref[: length - delay], deg[delay:length]
    elif delay < 0:
        ref, deg = ref[-delay:length], deg[: length + delay]

    # framing
    n_frames = (len(ref) - m.frame) // m.shift + 1
    if n_frames < 4:
        return -0.5
    idx = np.arange(n_frames)[:, None] * m.shift + np.arange(m.frame)[None, :]
    ref_f = np.abs(np.fft.rfft(ref[idx] * m.window, axis=1)) ** 2
    deg_f = np.abs(np.fft.rfft(deg[idx] * m.window, axis=1)) ** 2
    pp_ref = _bark_power(ref_f, m)  # [T, Nb]
    pp_deg = _bark_power(deg_f, m)

    # partial frequency compensation: equalize the reference toward the
    # degraded channel's time-averaged response (computed on active frames)
    active = _total_audible(pp_ref, m, 100.0) > 1e7 * _CAL
    if not active.any():
        active = np.ones(n_frames, bool)
    avg_ref = pp_ref[active].mean(axis=0)
    avg_deg = pp_deg[active].mean(axis=0)
    ratio = np.clip((avg_deg + 1000.0) / (avg_ref + 1000.0), 0.01, 100.0)
    pp_ref = pp_ref * ratio[None, :]

    # short-term gain compensation: scale the reference frame to track the
    # degraded signal's slow gain variation (first-order smoothed)
    p_ref_t = _total_audible(pp_ref, m, 1.0)
    p_deg_t = _total_audible(pp_deg, m, 1.0)
    gain = (p_deg_t + 5e3 * _CAL) / (p_ref_t + 5e3 * _CAL)
    smooth = np.empty_like(gain)
    acc = gain[0]
    for t in range(n_frames):
        acc = 0.2 * acc + 0.8 * gain[t]
        smooth[t] = acc
    smooth = np.clip(smooth, 3e-4, 5.0)
    pp_ref = pp_ref * smooth[:, None]

    loud_ref = _loudness(pp_ref, m)
    loud_deg = _loudness(pp_deg, m)

    # center-clipped loudness difference (the "deadzone" models masking)
    d = loud_deg - loud_ref
    dead = 0.25 * np.minimum(loud_deg, loud_ref)
    d = np.sign(d) * np.maximum(np.abs(d) - dead, 0.0)

    # asymmetry: added distortions hurt more than removed ones
    asym = ((pp_deg + 50.0 * _CAL) / (pp_ref + 50.0 * _CAL)) ** 1.2
    asym = np.where(asym < 3.0, 0.0, np.minimum(asym, 12.0))

    d_sym = _sym_disturbance(d, m.width_bark)  # [T]
    d_asym = np.sum(
        np.abs(d) * asym * m.width_bark[None, :], axis=1
    ) / _ASYM_DIV

    # frame weighting by audible reference power, cap at 45
    weight = (
        (_total_audible(pp_ref, m, 1.0) + 1e5 * _CAL) / (1e7 * _CAL)
    ) ** 0.04
    d_sym = np.minimum(d_sym / weight, 45.0)
    d_asym = np.minimum(d_asym / weight, 45.0)

    dist_sym = _time_aggregate(d_sym)
    dist_asym = _time_aggregate(d_asym)
    return float(4.5 - 0.1 * dist_sym - 0.0309 * dist_asym)


def pesq(ref, deg, sr: int = 16000, mode: str = "wb") -> float:
    """PESQ MOS-LQO: P.862.2 mapping for ``mode='wb'``, P.862.1 for 'nb'.

    ref/deg: float waveforms in [-1, 1]. Returns ~[1.02, 4.64] (wb) /
    ~[1.02, 4.55] (nb).
    """
    raw = pesq_raw(ref, deg, sr=sr, mode=mode)
    a, b = _MAPPING[mode]
    return float(0.999 + 4.0 / (1.0 + np.exp(-a * raw + b)))
