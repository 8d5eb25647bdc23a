"""Cross-check the native PESQ against the ITU ``pesq`` C extension.

Run on any machine where the ``pesq`` package (the ITU P.862 reference
C code) is installed:

    python tools/pesq_goldens.py [--out tests/data/pesq_goldens.json]

Scores the deterministic calibration testbed (tools/pesq_calibrate.py —
synthetic speech + white/pink/babble/hum noise at SNR 0-25 dB, fixed
seeds) with BOTH implementations, reports per-clip deltas, and records
golden (seed, snr, mode, itu_score, native_score) tuples. The goldens
file, when present, is regression-checked by tests/test_pesq_goldens.py
so any machine can verify the native implementation against previously
recorded ITU scores without having the C extension installed.

In this build environment the ``pesq`` package is absent (documented in
docs/parity.md); the tool then reports native-only scores and exits 0
without writing goldens.

Reference parity: the reference depends on the same C extension at
``/root/reference/audio_zen/metrics.py:2`` — these goldens certify the
substitution.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fullsubnet_tpu import pesq as native  # noqa: E402
from tools.pesq_calibrate import build_testbed  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tests/data/pesq_goldens.json")
    ap.add_argument("--clips", type=int, default=24)
    ap.add_argument("--seconds", type=float, default=8.0)
    args = ap.parse_args()

    try:
        from pesq import pesq as itu_pesq  # type: ignore
    except ImportError:
        itu_pesq = None
        print("ITU `pesq` package not installed — native-only report; "
              "no goldens written.")

    sr = 16000
    clips = build_testbed(args.clips, args.seconds, sr)
    rows = []
    deltas = {"wb": [], "nb": []}
    for i, (sp, noisy, snr, kind) in enumerate(clips):
        for mode in ("wb", "nb"):
            ours = float(native.pesq(sp, noisy, sr, mode))
            row = {
                "clip": i, "snr_db": round(snr, 2), "noise": kind,
                "mode": mode, "native": round(ours, 4),
            }
            if itu_pesq is not None:
                theirs = float(itu_pesq(sr, np.asarray(sp), np.asarray(noisy), mode))
                row["itu"] = round(theirs, 4)
                deltas[mode].append(ours - theirs)
            rows.append(row)
            print(row)

    if itu_pesq is not None:
        for mode in ("wb", "nb"):
            d = np.asarray(deltas[mode])
            print(f"{mode}: mean delta {d.mean():+.3f}  "
                  f"mean |delta| {np.abs(d).mean():.3f}  max |delta| "
                  f"{np.abs(d).max():.3f}")
        out = Path(args.out)
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(json.dumps({
            "testbed": {"clips": args.clips, "seconds": args.seconds},
            "rows": rows,
        }, indent=1))
        print(f"goldens written to {out}")


if __name__ == "__main__":
    main()
