#!/usr/bin/env python
"""Build clean-speech scp lists for training.

Twin of the reference ``tools/preprocessing_dataset.py``: walk a clean
speech corpus, keep files that are >= min duration, non-clipped, and
sufficiently voiced (activity >= threshold), accumulating until a target
number of hours is reached.

    python tools/preprocessing_dataset.py \
        --dataset_dir /data/clean --output clean_0.6.txt \
        --target_hours 500 --activity_threshold 0.6
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from fullsubnet_tpu.acoustics.feature import activity_detector, is_clipped
from fullsubnet_tpu.data.datasets import find_audio_files
from fullsubnet_tpu.data.wavio import read_wav


def main(args):
    paths = find_audio_files(Path(args.dataset_dir).expanduser().absolute())
    print(f"Found {len(paths)} candidate files.")

    accumulated_seconds = 0.0
    target_seconds = args.target_hours * 3600
    kept = []
    for p in paths:
        try:
            y, sr = read_wav(p, sr=args.sr, mono=True)
        except Exception as e:
            print(f"[skip] {p}: {e}")
            continue
        duration = len(y) / sr
        if duration < args.min_duration:
            continue
        if is_clipped(y):
            continue
        if activity_detector(y, fs=sr) < args.activity_threshold:
            continue
        kept.append(p)
        accumulated_seconds += duration
        if accumulated_seconds >= target_seconds:
            break

    out = Path(args.output).expanduser().absolute()
    out.write_text("\n".join(kept) + "\n")
    print(
        f"Kept {len(kept)} files ({accumulated_seconds / 3600:.2f} h) -> {out}"
    )


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_dir", required=True, type=str)
    parser.add_argument("--output", required=True, type=str)
    parser.add_argument("--sr", type=int, default=16000)
    parser.add_argument("--min_duration", type=float, default=3.0)
    parser.add_argument("--activity_threshold", type=float, default=0.6)
    parser.add_argument("--target_hours", type=float, default=1e9)
    main(parser.parse_args())
