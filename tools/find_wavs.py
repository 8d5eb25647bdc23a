#!/usr/bin/env python
"""Build a wav path list file from directories.

Twin of the reference ``tools/find_wavs.py``, generalized into a CLI:

    python tools/find_wavs.py --dirs a/noisy b/noisy --output train.txt \
        [--format plain|spk]

``plain`` writes one absolute path per line (scp format consumed by the
training dataset); ``spk`` writes the reference's annotated format.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from fullsubnet_tpu.data.datasets import find_audio_files


def main(args):
    file_path_list = []
    for dataset_dir in args.dirs:
        file_path_list += find_audio_files(Path(dataset_dir).expanduser().absolute())
    print(f"Length: {len(file_path_list)}")

    out = Path(args.output).expanduser().absolute()
    with open(out, "w") as f:
        for i, line in enumerate(file_path_list):
            if args.format == "spk":
                f.write(f"spk1___{i}___utt1___90___0_300\t{line}\n")
            else:
                f.write(f"{line}\n")
    print(f"Wrote {out}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dirs", nargs="+", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--format", choices=["plain", "spk"], default="plain")
    main(parser.parse_args())
