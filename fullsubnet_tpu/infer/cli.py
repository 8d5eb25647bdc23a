"""Inference entry point.

Twin of ``recipes/dns_interspeech_2020/inference.py``:

    python -m fullsubnet_tpu.infer.cli \
        -C recipes/dns_interspeech_2020/fullsubnet/inference.toml \
        -M /path/to/best_model.tar -O /path/to/output
"""

import argparse

from fullsubnet_tpu.config import load_config
from fullsubnet_tpu.infer.inferencer import Inferencer
from fullsubnet_tpu.utils import enable_compilation_cache


def main(argv=None):
    parser = argparse.ArgumentParser(description="FullSubNet-TPU inference")
    parser.add_argument(
        "-C", "--configuration", type=str, required=True,
        help="Config file (*.toml).",
    )
    parser.add_argument(
        "-M", "--model_checkpoint_path", type=str, required=True,
        help="Checkpoint: torch .tar/.pth or Orbax directory.",
    )
    parser.add_argument(
        "-O", "--output_dir", type=str, required=True,
        help="Where enhanced (and noisy copies) are written.",
    )
    args = parser.parse_args(argv)

    config = load_config(args.configuration)
    enable_compilation_cache(
        config.get("meta", {}).get("compilation_cache_dir")
    )
    inferencer = Inferencer(
        config, args.model_checkpoint_path, args.output_dir
    )
    inferencer()


if __name__ == "__main__":
    main()
