"""Training entry point.

Twin of ``recipes/dns_interspeech_2020/train.py``:

    python -m fullsubnet_tpu.train.cli -C recipes/dns_interspeech_2020/fullsubnet/train.toml [-R] [-V] [-P path]

No torchrun: SPMD distribution is handled by the JAX runtime (one process
per host on a pod; the trainer shards the batch over the mesh).
"""

import argparse
import random

import numpy as np

from fullsubnet_tpu.config import experiment_name_from_config_path, load_config
from fullsubnet_tpu.train.trainer import Trainer


def main(argv=None):
    parser = argparse.ArgumentParser(description="FullSubNet-TPU training")
    parser.add_argument(
        "-C", "--configuration", required=True, type=str,
        help="Configuration (*.toml).",
    )
    parser.add_argument(
        "-R", "--resume", action="store_true",
        help="Resume the experiment from latest checkpoint.",
    )
    parser.add_argument(
        "-V", "--only_validation", action="store_true",
        help="Only run validation (debugging).",
    )
    parser.add_argument(
        "-P", "--preloaded_model_path", type=str, default=None,
        help="Warm-start weights (torch .tar/.pth or Orbax dir).",
    )
    parser.add_argument(
        "-O", "--output_dir", type=str, default=None,
        help="Override meta.save_dir.",
    )
    args = parser.parse_args(argv)

    if args.preloaded_model_path is not None:
        assert not args.resume, "The 'resume' conflicts with 'preloaded_model_path'."

    # multi-host TPU pods: one process per host; the JAX runtime wires the
    # mesh (replaces torchrun + NCCL rendezvous)
    import os

    if os.environ.get("FULLSUBNET_DISTRIBUTED", "").lower() in ("1", "true"):
        import jax

        jax.distributed.initialize()

    config = load_config(args.configuration)
    seed = int(config.get("meta", {}).get("seed", 0))
    random.seed(seed)
    np.random.seed(seed)

    trainer = Trainer(
        config=config,
        resume=args.resume,
        only_validation=args.only_validation,
        preloaded_model_path=args.preloaded_model_path,
        output_dir=args.output_dir,
        experiment_name=experiment_name_from_config_path(args.configuration),
    )
    trainer.train()


if __name__ == "__main__":
    main()
