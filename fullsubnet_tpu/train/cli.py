"""Training entry point.

Twin of ``recipes/dns_interspeech_2020/train.py``:

    python -m fullsubnet_tpu.train.cli -C recipes/dns_interspeech_2020/fullsubnet/train.toml [-R] [-V] [-P path]

No torchrun: SPMD distribution is handled by the JAX runtime (one process
per host on a pod; the trainer shards the batch over the mesh).

Multi-host / multi-slice launch (replaces the reference's
``torchrun ... train.py`` + NCCL rendezvous, ``train.py:29``):

* Single TPU slice, N hosts — run this CLI once per host with
  ``FULLSUBNET_DISTRIBUTED=1``. On TPU pods ``jax.distributed
  .initialize()`` discovers coordinator/process_id/process_count from
  the TPU metadata; elsewhere pass them explicitly via
  ``--coordinator host:port --num-processes N --process-id I``.
* Multiple slices over DCN — same launch, one process per host across
  all slices, plus ``[trainer.mesh] slices = <num_slices>`` in the TOML.
  The mesh lays the data axis out slice-major (sub-band parallelism
  never crosses DCN); gradient all-reduce then reduces over ICI within
  each slice and crosses DCN once (see ``parallel/mesh.py:make_mesh``).
* Per-host data loading needs no sampler config: the loader shards by
  ``jax.process_index()`` (see ``parallel/mesh.py:local_shard_info``).
"""

import argparse
import random

import numpy as np

from fullsubnet_tpu.config import experiment_name_from_config_path, load_config
from fullsubnet_tpu.train.trainer import Trainer


def _wants_distributed(args, environ) -> bool:
    """Any explicit distributed-launch argument triggers initialization —
    silently ignoring --num-processes/--process-id would train standalone
    and write conflicting checkpoints from every process."""
    return (
        args.coordinator is not None
        or args.num_processes is not None
        or args.process_id is not None
        or environ.get("FULLSUBNET_DISTRIBUTED", "").lower() in ("1", "true")
    )


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
    parser.add_argument(
        "--coordinator", type=str, default=None,
        help="Distributed coordinator address host:port (optional on TPU "
        "pods, where it is discovered from the platform metadata).",
    )
    parser.add_argument(
        "--num-processes", type=int, default=None,
        help="Total process count for jax.distributed.initialize().",
    )
    parser.add_argument(
        "--process-id", type=int, default=None,
        help="This process's index for jax.distributed.initialize().",
    )
    args = parser.parse_args(argv)

    if args.preloaded_model_path is not None:
        assert not args.resume, "The 'resume' conflicts with 'preloaded_model_path'."

    # multi-host TPU pods: one process per host; the JAX runtime wires the
    # mesh (replaces torchrun + NCCL rendezvous)
    import os

    if _wants_distributed(args, os.environ):
        import jax

        kwargs = {}
        if args.coordinator is not None:
            kwargs["coordinator_address"] = args.coordinator
        if args.num_processes is not None:
            kwargs["num_processes"] = args.num_processes
        if args.process_id is not None:
            kwargs["process_id"] = args.process_id
        jax.distributed.initialize(**kwargs)

    config = load_config(args.configuration)
    from fullsubnet_tpu.utils import enable_compilation_cache

    enable_compilation_cache(
        config.get("meta", {}).get("compilation_cache_dir")
    )
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
    # host-RSS recycle re-exec target ([trainer.train] host_rss_recycle_gb):
    # same launch, resumed from the `latest` checkpoint the recycle wrote.
    # -P must not carry over (it conflicts with -R and the warm-start
    # weights are already in the checkpoint).
    import sys

    recycle = [sys.executable, "-m", "fullsubnet_tpu.train.cli",
               "-C", args.configuration, "-R"]
    if args.output_dir is not None:
        recycle += ["-O", args.output_dir]
    trainer.recycle_argv = recycle
    trainer.train()


if __name__ == "__main__":
    main()
