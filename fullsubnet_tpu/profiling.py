"""Tracing / profiling utilities.

The reference has essentially no profiling (wall-clock ``ExecutionTime``
only, SURVEY §5). Here profiling is first-class and TPU-native:

* ``trace(logdir)``           — context manager around ``jax.profiler``
  producing TensorBoard-viewable XLA traces (op-level timeline, HBM usage).
* ``annotate(name)``          — named trace span (shows up in the timeline).
* ``timed(fn)``               — median wall time of a jitted callable with
  a forced host sync (correct on async/tunneled backends).
* ``device_memory_stats()``   — per-device HBM live-bytes snapshot.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span inside a trace: ``with annotate('sb_stage'): ...``."""
    return jax.profiler.TraceAnnotation(name)


def timed(fn, *args, iters: int = 10, warmup: int = 2) -> float:
    """Median seconds per call of ``fn(*args)`` with forced host sync."""
    import jax.numpy as jnp

    def run():
        out = fn(*args)
        leaves = jax.tree.leaves(out)
        if leaves:
            float(jnp.sum(leaves[0]))

    for _ in range(warmup):
        run()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def device_memory_stats() -> dict:
    """{device: {bytes_in_use, peak_bytes_in_use, ...}} where supported."""
    stats = {}
    for d in jax.devices():
        try:
            stats[str(d)] = d.memory_stats()
        except Exception:
            stats[str(d)] = {}
    return stats
