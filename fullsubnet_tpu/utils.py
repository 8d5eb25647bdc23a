"""Small framework utilities (reference twin: ``audio_zen/utils.py``)."""

from __future__ import annotations

import importlib
import os
import time
from pathlib import Path


class ExecutionTime:
    """Wall-clock timer: ``t = ExecutionTime(); ...; t.duration()`` seconds."""

    def __init__(self):
        self.start = time.time()

    def duration(self) -> float:
        return time.time() - self.start


def expand_path(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


def basename(path: str):
    return os.path.splitext(os.path.basename(path))


def prepare_empty_dir(dirs: list[Path], resume: bool = False):
    """Create (or, on resume, require) a list of directories."""
    for dir_path in dirs:
        if resume:
            assert dir_path.exists(), (
                "In resume mode, the experiment directory should exist."
            )
        else:
            dir_path.mkdir(parents=True, exist_ok=True)


def check_nan(tree, name: str = "tree") -> bool:
    """True (and print) if any leaf of a pytree contains NaN."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    bad = False
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if np.any(np.isnan(np.asarray(jnp.asarray(leaf)))):
            print(f"NaN in {name}{jax.tree_util.keystr(path)}")
            bad = True
    return bad


def initialize_module(path: str, args: dict | None = None, initialize: bool = True):
    """Dynamic import by dotted path — compatibility shim for reference-style
    configs (``audio_zen/utils.py:70-105``). Prefer the typed registry in
    :mod:`fullsubnet_tpu.config`; this exists so user extensions keep working.
    """
    module_path = ".".join(path.split(".")[:-1])
    class_name = path.split(".")[-1]
    module = importlib.import_module(module_path)
    cls = getattr(module, class_name)
    if initialize:
        return cls(**(args or {}))
    return cls


def print_tensor_info(tensor, flag: str = "Tensor"):
    import numpy as np

    t = np.asarray(tensor)
    print(
        f"{flag}\tmax: {t.max():.3e}, min: {t.min():.3e}, "
        f"mean: {t.mean():.3e}, std: {t.std():.3e}"
    )


def enable_compilation_cache(
    cache_dir: str | None = None, min_compile_seconds: float = 1.0
) -> str | None:
    """Turn on XLA's persistent compilation cache.

    Through a remote-compile relay the first flagship compile takes
    minutes; persisting compiled executables across processes makes
    restarts, resumes, and repeated CLI invocations start hot. The
    directory comes from (in priority order) the ``cache_dir`` argument
    (CLIs pass ``config["meta"]["compilation_cache_dir"]``) or the
    ``FULLSUBNET_COMPILE_CACHE`` environment variable; returns the
    resolved path, or None when neither is set (cache stays off).
    """
    import jax

    path = cache_dir or os.environ.get("FULLSUBNET_COMPILE_CACHE")
    if not path:
        return None
    resolved = str(Path(path).expanduser().absolute())
    os.makedirs(resolved, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", resolved)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", float(min_compile_seconds)
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return resolved
