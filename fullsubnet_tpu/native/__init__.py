"""ctypes bindings for the native host-DSP core (``mixer.cpp``).

The shared library is built lazily with the system g++ on first use and
cached next to the source; every entry point has a NumPy fallback so the
framework works without a toolchain. ``available()`` reports whether the
native path is active.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import platform
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "mixer.cpp"


def _cpu_tag() -> str:
    """Microarchitecture fingerprint for the cached -march=native build.

    A pod may share one checkout over NFS across hosts with different
    CPUs; keying the cache on the ISA feature set keeps one host's
    AVX-512 build from SIGILL-ing another."""
    ident = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    ident += line
                    break
    except OSError:
        pass
    # also key on the TOOLCHAIN: two hosts with identical CPU flags but
    # incompatible g++/libstdc++ would otherwise clobber each other's
    # shared-checkout artifact on every import (each host's _open fails
    # -> rebuild -> overwrite)
    try:
        ident += subprocess.run(
            ["g++", "-dumpfullversion", "-dumpversion"],
            capture_output=True, timeout=10, text=True,
        ).stdout
    except Exception:
        pass
    return hashlib.md5(ident.encode()).hexdigest()[:10]


_LIB_PATH = _HERE / f"libfsn_mixer-{_cpu_tag()}.so"
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build() -> bool:
    # the library is built lazily on the machine it runs on, so
    # -march=native is safe (the cache name carries the CPU tag); fall
    # back to portable flags if the local toolchain rejects it. NO
    # -ffast-math: gcc links crtfastmath.o into shared libs, which sets
    # the process-global FTZ/DAZ FP flags on dlopen and silently changes
    # subnormal handling everywhere.
    flag_sets = [
        ["-O3", "-march=native"],
        ["-O3"],
    ]
    tmp_path = _LIB_PATH.with_suffix(f".tmp-{os.getpid()}.so")
    for flags in flag_sets:
        try:
            subprocess.run(
                [
                    "g++", *flags, "-std=c++17", "-shared", "-fPIC",
                    str(_SRC), "-o", str(tmp_path),
                ],
                check=True,
                capture_output=True,
                timeout=120,
            )
            os.replace(tmp_path, _LIB_PATH)  # atomic vs concurrent builds
            return True
        except Exception:
            continue
        finally:
            tmp_path.unlink(missing_ok=True)
    return False


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None

        def _open(path):
            """None when the .so doesn't load or has the wrong ABI —
            e.g. a cache built by another host (shared checkout) against
            an incompatible libstdc++, or a stale symbol-less binary."""
            try:
                lib = ctypes.CDLL(str(path))
                if lib.fsn_abi_version() != 1:
                    return None
                return lib
            except (OSError, AttributeError):
                return None

        lib = _open(_LIB_PATH)
        if lib is None:
            # the cached artifact is unusable HERE: rebuild locally once
            # before giving up on the native path
            if not _build():
                return None
            lib = _open(_LIB_PATH)
            if lib is None:
                return None

        fp = ctypes.POINTER(ctypes.c_float)
        lib.fsn_fft_convolve_trunc.argtypes = [
            fp, ctypes.c_int64, fp, ctypes.c_int64, fp
        ]
        lib.fsn_snr_mix.argtypes = [
            fp, fp, ctypes.c_int64, fp, ctypes.c_int64,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ]
        lib.fsn_frame_energies_db.argtypes = [
            fp, ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
            fp, ctypes.POINTER(ctypes.c_int64),
        ]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def _as_f32(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x, dtype=np.float32))


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def fft_convolve_trunc(x, h) -> np.ndarray:
    """Linear convolution truncated to len(x) (fftconvolve(x, h)[:len(x)])."""
    lib = _load()
    x = _as_f32(x)
    h = _as_f32(h)
    if lib is None:
        from scipy.signal import fftconvolve

        return fftconvolve(x, h)[: len(x)].astype(np.float32)
    out = np.empty_like(x)
    lib.fsn_fft_convolve_trunc(_ptr(x), len(x), _ptr(h), len(h), _ptr(out))
    return out


def snr_mix(
    clean,
    noise,
    snr: float,
    target_dbfs: float,
    noisy_target_dbfs: float,
    rir=None,
    eps: float = 1e-6,
):
    """Native full SNR mix; returns (noisy, clean). RNG-free: the caller
    draws ``noisy_target_dbfs`` (and the RIR channel) beforehand."""
    lib = _load()
    if lib is None:
        return None  # caller falls back to the NumPy path
    clean = _as_f32(clean).copy()
    noise = _as_f32(noise).copy()
    assert len(clean) == len(noise)
    if rir is not None:
        rir = _as_f32(rir)
        rp, rl = _ptr(rir), len(rir)
    else:
        rp, rl = ctypes.cast(None, ctypes.POINTER(ctypes.c_float)), 0
    lib.fsn_snr_mix(
        _ptr(clean), _ptr(noise), len(clean), rp, rl,
        float(snr), float(target_dbfs), float(noisy_target_dbfs), float(eps),
    )
    return noise, clean  # noise buffer holds the mixed noisy signal


def frame_energies_db(x, window: int, eps: float = 1e-6) -> np.ndarray:
    lib = _load()
    x = _as_f32(x)
    n_frames = -(-len(x) // window)
    if lib is None:
        out = []
        for s in range(0, len(x), window):
            w = x[s : s + window]
            out.append(20 * np.log10(np.sum(w.astype(np.float64) ** 2) + eps))
        return np.asarray(out, dtype=np.float32)
    out = np.empty(n_frames, dtype=np.float32)
    cnt = ctypes.c_int64(0)
    lib.fsn_frame_energies_db(
        _ptr(x), len(x), window, eps, _ptr(out), ctypes.byref(cnt)
    )
    return out[: cnt.value]
