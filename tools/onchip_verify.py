"""On-chip verification drive for the round-3 inference/serving features.

Runs, on the REAL TPU backend (plain ``python tools/onchip_verify.py``),
the surfaces that previously had only CPU test coverage, and checks each
against an independently-computed oracle:

* ``fullsubnet_batched``  — batched bucketed inference
  (``[inferencer] batch_size = 4`` with FullSubNet ``full_band_crm_mask``,
  ``infer/inferencer.py:_call_batched``) vs the serial bucketed path on
  the same utterances. Reference semantics being certified:
  ``recipes/dns_interspeech_2020/inferencer.py:130-145`` (upstream).
* ``improved_batched``    — the wave-to-wave ``time_domain`` batched path
  (per-example ``valid_samples``) vs serial.
* ``fast_bucketed``       — Fast FullSubNet's dual-clock masked statistics
  (``models/fast_fullsubnet.py`` bucketed ``valid_frames``) vs the exact
  unbucketed compile of each length.
* ``serving_batch``       — ``python -m fullsubnet_tpu.serving --batch 4``
  artifact loaded + called in a SUBPROCESS that asserts the model source
  (``fullsubnet_tpu.models``) is never imported; outputs vs the live
  Inferencer's.
* ``serving_streaming``   — ``--streaming`` artifact (init/hop programs)
  driven hop-by-hop in the same no-model-code subprocess vs the live
  ``StreamingEnhancer`` output.
* ``serving_multistream`` — ``--streaming --streams 4`` artifact: two live
  lanes advanced per batched tick; per-lane output vs the single-stream
  serving output (lanes are independent by construction).

Weights are random (quality is covered by ``tests/test_quality_regression
.py`` on CPU; what only the chip can prove is that these programs compile
through the remote relay, run, and agree across paths). Each section
prints PASS/FAIL with max-abs-diff evidence; ``--log`` appends a
machine-readable JSON line per section (committed as
``VERIFY_ONCHIP_r04.md``).

Usage:
    python tools/onchip_verify.py                  # all sections
    python tools/onchip_verify.py --only fast_bucketed,serving_batch
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys
import tempfile
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# persistent compile cache: reruns of this driver (and the CLIs) start hot
os.environ.setdefault("FULLSUBNET_COMPILE_CACHE", "/tmp/fsn_compile_cache")

import numpy as np  # noqa: E402

SR = 16000
# all six utterances land in ONE 3 s bucket (bucket_seconds=1 default:
# ceil((L + n_fft) / sr) * sr = 48000 for 2.0 s < L <= 2.97 s) — one
# remote compile per (family, batch-shape) instead of one per length
WAV_SECONDS = [2.17, 2.43, 2.62, 2.81, 2.29, 2.55]


def _wavs(tmp: pathlib.Path) -> pathlib.Path:
    from fullsubnet_tpu.data.wavio import write_wav

    d = tmp / "noisy"
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    for i, sec in enumerate(WAV_SECONDS):
        n = int(sec * SR)
        t = np.arange(n) / SR
        clean = 0.3 * np.sin(2 * np.pi * (180 + 40 * i) * t)
        noise = 0.08 * rng.standard_normal(n)
        write_wav(d / f"utt{i}.wav", (clean + noise).astype(np.float32), SR)
    return d


def _checkpoint(tmp: pathlib.Path, model, name: str) -> str:
    import jax

    from fullsubnet_tpu.checkpoint import CheckpointManager

    params = model.init(jax.random.PRNGKey(0), weight_init=False)
    mgr = CheckpointManager(tmp / f"ckpt_{name}")
    mgr.save({"params": params}, epoch=0, keep_weights_history=False)
    return str(tmp / f"ckpt_{name}" / "latest")


def _config(model_path: str, model_args: dict, strategy: str,
            noisy_dir: pathlib.Path, batch_size: int = 1,
            bucket_seconds: float | None = None,
            hop_length: int = 256) -> dict:
    inferencer: dict = {"path": "inferencer.Inferencer", "type": strategy}
    if batch_size > 1:
        inferencer["batch_size"] = batch_size
    if bucket_seconds is not None:
        inferencer["bucket_seconds"] = bucket_seconds
    return {
        "acoustics": {
            "n_fft": 512, "win_length": 512, "sr": SR,
            "hop_length": hop_length,
        },
        "inferencer": inferencer,
        "dataset": {
            "path": "dataset_inference.Dataset",
            "args": {"dataset_dir_list": [str(noisy_dir)], "sr": SR},
        },
        "model": {"path": model_path, "args": dict(model_args)},
    }


from tools.recipe_blocks import model_args as _recipe_args  # noqa: E402

# shipped-recipe ctor kwargs — single source: tools/recipe_blocks.py
FULLSUBNET_ARGS = _recipe_args("fullsubnet")
FAST_ARGS = _recipe_args("fast_fullsubnet")
IMPROVED_ARGS = _recipe_args("improved_fullsubnet")


def _read_dir(d: pathlib.Path) -> dict[str, np.ndarray]:
    from fullsubnet_tpu.data.wavio import read_wav

    return {p.stem: read_wav(p, sr=SR)[0] for p in sorted(d.glob("*.wav"))}


def _compare(a: dict, b: dict, atol: float) -> tuple[bool, float]:
    assert set(a) == set(b), (sorted(a), sorted(b))
    worst = 0.0
    for k in a:
        assert a[k].shape == b[k].shape, (k, a[k].shape, b[k].shape)
        worst = max(worst, float(np.max(np.abs(a[k] - b[k]))))
    return worst <= atol, worst


class Section:
    def __init__(self, name: str, log_path: str | None):
        self.name, self.log_path, self.t0 = name, log_path, time.time()
        print(f"\n=== {name} ===", flush=True)

    def done(self, ok: bool, **evidence):
        rec = {
            "section": self.name, "ok": bool(ok),
            "seconds": round(time.time() - self.t0, 1),
            "backend": _backend(), **evidence,
        }
        print(("PASS " if ok else "FAIL ") + json.dumps(rec), flush=True)
        if self.log_path:
            with open(self.log_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        if not ok:
            raise SystemExit(f"section {self.name} FAILED: {rec}")


def _backend() -> str:
    import jax

    return jax.default_backend()


def _run_inferencer(config: dict, ckpt: str, out: pathlib.Path) -> dict:
    from fullsubnet_tpu.infer.inferencer import Inferencer

    Inferencer(config, ckpt, str(out))()
    return _read_dir(out / "enhanced")


def sec_fullsubnet_batched(tmp, noisy_dir, log):
    """Batched bucketed (batch_size=4, two flushes: one full batch + one
    padded partial) must match the serial bucketed path bit-closely."""
    s = Section("fullsubnet_batched", log)
    from fullsubnet_tpu.config import build_model

    cfg = _config("fullsubnet.model.Model", FULLSUBNET_ARGS,
                  "full_band_crm_mask", noisy_dir)
    model, _ = build_model(cfg)
    ckpt = _checkpoint(tmp, model, "fullsubnet")
    serial = _run_inferencer(cfg, ckpt, tmp / "fsn_serial")
    cfg_b = _config("fullsubnet.model.Model", FULLSUBNET_ARGS,
                    "full_band_crm_mask", noisy_dir, batch_size=4)
    batched = _run_inferencer(cfg_b, ckpt, tmp / "fsn_batched")
    for k, v in batched.items():
        assert np.isfinite(v).all(), k
    ok, worst = _compare(serial, batched, atol=2e-3)
    s.done(ok, max_abs_diff=worst, utterances=len(batched),
           checkpoint=ckpt)
    return ckpt, serial


def sec_improved_batched(tmp, noisy_dir, log):
    s = Section("improved_batched", log)
    from fullsubnet_tpu.config import build_model

    cfg = _config("improved_fullsubnet.model.Model", IMPROVED_ARGS,
                  "time_domain", noisy_dir, hop_length=128)
    model, _ = build_model(cfg)
    ckpt = _checkpoint(tmp, model, "improved")
    serial = _run_inferencer(cfg, ckpt, tmp / "imp_serial")
    cfg_b = _config("improved_fullsubnet.model.Model", IMPROVED_ARGS,
                    "time_domain", noisy_dir, batch_size=4, hop_length=128)
    batched = _run_inferencer(cfg_b, ckpt, tmp / "imp_batched")
    for k, v in batched.items():
        assert np.isfinite(v).all(), k
    ok, worst = _compare(serial, batched, atol=2e-3)
    s.done(ok, max_abs_diff=worst, utterances=len(batched))


def sec_fast_bucketed(tmp, noisy_dir, log):
    """The bucketed dual-clock (mel frames + downsampled bottleneck)
    masked statistics must reproduce the exact unbucketed run. Uses two
    utterances (one exact compile each on the relay)."""
    s = Section("fast_bucketed", log)
    from fullsubnet_tpu.config import build_model
    from fullsubnet_tpu.data.wavio import read_wav, write_wav

    small = tmp / "noisy_fast"
    small.mkdir(exist_ok=True)
    for name in ("utt0", "utt3"):
        w, _ = read_wav(noisy_dir / f"{name}.wav", sr=SR)
        write_wav(small / f"{name}.wav", w, SR)
    cfg = _config("fast_fullsubnet.model.Model", FAST_ARGS,
                  "full_band_crm_mask", small)
    model, _ = build_model(cfg)
    ckpt = _checkpoint(tmp, model, "fast")
    bucketed = _run_inferencer(cfg, ckpt, tmp / "fast_bucketed")
    cfg_exact = _config("fast_fullsubnet.model.Model", FAST_ARGS,
                        "full_band_crm_mask", small, bucket_seconds=0.0)
    exact = _run_inferencer(cfg_exact, ckpt, tmp / "fast_exact")
    ok, worst = _compare(exact, bucketed, atol=2e-3)
    s.done(ok, max_abs_diff=worst, utterances=len(bucketed))


_SUBPROC_TEMPLATE = r"""
import json, sys
import numpy as np

sys.path.insert(0, {repo!r})
{body}
loaded = [m for m in sys.modules
          if m.startswith(("fullsubnet_tpu.models", "fullsubnet_tpu.nn",
                           "fullsubnet_tpu.ops", "fullsubnet_tpu.infer.inferencer",
                           "fullsubnet_tpu.infer.streaming"))]
assert not loaded, f"serving artifact pulled in model source code: {{loaded}}"
print("SUBPROC_OK " + json.dumps(evidence))
"""


def _no_model_code_subprocess(body: str) -> dict:
    """Run `body` (which must define `evidence: dict`) in a fresh python
    that may import fullsubnet_tpu.serving but asserts the model source
    modules are never loaded — the 'serve without model code' contract."""
    script = _SUBPROC_TEMPLATE.format(repo=str(REPO), body=body)
    # PYTHONPATH must be APPENDED to, not replaced: the interpreter-level
    # sitecustomize (remote-TPU plugin registration) lives on it
    ppath = os.environ.get("PYTHONPATH", "")
    env = {**os.environ,
           "PYTHONPATH": f"{REPO}{os.pathsep}{ppath}" if ppath else str(REPO)}
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        env=env, timeout=3600,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"no-model-code subprocess failed:\n{proc.stdout}\n{proc.stderr}"
        )
    for line in proc.stdout.splitlines():
        if line.startswith("SUBPROC_OK "):
            return json.loads(line[len("SUBPROC_OK "):])
    raise RuntimeError(f"no SUBPROC_OK line in:\n{proc.stdout}")


def sec_serving_batch(tmp, noisy_dir, log, ckpt, serial):
    """--batch 4 artifact: export via the CLI module, load + call in a
    no-model-code subprocess, compare (after the CLI's 0.8 FS peak
    normalization) against the live Inferencer's outputs."""
    s = Section("serving_batch", log)
    from fullsubnet_tpu import serving

    cfg = _config("fullsubnet.model.Model", FULLSUBNET_ARGS,
                  "full_band_crm_mask", noisy_dir)
    art = tmp / "artifact_batch"
    serving.export_enhancer(cfg, ckpt, art, seconds=(3,), batch=4,
                            overwrite=True)
    waves = _read_dir(noisy_dir)
    names = sorted(waves)
    np.savez(tmp / "serving_in.npz", **{k: waves[k] for k in names})
    body = f"""
from fullsubnet_tpu.serving import ServingModel

data = np.load({str(tmp / 'serving_in.npz')!r})
names = sorted(data.files)
served = ServingModel.load({str(art)!r})
outs = served.enhance_batch([data[k] for k in names])
np.savez({str(tmp / 'serving_out.npz')!r}, **dict(zip(names, outs)))
evidence = {{"lengths": [int(len(o)) for o in outs],
             "finite": bool(all(np.isfinite(o).all() for o in outs))}}
"""
    ev = _no_model_code_subprocess(body)
    assert ev["finite"], ev
    out = np.load(tmp / "serving_out.npz")
    # live Inferencer outputs are peak-normalized to 0.8 FS on write;
    # apply the same to the artifact's raw output before comparing
    normed = {}
    for k in names:
        o = out[k]
        peak = np.max(np.abs(o))
        normed[k] = o / peak * 0.8 if peak > 0 else o
    ok, worst = _compare(serial, normed, atol=2e-3)
    s.done(ok, max_abs_diff=worst, **ev)


def sec_serving_streaming(tmp, noisy_dir, log):
    """--streaming artifact (cumulative-norm flagship): the subprocess
    pushes the wave hop-by-hop through the deserialized init/hop programs;
    the parent runs the LIVE StreamingEnhancer on the same wave and the
    two enhanced streams must agree."""
    s = Section("serving_streaming", log)
    from fullsubnet_tpu import serving
    from fullsubnet_tpu.config import build_model
    from fullsubnet_tpu.data.wavio import read_wav
    from fullsubnet_tpu.infer.streaming import StreamingEnhancer

    args = dict(FULLSUBNET_ARGS, norm_type="cumulative_laplace_norm")
    cfg = _config("fullsubnet.model.Model", args, "full_band_crm_mask",
                  noisy_dir)
    model, _ = build_model(cfg)
    ckpt = _checkpoint(tmp, model, "fullsubnet_cum")
    art = tmp / "artifact_stream"
    serving.export_streaming_enhancer(cfg, ckpt, art, overwrite=True)

    wave, _ = read_wav(noisy_dir / "utt0.wav", sr=SR)
    wave = wave[: 256 * 40]  # 40 hops is plenty for a parity check
    np.save(tmp / "stream_in.npy", wave)
    body = f"""
from fullsubnet_tpu.serving import StreamingServingModel

wave = np.load({str(tmp / 'stream_in.npy')!r})
m = StreamingServingModel.load({str(art)!r})
state = m.init_state()
chunks = []
for i in range(0, len(wave), m.hop):
    state, out = m.push(state, wave[i:i + m.hop])
    chunks.append(out)
state, tail = m.flush(state)
chunks.append(tail)
enhanced = np.concatenate(chunks)
np.save({str(tmp / 'stream_out.npy')!r}, enhanced)
evidence = {{"n": int(enhanced.size),
             "finite": bool(np.isfinite(enhanced).all())}}
"""
    ev = _no_model_code_subprocess(body)
    assert ev["finite"], ev
    served_out = np.load(tmp / "stream_out.npy")

    # load the params the way serving did (Orbax restore)
    from fullsubnet_tpu.checkpoint import CheckpointManager

    params = CheckpointManager(
        tmp / "ckpt_fullsubnet_cum", recover=False
    ).restore("latest")["params"]
    enh = StreamingEnhancer(model, params, n_fft=512, hop_length=256)
    st = enh.init_state()
    chunks = []
    for i in range(0, len(wave), enh.hop):
        st, out = enh.push(st, wave[i:i + enh.hop])
        chunks.append(out)
    st, tail = enh.flush(st)
    chunks.append(tail)
    live = np.concatenate(chunks)

    n = min(live.size, served_out.size)
    worst = float(np.max(np.abs(live[:n] - served_out[:n]))) if n else 0.0
    ok = n > 0 and live.size == served_out.size and worst <= 2e-3
    s.done(ok, max_abs_diff=worst, n_live=int(live.size),
           n_served=int(served_out.size))
    return ckpt, art, wave, served_out


def sec_serving_multistream(tmp, noisy_dir, log, ckpt, wave, single_out):
    """--streaming --streams 4 artifact: two concurrently-live lanes fed
    the same wave must each reproduce the single-stream serving output."""
    s = Section("serving_multistream", log)
    from fullsubnet_tpu import serving

    args = dict(FULLSUBNET_ARGS, norm_type="cumulative_laplace_norm")
    cfg = _config("fullsubnet.model.Model", args, "full_band_crm_mask",
                  noisy_dir)
    art = tmp / "artifact_multistream"
    serving.export_streaming_enhancer(cfg, ckpt, art, overwrite=True,
                                      streams=4)
    np.save(tmp / "ms_in.npy", wave)
    body = f"""
from fullsubnet_tpu.serving import MultiStreamServingModel

wave = np.load({str(tmp / 'ms_in.npy')!r})
m = MultiStreamServingModel.load({str(art)!r})
state = m.init_state()
slots = [m.open_stream(state), m.open_stream(state)]
collected = {{s: [] for s in slots}}
for i in range(0, len(wave), m.hop):
    for s in slots:
        m.push(state, s, wave[i:i + m.hop])
    for s, out in m.poll(state).items():
        collected[s].append(out)
for s in slots:
    collected[s].append(m.drain(state, s))
lanes = [np.concatenate(collected[s]) for s in slots]
np.savez({str(tmp / 'ms_out.npz')!r},
         **{{f"lane{{i}}": o for i, o in enumerate(lanes)}})
evidence = {{"lanes": [int(o.size) for o in lanes],
             "finite": bool(all(np.isfinite(o).all() for o in lanes))}}
"""
    ev = _no_model_code_subprocess(body)
    assert ev["finite"], ev
    lanes = np.load(tmp / "ms_out.npz")
    worst = 0.0
    for name in lanes.files:
        o = lanes[name]
        n = min(o.size, single_out.size)
        assert n > 0
        worst = max(worst, float(np.max(np.abs(o[:n] - single_out[:n]))))
    ok = worst <= 2e-3
    s.done(ok, max_abs_diff=worst, **ev)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--only", type=str, default="",
                   help="comma-separated section names")
    p.add_argument("--log", type=str, default="",
                   help="append one JSON line per section to this file")
    p.add_argument("--workdir", type=str, default="")
    args = p.parse_args(argv)
    only = set(s for s in args.only.split(",") if s)

    from fullsubnet_tpu.utils import enable_compilation_cache

    enable_compilation_cache(None)  # honors FULLSUBNET_COMPILE_CACHE
    tmp = pathlib.Path(args.workdir or tempfile.mkdtemp(prefix="fsn_verify_"))
    tmp.mkdir(parents=True, exist_ok=True)
    print(f"workdir: {tmp}  backend: {_backend()}", flush=True)
    noisy_dir = _wavs(tmp)
    log = args.log or None

    def want(name):
        return not only or name in only

    ckpt = serial = None
    if want("fullsubnet_batched") or want("serving_batch"):
        ckpt, serial = sec_fullsubnet_batched(tmp, noisy_dir, log)
    if want("improved_batched"):
        sec_improved_batched(tmp, noisy_dir, log)
    if want("fast_bucketed"):
        sec_fast_bucketed(tmp, noisy_dir, log)
    if want("serving_batch"):
        sec_serving_batch(tmp, noisy_dir, log, ckpt, serial)
    stream_state = None
    if want("serving_streaming") or want("serving_multistream"):
        stream_state = sec_serving_streaming(tmp, noisy_dir, log)
    if want("serving_multistream"):
        ckpt_c, _art, wave, single_out = stream_state
        sec_serving_multistream(tmp, noisy_dir, log, ckpt_c, wave,
                                single_out)
    print("\nALL REQUESTED SECTIONS PASSED", flush=True)


if __name__ == "__main__":
    main()
