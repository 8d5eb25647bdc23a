"""Checkpoint management: Orbax persistence + PyTorch checkpoint interop.

Two jobs:

1. **Interop** — load the reference's released ``.tar``/``.pth`` checkpoints
   (``audio_zen/trainer/base_trainer.py:194-237`` writes
   ``latest_model.tar`` {epoch, best_score, optimizer, scaler, model},
   ``model_NNNN.pth`` raw state_dict, ``best_model.tar``) and convert the
   torch state_dict into our param pytrees. Because our RNN/Linear params
   keep the torch layout (see ``fullsubnet_tpu.nn.rnn``), conversion is
   pure key-mapping — no transposes or gate re-ordering.

2. **Native persistence** — save/restore the same latest/best/epoch-NNNN
   triplet semantics with Orbax (atomic, preemption-safe for TPU pods).
"""

from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# PyTorch -> pytree conversion
# --------------------------------------------------------------------------


def load_torch_state_dict(path: str | os.PathLike) -> dict:
    """Load a reference checkpoint (.tar or .pth) into a flat numpy dict.

    Strips DDP ``module.`` prefixes like the reference inferencer
    (``audio_zen/inferencer/base_inferencer.py:144-161``).
    """
    import torch

    blob = torch.load(os.fspath(path), map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "model" in blob:
        state = blob["model"]
    elif isinstance(blob, dict) and "model_state_dict" in blob:
        # released checkpoints (docs/source/usage/release.md) wrap the
        # weights as {"model_state_dict", "optimizer_state_dict", ...}
        state = blob["model_state_dict"]
    else:
        state = blob
    out = {}
    for k, v in state.items():
        if k.startswith("module."):
            k = k[len("module.") :]
        out[k] = np.asarray(v.detach().numpy() if hasattr(v, "detach") else v)
    return out


def _convert_sequence_model(
    state: dict, prefix: str, dtype=jnp.float32
) -> dict:
    """Map torch ``SequenceModel`` keys under ``prefix`` to our pytree.

    Handles ``{prefix}.sequence_model.{weight,bias}_{ih,hh}_l{K}[_reverse]``
    and ``{prefix}.fc_output_layer.{weight,bias}`` plus PReLU weight.
    """
    rnn_key = re.compile(
        re.escape(prefix)
        + r"\.sequence_model\.(weight|bias)_(ih|hh)_l(\d+)(_reverse)?$"
    )
    layers: dict[tuple[int, int], dict] = {}
    fc = {}
    prelu = None
    for k, v in state.items():
        m = rnn_key.match(k)
        if m:
            kind, gate, layer, rev = m.groups()
            li, di = int(layer), 1 if rev else 0
            name = ("w_" if kind == "weight" else "b_") + gate
            layers.setdefault((li, di), {})[name] = jnp.asarray(v, dtype)
        elif k == f"{prefix}.fc_output_layer.weight":
            fc["weight"] = jnp.asarray(v, dtype)
        elif k == f"{prefix}.fc_output_layer.bias":
            fc["bias"] = jnp.asarray(v, dtype)
        elif k == f"{prefix}.activate_function.weight":
            prelu = jnp.asarray(v, dtype)

    if not layers:
        raise KeyError(f"No RNN weights found under prefix {prefix!r}")

    num_layers = 1 + max(li for li, _ in layers)
    num_dirs = 1 + max(di for _, di in layers)
    params: dict[str, Any] = {
        "rnn": [
            [layers[(li, di)] for di in range(num_dirs)]
            for li in range(num_layers)
        ]
    }
    if fc:
        params["fc"] = fc
    if prelu is not None:
        params["prelu"] = prelu
    return params


def convert_fullsubnet(state: dict, dtype=jnp.float32) -> dict:
    """Reference FullSubNet state_dict -> our FullSubNet params."""
    return {
        "fb_model": _convert_sequence_model(state, "fb_model", dtype),
        "sb_model": _convert_sequence_model(state, "sb_model", dtype),
    }


def convert_fullband(state: dict, dtype=jnp.float32) -> dict:
    """Reference fullband_baseline state_dict -> our FullBandModel params."""
    return {"fullband_model": _convert_sequence_model(state, "fullband_model", dtype)}


def convert_fast_fullsubnet(state: dict, dtype=jnp.float32) -> dict:
    """Reference Fast FullSubNet state_dict -> our FastFullSubNet params."""
    return {
        "encoder": [
            _convert_sequence_model(state, "encoder.0", dtype),
            _convert_sequence_model(state, "encoder.1", dtype),
        ],
        "bottleneck": _convert_sequence_model(state, "bottleneck", dtype),
        "decoder_lstm": [
            _convert_sequence_model(state, "decoder_lstm.0", dtype),
            _convert_sequence_model(state, "decoder_lstm.1", dtype),
        ],
    }


def convert_improved_fullsubnet(state: dict, num_sections: int, dtype=jnp.float32) -> dict:
    """Reference Improved FullSubNet state_dict -> our params."""
    return {
        "fb_model": _convert_sequence_model(state, "fb_model", dtype),
        "sb_model": {
            "sb_models": [
                _convert_sequence_model(state, f"sb_model.sb_models.{i}", dtype)
                for i in range(num_sections)
            ]
        },
    }


CONVERTERS = {
    "fullsubnet": convert_fullsubnet,
    "fullband_baseline": convert_fullband,
    "fast_fullsubnet": convert_fast_fullsubnet,
    "improved_fullsubnet": convert_improved_fullsubnet,
}


# --------------------------------------------------------------------------
# pytree -> PyTorch export (inverse of the converters above)
# --------------------------------------------------------------------------
#
# Because our params keep the torch layout (no transposes, no gate
# re-ordering — see the module docstring), export is the same pure
# key-mapping run backwards. This is what lets weights TRAINED by this
# framework run through tools/parity_gate.py against the reference torch
# model (audio_zen/trainer/base_trainer.py:194-237 checkpoint format).


def _export_sequence_model(params: dict, prefix: str) -> dict:
    """Our SequenceModel param pytree -> torch state_dict keys under
    ``prefix`` (inverse of :func:`_convert_sequence_model`)."""
    out: dict[str, np.ndarray] = {}
    for li, dirs in enumerate(params["rnn"]):
        for di, layer in enumerate(dirs):
            suffix = f"l{li}" + ("_reverse" if di == 1 else "")
            for name, v in layer.items():
                kind = "weight" if name.startswith("w_") else "bias"
                gate = name[2:]  # ih | hh
                out[f"{prefix}.sequence_model.{kind}_{gate}_{suffix}"] = (
                    np.asarray(v, np.float32)
                )
    if "fc" in params:
        out[f"{prefix}.fc_output_layer.weight"] = np.asarray(
            params["fc"]["weight"], np.float32
        )
        out[f"{prefix}.fc_output_layer.bias"] = np.asarray(
            params["fc"]["bias"], np.float32
        )
    if "prelu" in params:
        out[f"{prefix}.activate_function.weight"] = np.asarray(
            params["prelu"], np.float32
        )
    return out


def export_fullsubnet(params: dict) -> dict:
    """Our FullSubNet params -> reference torch state_dict."""
    return {
        **_export_sequence_model(params["fb_model"], "fb_model"),
        **_export_sequence_model(params["sb_model"], "sb_model"),
    }


def export_fullband(params: dict) -> dict:
    return _export_sequence_model(params["fullband_model"], "fullband_model")


def export_fast_fullsubnet(
    params: dict,
    num_freqs: int = 257,
    num_mels: int = 64,
    sample_rate: int = 16000,
) -> dict:
    out = {}
    for i, p in enumerate(params["encoder"]):
        out.update(_export_sequence_model(p, f"encoder.{i}"))
    out.update(_export_sequence_model(params["bottleneck"], "bottleneck"))
    for i, p in enumerate(params["decoder_lstm"]):
        out.update(_export_sequence_model(p, f"decoder_lstm.{i}"))
    # the reference registers torchaudio MelScale's filterbank as a
    # persistent buffer (fast_fullsubnet/model.py:57 `self.mel_scale`),
    # so it appears in state_dict — regenerate it (derived, not learned;
    # our HTK construction is torchaudio-equal, acoustics/filterbank.py)
    from fullsubnet_tpu.acoustics.filterbank import mel_filterbank

    out["mel_scale.fb"] = mel_filterbank(
        num_freqs, num_mels, sample_rate, 0.0, sample_rate / 2
    )
    return out


def export_improved_fullsubnet(params: dict) -> dict:
    out = _export_sequence_model(params["fb_model"], "fb_model")
    for i, p in enumerate(params["sb_model"]["sb_models"]):
        out.update(_export_sequence_model(p, f"sb_model.sb_models.{i}"))
    return out


EXPORTERS = {
    "fullsubnet": export_fullsubnet,
    "fullband_baseline": export_fullband,
    "fast_fullsubnet": export_fast_fullsubnet,
    "improved_fullsubnet": export_improved_fullsubnet,
}


def save_torch_checkpoint(
    params: dict, model_name: str, path, **export_kwargs
) -> None:
    """Write our trained params as a released-format torch ``.tar``
    (``{"model_state_dict": ...}`` — the wrapper the reference's release
    checkpoints use, docs/source/usage/release.md) so the weights flow
    through tools/parity_gate.py and the reference's own loaders.

    ``export_kwargs`` flow to the family exporter. For
    ``fast_fullsubnet`` the mel filterbank is REGENERATED (derived
    buffer, not learned) — a model trained with a non-default
    ``sample_rate``/``num_mels``/``num_freqs`` MUST pass them here, or
    the exported ``mel_scale.fb`` silently encodes the 16 kHz default
    (same shape, wrong projection)."""
    import torch

    state = {
        k: torch.from_numpy(np.ascontiguousarray(v).copy())
        for k, v in EXPORTERS[model_name](params, **export_kwargs).items()
    }
    torch.save({"model_state_dict": state}, os.fspath(path))


def load_reference_checkpoint(path, model_name: str, dtype=jnp.float32, **kwargs):
    """One-call path: torch checkpoint file -> our model params pytree."""
    state = load_torch_state_dict(path)
    return CONVERTERS[model_name](state, dtype=dtype, **kwargs)


# --------------------------------------------------------------------------
# Native (Orbax) persistence with the latest/best/epoch triplet semantics
# --------------------------------------------------------------------------


class CheckpointManager:
    """Save/restore {params, opt_state, epoch, best_score} with the
    reference's artifact semantics: ``latest`` (resume point), ``best``
    (best validation score), ``epoch_NNNN`` (weights-only history).

    Saves are preemption-safe: each artifact is written to a hidden
    ``.tmp-<name>-*`` directory first (Orbax itself finalizes that write
    atomically), then swapped in with two renames. The previous artifact
    is never deleted before its replacement is fully on disk, and
    ``_recover()`` (run on construction) adopts a completed tmp if a kill
    landed between the two renames — so a resume point always survives.
    """

    def __init__(self, directory: str | os.PathLike, recover: bool = True):
        """``recover=False`` for READ-ONLY consumers (inference/warm-start
        from a possibly live training directory): recovery sweeps
        in-flight Orbax tmp dirs, which only the writing process may do."""
        self.directory = Path(directory).expanduser().absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        if recover:
            self._recover()

    def _ckpt(self):
        import orbax.checkpoint as ocp

        return ocp.StandardCheckpointer()

    def _recover(self):
        """Repair after a mid-save kill.

        Invariants of ``_swap_in``: a ``.tmp-<name>-*`` directory only
        exists in *completed* form (Orbax finalizes its own writes via
        rename), and the final artifact is missing only during the window
        between the rename-aside and the rename-in. So: if the final is
        missing but a tmp exists, the tmp IS the new artifact — adopt the
        newest one. Leftover ``.old-*`` and surplus tmps are garbage.
        """
        # only OUR completed tmp dirs match `.tmp-<name>-<8 hex>`; anything
        # else under `.tmp-*` is an Orbax in-flight write (it appends its
        # own `.orbax-checkpoint-tmp...` suffix until finalize-rename) that
        # a kill left INCOMPLETE — sweep those, never adopt them
        tmp_re = re.compile(r"^\.tmp-(.+)-[0-9a-f]{8}$")
        by_name: dict[str, list[Path]] = {}
        for t in self.directory.glob(".tmp-*"):
            m = tmp_re.match(t.name)
            if m is None or ".orbax-checkpoint-tmp" in t.name:
                _rmtree(t)
                continue
            by_name.setdefault(m.group(1), []).append(t)
        for name, tmps in by_name.items():
            final = self.directory / name
            tmps.sort(key=lambda p: p.stat().st_mtime)
            if not final.exists():
                os.rename(tmps.pop(), final)
            for t in tmps:
                _rmtree(t)
        for stale in self.directory.glob(".old-*"):
            _rmtree(stale)

    def _swap_in(self, ckpt, name: str, payload: dict):
        """Atomically replace ``<dir>/<name>`` with a fresh save."""
        import uuid

        tag = uuid.uuid4().hex[:8]
        final = self.directory / name
        tmp = self.directory / f".tmp-{name}-{tag}"
        ckpt.save(tmp, payload)
        ckpt.wait_until_finished()  # tmp is now complete on disk
        old = None
        if final.exists():
            old = self.directory / f".old-{name}-{tag}"
            os.rename(final, old)
        os.rename(tmp, final)
        if old is not None:
            _rmtree(old)

    def save(
        self,
        state: dict,
        epoch: int,
        is_best: bool = False,
        keep_weights_history: bool = True,
    ):
        """state: pytree with params/opt_state/epoch/best_score leaves."""
        ckpt = self._ckpt()
        self._swap_in(ckpt, "latest", state)
        if keep_weights_history:
            self._swap_in(ckpt, f"epoch_{epoch:04d}", {"params": state["params"]})
        if is_best:
            self._swap_in(ckpt, "best", state)

    def restore(self, which: str = "latest", target: dict | None = None) -> dict:
        ckpt = self._ckpt()
        path = self.directory / which
        if not path.exists():
            raise FileNotFoundError(f"No checkpoint at {path}")
        return ckpt.restore(path, target)

    def has(self, which: str = "latest") -> bool:
        return (self.directory / which).exists()


def _rmtree(path: Path):
    import shutil

    shutil.rmtree(path)
