"""TOML config layer with a typed registry.

Keeps the reference's TOML schema (sections: meta, acoustics,
loss_function, optimizer, train_dataset, validation_dataset, model,
trainer, inferencer, dataset — see
``recipes/dns_interspeech_2020/fullsubnet/train.toml``) but replaces the
raw ``importlib`` dotted-path binder (``audio_zen/utils.py:70-105``) with a
typed registry: reference dotted paths and our short names both resolve to
framework classes; unknown paths fall back to dynamic import so user
extensions keep working.
"""

from __future__ import annotations

import os
import tomllib
from typing import Any

from fullsubnet_tpu.utils import initialize_module


def load_config(path: str | os.PathLike) -> dict:
    with open(os.fspath(path), "rb") as f:
        return tomllib.load(f)


def _models():
    from fullsubnet_tpu.models import (
        FastFullSubNet,
        FullBandModel,
        FullSubNet,
        ImprovedFullSubNet,
        SubBandBaseline,
    )

    return {
        # our names
        "fullsubnet": FullSubNet,
        "fullband_baseline": FullBandModel,
        "fast_fullsubnet": FastFullSubNet,
        "improved_fullsubnet": ImprovedFullSubNet,
        "subband_baseline": SubBandBaseline,
        "subband_baseline.model.Model": SubBandBaseline,
        # reference dotted paths (recipe configs use these)
        "fullsubnet.model.Model": FullSubNet,
        "fullband_baseline.model.Model": FullBandModel,
        "fast_fullsubnet.model.Model": FastFullSubNet,
        "improved_fullsubnet.model.Model": ImprovedFullSubNet,
        "model.Model": FullSubNet,
    }


def _datasets():
    from fullsubnet_tpu.data.datasets import (
        InferenceDataset,
        TrainDataset,
        ValidationDataset,
    )

    return {
        "train": TrainDataset,
        "validation": ValidationDataset,
        "inference": InferenceDataset,
        "dataset_train.Dataset": TrainDataset,
        "dataset_validation.Dataset": ValidationDataset,
        "dataset_inference.Dataset": InferenceDataset,
    }


# torch nn.LSTM/GRU argument names appearing in reference model.args that we
# accept but map (weight_init is consumed at init()-time, not __init__).


def build_model(config: dict):
    """config["model"] = {path|name, args}. Returns (model, init_kwargs)."""
    section = config["model"]
    path = section.get("path", section.get("name"))
    args = dict(section.get("args", {}))
    weight_init = bool(args.pop("weight_init", True))
    # TOML has no null; the reference uses `false` for "no activation"
    for k, v in list(args.items()):
        if v is False and k.endswith("activate_function"):
            args[k] = None
    registry = _models()
    if path in registry:
        model = registry[path](**args)
    else:
        model = initialize_module(path, args)
    return model, {"weight_init": weight_init}


def build_dataset(section: dict, kind: str):
    path = section.get("path", kind)
    args = dict(section.get("args", {}))
    registry = _datasets()
    cls = registry.get(path)
    if cls is None:
        return initialize_module(path, args)
    return cls(**args)


def build_loss(config: dict):
    from fullsubnet_tpu.train.loss import LOSS_REGISTRY

    name = config["loss_function"]["name"]
    args = config["loss_function"].get("args", {}) or {}
    fn = LOSS_REGISTRY[name]
    if args:
        import functools

        fn = functools.partial(fn, **args)
    return fn


def build_optimizer(config: dict):
    import optax

    section = config["optimizer"]
    lr = section.get("lr", 1e-3)
    beta1 = section.get("beta1", 0.9)
    beta2 = section.get("beta2", 0.999)
    clip = config.get("trainer", {}).get("train", {}).get("clip_grad_norm_value", 0)
    tx = optax.adam(lr, b1=beta1, b2=beta2)
    if clip:
        tx = optax.chain(optax.clip_by_global_norm(float(clip)), tx)
    return tx


def experiment_name_from_config_path(config_path: str) -> str:
    return os.path.splitext(os.path.basename(config_path))[0]


def config_summary(config: dict) -> str:
    import json

    return json.dumps(config, indent=2, default=str)


DEFAULT_ACOUSTICS = {"n_fft": 512, "hop_length": 256, "win_length": 512, "sr": 16000}


def acoustics_args(config: dict) -> dict[str, Any]:
    a = {**DEFAULT_ACOUSTICS, **config.get("acoustics", {})}
    return {
        "n_fft": a["n_fft"],
        "hop_length": a["hop_length"],
        "win_length": a["win_length"],
        "sr": a.get("sr", 16000),
    }
