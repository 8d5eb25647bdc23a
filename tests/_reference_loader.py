"""Import reference (PyTorch) recipe models for golden-value parity tests.

The reference at /root/reference depends on librosa/torchaudio/torchinfo
which aren't in this image; we stub just enough for the model modules to
import. Reference code is used read-only as a test oracle — never copied
into the framework.
"""

import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"
RECIPES = f"{REFERENCE_ROOT}/recipes/dns_interspeech_2020"


def _ensure_stub(name, attrs=None):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in (attrs or {}).items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def install_stubs():
    _ensure_stub("librosa", {"load": None})
    _ensure_stub("torchinfo", {"summary": lambda *a, **k: None})

    # torchaudio.transforms.MelScale stub backed by our native HTK filterbank
    # (numerically identical algorithm to torchaudio's melscale_fbanks with
    # norm=None, mel_scale="htk").
    import torch

    from fullsubnet_tpu.acoustics.filterbank import mel_filterbank

    class MelScale(torch.nn.Module):
        def __init__(self, n_mels, sample_rate, f_min, f_max, n_stft):
            super().__init__()
            fb = mel_filterbank(n_stft, n_mels, sample_rate, f_min, f_max)
            self.register_buffer("fb", torch.from_numpy(np.asarray(fb)))

        def forward(self, spec):
            return torch.matmul(spec.transpose(-1, -2), self.fb).transpose(-1, -2)

    ta = _ensure_stub("torchaudio")
    tt = _ensure_stub("torchaudio.transforms", {"MelScale": MelScale})
    ta.transforms = tt


def load_reference_model(recipe: str):
    """Import `{recipe}/model.py` from the reference as a module."""
    install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    if RECIPES not in sys.path:
        sys.path.insert(0, RECIPES)
    import importlib

    return importlib.import_module(f"{recipe}.model")
