"""End-to-end quality regression: enhance bundled DNS-style utterances
through the config-driven Inferencer (cumulative-norm recipe path) and pin
the resulting STOI/SI-SDR/WB-PESQ scores.

The released reference checkpoints are not bundled in this environment, so
the checkpoint is a fixed-seed torch-layout model — the pinned numbers are
regression anchors for the WHOLE pipeline (wav IO -> checkpoint conversion
-> STFT -> model -> cIRM decompress -> masking -> iSTFT -> metrics), not
quality claims. Any change to any stage moves them.
"""

import sys

import numpy as np
import pytest
import torch

from fullsubnet_tpu.data.wavio import read_wav, write_wav
from fullsubnet_tpu.metrics import SI_SDR, STOI, WB_PESQ

CUM_TOML = """
[acoustics]
n_fft = 320
win_length = 320
sr = 16000
hop_length = 160

[inferencer]
path = "inferencer.Inferencer"
type = "full_band_crm_mask"
[inferencer.args]
n_neighbor = 3

[dataset]
path = "dataset_inference.Dataset"
[dataset.args]
dataset_dir_list = ["{noisy_dir}"]
sr = 16000

[model]
path = "fullsubnet.model.Model"
[model.args]
sb_num_neighbors = 3
fb_num_neighbors = 0
num_freqs = 161
look_ahead = 2
sequence_model = "LSTM"
fb_output_activate_function = "ReLU"
sb_output_activate_function = false
fb_model_hidden_size = 32
sb_model_hidden_size = 24
weight_init = false
norm_type = "cumulative_laplace_norm"
num_groups_in_drop_band = 2
"""


def _fixed_ckpt(path):
    if "tests" not in sys.path:
        sys.path.insert(0, "tests")
    from tests._reference_loader import load_reference_model

    ref_mod = load_reference_model("fullsubnet")
    torch.manual_seed(123)
    tmodel = ref_mod.Model(
        num_freqs=161, look_ahead=2, sequence_model="LSTM",
        fb_num_neighbors=0, sb_num_neighbors=3,
        fb_output_activate_function="ReLU", sb_output_activate_function=False,
        fb_model_hidden_size=32, sb_model_hidden_size=24,
        norm_type="cumulative_laplace_norm", num_groups_in_drop_band=2,
        weight_init=False,
    )
    torch.save({"model": tmodel.state_dict(), "epoch": 1}, path)


def _utterances(sr=16000):
    """Two deterministic DNS-style (clean, noisy) pairs."""
    rng = np.random.default_rng(42)
    t = np.arange(3 * sr) / sr
    out = []
    for i, f0 in enumerate((240.0, 330.0)):
        clean = np.zeros_like(t)
        for k in range(1, 5):
            clean += (0.25 / k) * np.sin(2 * np.pi * f0 * k * t)
        clean *= 0.5 + 0.5 * np.sin(2 * np.pi * (2.0 + i) * t)
        noise = rng.standard_normal(len(t))
        noise *= np.sqrt(np.mean(clean**2) / np.mean(noise**2)) * 10 ** (-5 / 20)
        out.append((clean.astype(np.float32), (clean + noise).astype(np.float32)))
    return out


# Pinned full-pipeline scores (fixed-seed checkpoint; see module docstring).
PINNED = {
    "utt0": {"stoi_n": 0.65238, "sisdr_n": 4.9939, "pesq_n": 1.80603},
    "utt1": {"stoi_n": 0.59286, "sisdr_n": 5.0483, "pesq_n": 1.91420},
}


def test_quality_regression_cumulative_recipe(tmp_path):
    sr = 16000
    noisy_dir = tmp_path / "noisy"
    noisy_dir.mkdir()
    pairs = _utterances(sr)
    for i, (clean, noisy) in enumerate(pairs):
        write_wav(noisy_dir / f"utt{i}.wav", noisy, sr)

    ckpt = tmp_path / "ckpt.tar"
    _fixed_ckpt(ckpt)
    cfg_path = tmp_path / "inference_cum.toml"
    cfg_path.write_text(CUM_TOML.format(noisy_dir=noisy_dir))

    from fullsubnet_tpu.config import load_config
    from fullsubnet_tpu.infer.inferencer import Inferencer

    inferencer = Inferencer(load_config(cfg_path), str(ckpt), str(tmp_path / "out"))
    enhanced_dir = inferencer()

    for i, (clean, noisy) in enumerate(pairs):
        enhanced, got_sr = read_wav(enhanced_dir / f"utt{i}.wav")
        assert got_sr == sr and enhanced.shape == clean.shape
        assert np.isfinite(enhanced).all()

        pin = PINNED[f"utt{i}"]
        # noisy-side metrics pin the metric stack itself
        assert STOI(clean, noisy, sr=sr) == pytest.approx(pin["stoi_n"], abs=2e-3)
        assert SI_SDR(clean, noisy, sr=sr) == pytest.approx(pin["sisdr_n"], abs=0.05)
        assert WB_PESQ(clean, noisy, sr=sr) == pytest.approx(pin["pesq_n"], abs=0.02)

        # enhanced-side metrics pin the enhancement pipeline (values
        # recorded from this fixed-seed checkpoint, not quality claims)
        key = f"utt{i}"
        assert STOI(clean, enhanced, sr=sr) == pytest.approx(
            PINNED_ENH[key]["stoi_e"], abs=5e-3
        )
        assert SI_SDR(clean, enhanced, sr=sr) == pytest.approx(
            PINNED_ENH[key]["sisdr_e"], abs=0.2
        )
        assert WB_PESQ(clean, enhanced, sr=sr) == pytest.approx(
            PINNED_ENH[key]["pesq_e"], abs=0.05
        )


PINNED_ENH = {
    "utt0": {"stoi_e": 0.68108, "sisdr_e": -18.0231, "pesq_e": 1.75078},
    "utt1": {"stoi_e": 0.65096, "sisdr_e": -18.4194, "pesq_e": 1.86032},
}
