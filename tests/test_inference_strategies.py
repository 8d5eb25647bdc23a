"""Coverage for the non-default inference strategies."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fullsubnet_tpu.data.wavio import write_wav


def _write_cfg(tmp_path, noisy_dir, strategy, model_section, extra_args=""):
    cfg = f"""
[acoustics]
n_fft = 320
win_length = 320
sr = 16000
hop_length = 160

[inferencer]
path = "inferencer.Inferencer"
type = "{strategy}"
[inferencer.args]
{extra_args}

[dataset]
path = "dataset_inference.Dataset"
[dataset.args]
dataset_dir_list = ["{noisy_dir}"]
sr = 16000

{model_section}
"""
    p = tmp_path / f"{strategy}.toml"
    p.write_text(cfg)
    return p


FULLBAND_MODEL = """
[model]
path = "fullband_baseline.model.Model"
[model.args]
num_freqs = 161
look_ahead = 2
sequence_model = "LSTM"
output_activate_function = false
hidden_size = 24
weight_init = false
norm_type = "offline_laplace_norm"
"""


@pytest.fixture
def setup(tmp_path):
    sr = 16000
    rng = np.random.default_rng(0)
    noisy_dir = tmp_path / "noisy"
    noisy_dir.mkdir()
    t = np.arange(sr) / sr
    wav = (0.3 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(sr)).astype(
        np.float32
    )
    write_wav(noisy_dir / "utt.wav", wav, sr)

    # fullband checkpoint in reference key layout
    import sys

    if "tests" not in sys.path:
        sys.path.insert(0, "tests")
    from tests._reference_loader import load_reference_model

    ref_mod = load_reference_model("fullband_baseline")
    torch.manual_seed(0)
    tmodel = ref_mod.Model(
        num_freqs=161, look_ahead=2, sequence_model="LSTM",
        output_activate_function=None, hidden_size=24, weight_init=False,
    )
    ckpt = tmp_path / "fb.tar"
    torch.save({"model": tmodel.state_dict()}, ckpt)
    return tmp_path, noisy_dir, ckpt, wav


def _run(tmp_path, noisy_dir, ckpt, strategy, model_section, extra_args=""):
    from fullsubnet_tpu.config import load_config
    from fullsubnet_tpu.infer.inferencer import Inferencer

    cfg = _write_cfg(tmp_path, noisy_dir, strategy, model_section, extra_args)
    inf = Inferencer(load_config(cfg), str(ckpt), str(tmp_path / f"out_{strategy}"))
    out_dir = inf()
    from fullsubnet_tpu.data.wavio import read_wav

    out, _ = read_wav(out_dir / "utt.wav")
    assert np.isfinite(out).all()
    return out


def test_scaled_mask_strategy(setup):
    tmp_path, noisy_dir, ckpt, wav = setup
    out = _run(tmp_path, noisy_dir, ckpt, "scaled_mask", FULLBAND_MODEL)
    assert out.shape == wav.shape


def test_full_band_crm_mask_strategy_fullband_model(setup):
    tmp_path, noisy_dir, ckpt, wav = setup
    out = _run(tmp_path, noisy_dir, ckpt, "full_band_crm_mask", FULLBAND_MODEL)
    assert out.shape == wav.shape


def test_mag_strategy_requires_mag_model(setup):
    """mag strategy: model emits a magnitude mask [B,1,F,T]; exercised with
    a stub model via the registry fallback."""
    tmp_path, noisy_dir, ckpt, wav = setup
    # fullband model emits [B,2,F,T]; mag strategy squeezes channel 1 —
    # exercise shape flow using the same model (mask interpretation)
    out = _run(tmp_path, noisy_dir, ckpt, "mag", FULLBAND_MODEL)
    assert out.shape == wav.shape


def test_unknown_strategy_raises(setup):
    tmp_path, noisy_dir, ckpt, _ = setup
    from fullsubnet_tpu.config import load_config
    from fullsubnet_tpu.infer.inferencer import Inferencer

    cfg = _write_cfg(tmp_path, noisy_dir, "bogus_strategy", FULLBAND_MODEL)
    inf = Inferencer(load_config(cfg), str(ckpt), str(tmp_path / "out_x"))
    with pytest.raises(NotImplementedError):
        inf()
