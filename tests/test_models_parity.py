"""Model-level parity: our JAX models vs the actual reference PyTorch models
with identical (converted) weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fullsubnet_tpu.checkpoint import (
    convert_fullband,
    convert_fullsubnet,
    convert_fast_fullsubnet,
    convert_improved_fullsubnet,
)
from fullsubnet_tpu.models import (
    FullBandModel,
    FullSubNet,
    FastFullSubNet,
    ImprovedFullSubNet,
)
from tests._reference_loader import load_reference_model


def _state_np(tmodel):
    return {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}


def test_fullsubnet_matches_reference():
    ref_mod = load_reference_model("fullsubnet")
    torch.manual_seed(0)
    tmodel = ref_mod.Model(
        num_freqs=257,
        look_ahead=2,
        sequence_model="LSTM",
        fb_num_neighbors=0,
        sb_num_neighbors=15,
        fb_output_activate_function="ReLU",
        sb_output_activate_function=False,
        fb_model_hidden_size=512,
        sb_model_hidden_size=384,
        norm_type="offline_laplace_norm",
        num_groups_in_drop_band=2,
        weight_init=False,
    ).eval()

    model = FullSubNet()
    params = convert_fullsubnet(_state_np(tmodel))

    x = torch.rand(1, 1, 257, 63)
    with torch.no_grad():
        ref = tmodel(x).numpy()
    ours = np.asarray(model(params, jnp.asarray(x.numpy())))
    assert ours.shape == ref.shape == (1, 2, 257, 63)
    np.testing.assert_allclose(ours, ref, atol=5e-5, rtol=1e-4)


def test_fullsubnet_drop_band_training_path():
    ref_mod = load_reference_model("fullsubnet")
    torch.manual_seed(1)
    tmodel = ref_mod.Model(
        num_freqs=64,
        look_ahead=2,
        sequence_model="LSTM",
        fb_num_neighbors=0,
        sb_num_neighbors=3,
        fb_output_activate_function="ReLU",
        sb_output_activate_function=False,
        fb_model_hidden_size=32,
        sb_model_hidden_size=24,
        norm_type="offline_laplace_norm",
        num_groups_in_drop_band=2,
        weight_init=False,
    ).eval()
    model = FullSubNet(
        num_freqs=64,
        look_ahead=2,
        fb_num_neighbors=0,
        sb_num_neighbors=3,
        fb_model_hidden_size=32,
        sb_model_hidden_size=24,
    )
    params = convert_fullsubnet(_state_np(tmodel))
    x = torch.rand(4, 1, 64, 20)  # batch > 1 triggers drop_band
    with torch.no_grad():
        ref = tmodel(x).numpy()
    ours = np.asarray(model(params, jnp.asarray(x.numpy())))
    assert ours.shape == ref.shape == (4, 2, 32, 20)
    np.testing.assert_allclose(ours, ref, atol=5e-5, rtol=1e-4)


def test_fullsubnet_cumulative_norm_variant():
    ref_mod = load_reference_model("fullsubnet")
    torch.manual_seed(2)
    kwargs = dict(
        num_freqs=64, look_ahead=2, sequence_model="LSTM", fb_num_neighbors=0,
        sb_num_neighbors=3, fb_output_activate_function="ReLU",
        sb_output_activate_function=False, fb_model_hidden_size=32,
        sb_model_hidden_size=24, norm_type="cumulative_laplace_norm",
        num_groups_in_drop_band=2,
    )
    tmodel = ref_mod.Model(weight_init=False, **kwargs).eval()
    model = FullSubNet(
        num_freqs=64, look_ahead=2, fb_num_neighbors=0, sb_num_neighbors=3,
        fb_model_hidden_size=32, sb_model_hidden_size=24,
        norm_type="cumulative_laplace_norm",
    )
    params = convert_fullsubnet(_state_np(tmodel))
    x = torch.rand(1, 1, 64, 30)
    with torch.no_grad():
        ref = tmodel(x).numpy()
    ours = np.asarray(model(params, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(ours, ref, atol=5e-5, rtol=1e-4)


def test_fullband_matches_reference():
    ref_mod = load_reference_model("fullband_baseline")
    torch.manual_seed(3)
    tmodel = ref_mod.Model(
        num_freqs=161,
        look_ahead=1,
        sequence_model="LSTM",
        output_activate_function=None,
        hidden_size=64,
        weight_init=False,
    ).eval()
    model = FullBandModel(
        num_freqs=161, hidden_size=64, look_ahead=1, output_activate_function=None
    )
    params = convert_fullband(_state_np(tmodel))
    x = torch.rand(2, 1, 161, 40)
    with torch.no_grad():
        ref = tmodel(x).numpy()
    ours = np.asarray(model(params, jnp.asarray(x.numpy())))
    assert ours.shape == ref.shape == (2, 2, 161, 40)
    np.testing.assert_allclose(ours, ref, atol=5e-5, rtol=1e-4)


def test_fast_fullsubnet_matches_reference():
    ref_mod = load_reference_model("fast_fullsubnet")
    torch.manual_seed(4)
    tmodel = ref_mod.Model(
        look_ahead=2,
        shrink_size=2,
        sequence_model="LSTM",
        num_mels=64,
        encoder_input_size=257,
        bottleneck_hidden_size=384,
        bottleneck_num_layers=2,
        noisy_input_num_neighbors=5,
        encoder_output_num_neighbors=0,
    ).eval()
    model = FastFullSubNet()
    params = convert_fast_fullsubnet(_state_np(tmodel))
    x = torch.rand(1, 1, 257, 63)
    with torch.no_grad():
        ref = tmodel(x).numpy()
    ours = np.asarray(model(params, jnp.asarray(x.numpy())))
    assert ours.shape == ref.shape == (1, 2, 257, 63)
    np.testing.assert_allclose(ours, ref, atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize(
    "cfg,wave_len",
    [
        (dict(), 16000),  # 16 kHz defaults
        (
            dict(
                n_fft=960,
                hop_length=480,
                win_length=960,
                num_freqs=481,
                freq_cutoffs=[20, 120, 240],
                sb_num_center_freqs=[1, 4, 20, 60],
                sb_num_neighbor_freqs=[15, 15, 15, 15],
                fb_num_center_freqs=[1, 4, 20, 60],
                fb_num_neighbor_freqs=[15, 15, 15, 15],
            ),
            48000,  # 48 kHz config
        ),
    ],
)
def test_improved_fullsubnet_matches_reference(cfg, wave_len):
    ref_mod = load_reference_model("improved_fullsubnet")
    torch.manual_seed(5)
    tmodel = ref_mod.Model(**cfg).eval()
    model = ImprovedFullSubNet(**cfg)
    n_sections = len(cfg.get("sb_num_center_freqs", [1, 4, 8]))
    params = convert_improved_fullsubnet(_state_np(tmodel), n_sections)
    y = torch.rand(1, wave_len)
    with torch.no_grad():
        ref = tmodel(y).numpy()
    ours = np.asarray(model(params, jnp.asarray(y.numpy())))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_model_param_counts():
    """FullSubNet must land at its published ~5.6 M params."""
    model = FullSubNet()
    params = model.init(jax.random.PRNGKey(0), weight_init=False)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert 5.5e6 < n < 5.8e6, n


def test_models_jit_compile():
    model = FullSubNet(
        num_freqs=64, fb_model_hidden_size=32, sb_model_hidden_size=24,
        sb_num_neighbors=3,
    )
    params = model.init(jax.random.PRNGKey(0), weight_init=False)
    fn = jax.jit(lambda p, x: model(p, x))
    out = fn(params, jnp.ones((1, 1, 64, 20)))
    assert out.shape == (1, 2, 64, 20)
