"""All shipped recipe configs load + build; unfold_along_time parity."""

import glob

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from torch.nn import functional as F

from fullsubnet_tpu.acoustics.feature import unfold_along_time
from fullsubnet_tpu.config import build_loss, build_model, build_optimizer, load_config

TRAIN_CONFIGS = sorted(glob.glob("recipes/dns_interspeech_2020/*/train*.toml"))
INFER_CONFIGS = sorted(glob.glob("recipes/dns_interspeech_2020/*/inference*.toml"))


@pytest.mark.parametrize("cfg_path", TRAIN_CONFIGS)
def test_train_config_builds(cfg_path):
    cfg = load_config(cfg_path)
    model, kw = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), **kw)
    assert jax.tree.leaves(params)
    build_loss(cfg)
    build_optimizer(cfg)


@pytest.mark.parametrize("cfg_path", INFER_CONFIGS)
def test_inference_config_builds(cfg_path):
    cfg = load_config(cfg_path)
    model, _ = build_model(cfg)
    assert cfg["inferencer"]["type"] == "full_band_crm_mask"


def test_recipe_count_matches_reference():
    # reference ships 9 TOMLs; we ship those plus improved 16k + subband
    assert len(TRAIN_CONFIGS) + len(INFER_CONFIGS) >= 9


def test_unfold_along_time_matches_reference():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 1, 16, 30)).astype(np.float32)
    context = 4

    # reference restatement (base_inferencer.py:110-142)
    xt = torch.from_numpy(x)
    b, c, f, t = xt.shape
    chunk = context + 1
    ref = xt.reshape(b * c * f, t).unsqueeze(1).unsqueeze(1)
    ref = F.unfold(ref, (1, chunk))
    ref = ref.reshape(b, c, f, chunk, -1).permute(0, 4, 1, 2, 3).numpy()

    ours = np.asarray(unfold_along_time(jnp.asarray(x), context))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-6)
