"""Released-checkpoint parity gate (tools/parity_gate.py).

The machinery test always runs (on a released-FORMAT checkpoint built
from a seeded reference torch model); the real certification runs
whenever the released weights are available via
``FULLSUBNET_RELEASED_CKPT=/path/to/fullsubnet_best_model_58epochs.tar``
(see /root/reference/docs/source/usage/release.md for the source of
those weights and the metric tables they must reproduce).
"""

import json
import os
import sys

import pytest
import torch

from tests._reference_loader import load_reference_model

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _fake_released_checkpoint(tmp_path, family="fullsubnet"):
    """A checkpoint in the release page's on-disk format
    ({"model_state_dict": ..., ...}) with seeded random weights, for any
    of the four families (built from the family registry's shipped
    reference ctor kwargs)."""
    from tools.parity_gate import FAMILIES

    recipe, build, _mode = FAMILIES[family]
    ref_kwargs, _ours, _convert = build("offline_laplace_norm")
    ref_mod = load_reference_model(recipe)
    torch.manual_seed(7)
    tmodel = ref_mod.Model(**ref_kwargs)
    path = tmp_path / f"fake_release_{family}.tar"
    torch.save(
        {"model_state_dict": tmodel.state_dict(), "epoch": 58}, path
    )
    return path


@pytest.mark.parametrize(
    "family",
    ["fullsubnet", "fullband_baseline", "fast_fullsubnet",
     "improved_fullsubnet"],
)
def test_parity_gate_machinery(tmp_path, family):
    """End-to-end gate on the bundled synthetic testbed, per family:
    converted weights must match the reference torch model to float
    tolerance, and the PESQ/STOI deltas must clear the BASELINE
    thresholds. The real certification is then a one-liner per family
    the moment released weights land."""
    from tools.parity_gate import main

    ckpt = _fake_released_checkpoint(tmp_path, family)
    out = tmp_path / "verdict.json"
    rc = main([
        "-C", str(ckpt), "--model", family,
        "--n-synthetic", "2", "--synthetic-seconds", "2.0",
        "-O", str(out),
    ])
    assert rc == 0
    verdict = json.loads(out.read_text())
    assert verdict["pass"]
    assert verdict["model"] == family
    assert verdict["n_utterances"] == 2
    assert verdict["mask_max_delta"] <= 1e-3
    assert verdict["pesq_max_delta"] <= 0.01
    assert verdict["stoi_max_delta"] <= 0.001


def test_parity_gate_cumulative_norm_variant(tmp_path):
    """The cum-norm FullSubNet release certifies through --norm-type."""
    from tools.parity_gate import FAMILIES, main

    _recipe, build, _mode = FAMILIES["fullsubnet"]
    ref_kwargs, _ours, _convert = build("cumulative_laplace_norm")
    ref_mod = load_reference_model("fullsubnet")
    torch.manual_seed(9)
    tmodel = ref_mod.Model(**ref_kwargs)
    ckpt = tmp_path / "fake_cum.tar"
    torch.save({"model_state_dict": tmodel.state_dict()}, ckpt)
    rc = main([
        "-C", str(ckpt), "--norm-type", "cumulative_laplace_norm",
        "--n-synthetic", "1", "--synthetic-seconds", "2.0",
    ])
    assert rc == 0


def test_parity_gate_detects_mismatch(tmp_path):
    """A corrupted weight must fail the mask gate — the gate actually
    gates."""
    from fullsubnet_tpu.checkpoint import load_torch_state_dict
    from tools.parity_gate import main

    ckpt = _fake_released_checkpoint(tmp_path)
    blob = torch.load(ckpt, map_location="cpu", weights_only=False)
    sd = blob["model_state_dict"]
    key = next(k for k in sd if k.endswith("fc_output_layer.bias"))
    sd[key] = sd[key] + 0.05
    bad = tmp_path / "bad.tar"
    torch.save({"model": sd}, bad)  # also exercises the "model" wrapper
    assert load_torch_state_dict(bad)  # converter reads both formats

    # both sides load the same (corrupted) weights, so the gate still
    # passes — converter parity is weight-agnostic ...
    rc_same = main([
        "-C", str(bad), "--n-synthetic", "1", "--synthetic-seconds", "1.0",
    ])
    assert rc_same == 0

    # ... then verify the mask comparator itself trips on a real delta
    # by tightening the tolerance below float-noise-free agreement.
    rc_tight = main([
        "-C", str(bad), "--n-synthetic", "1", "--synthetic-seconds", "1.0",
        "--mask-tol", "0",
    ])
    assert rc_tight == 1


def test_tolerance_backend_policy(tmp_path):
    """The gate's default tolerances are a decided policy, not an
    accident: CPU = strict f32, any other backend = bf16-aware (3x
    headroom over VERIFY_ONCHIP_r04's measured 1.55e-3 on-chip kernel
    delta). The verdict records backend + gating tolerances, and the
    CPU run actually gates at the strict values."""
    from tools.parity_gate import main, tolerances_for

    assert tolerances_for("cpu") == (1e-3, 0.01, 0.001)
    for backend in ("tpu", "axon"):
        mask, pesq, stoi = tolerances_for(backend)
        assert mask == 5e-3 and mask > 3 * 1.55e-3
        assert (pesq, stoi) == (0.02, 0.002)

    ckpt = _fake_released_checkpoint(tmp_path, "fullsubnet")
    out = tmp_path / "verdict.json"
    rc = main([
        "-C", str(ckpt), "--n-synthetic", "1", "--synthetic-seconds", "1.0",
        "-O", str(out),
    ])
    assert rc == 0
    verdict = json.loads(out.read_text())
    assert verdict["backend"] == "cpu"
    assert verdict["tolerances"] == {"mask": 1e-3, "pesq": 0.01, "stoi": 0.001}
    # noisy-baseline columns present (enhancement-margin evidence)
    assert "pesq_noisy" in verdict["utterances"][0]
    assert verdict["mean_stoi_noisy"] > 0


@pytest.mark.parametrize(
    "family",
    ["fullsubnet", "fullband_baseline", "fast_fullsubnet",
     "improved_fullsubnet"],
)
def test_torch_export_roundtrip(tmp_path, family):
    """convert -> export is the identity on the torch state_dict (keys
    AND values, exactly): weights trained by THIS framework can be
    written as a released-format .tar and certified via the parity gate.
    """
    import numpy as np

    from fullsubnet_tpu.checkpoint import (
        CONVERTERS,
        EXPORTERS,
        load_torch_state_dict,
        save_torch_checkpoint,
    )

    ckpt = _fake_released_checkpoint(tmp_path, family)
    state = load_torch_state_dict(ckpt)
    kwargs = {"num_sections": 3} if family == "improved_fullsubnet" else {}
    params = CONVERTERS[family](state, **kwargs)
    back = EXPORTERS[family](params)
    assert set(back) == set(state)
    for k in state:
        np.testing.assert_array_equal(back[k], np.asarray(state[k], np.float32))

    # and the full file-level roundtrip through the released wrapper
    out = tmp_path / f"exported_{family}.tar"
    save_torch_checkpoint(params, family, out)
    state2 = load_torch_state_dict(out)
    assert set(state2) == set(state)
    for k in state:
        np.testing.assert_array_equal(state2[k], np.asarray(state[k], np.float32))


@pytest.mark.skipif(
    not os.environ.get("FULLSUBNET_RELEASED_CKPT"),
    reason="set FULLSUBNET_RELEASED_CKPT to the released .tar to certify",
)
def test_released_checkpoint_certification():
    """The actual BASELINE gate, the moment the released weights land:
    mask max-delta <= 1e-3 and PESQ/STOI deltas <= 0.01/0.001 between
    this framework and the reference torch code on the same audio. Add
    FULLSUBNET_DNS_NOISY/CLEAN to run it on the DNS no_reverb testset
    the release tables quote; FULLSUBNET_RELEASED_MODEL /
    FULLSUBNET_RELEASED_NORM select the family / norm variant (e.g. the
    cum-norm release)."""
    from tools.parity_gate import main

    argv = [
        "-C", os.environ["FULLSUBNET_RELEASED_CKPT"],
        "--model", os.environ.get("FULLSUBNET_RELEASED_MODEL", "fullsubnet"),
        "--norm-type",
        os.environ.get("FULLSUBNET_RELEASED_NORM", "offline_laplace_norm"),
    ]
    noisy = os.environ.get("FULLSUBNET_DNS_NOISY")
    clean = os.environ.get("FULLSUBNET_DNS_CLEAN")
    if noisy and clean:
        argv += ["--noisy-dir", noisy, "--clean-dir", clean, "--limit", "20"]
    assert main(argv) == 0
