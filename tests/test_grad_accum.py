"""Trainer-level gradient accumulation: step equivalence, the model's
auto capacity picker, and mesh composition.

Grad accumulation is the round-4 capacity strategy (VERDICT r3 #7): at
large (batch x crop) shapes, splitting the step into microbatches beats
both in-step capacity escapes measured on the chip (B=256 x 3.072 s:
1220 audio-s/s vs 887 time-chunked stash; B=256 x 30 s: 986 vs 852
row-group remat). These tests pin its correctness + the measured-policy
decisions; the throughput claims live in bench.py --train --accum.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fullsubnet_tpu.config import load_config
from fullsubnet_tpu.models import MODEL_REGISTRY
from fullsubnet_tpu.train.trainer import Trainer

from tests.test_trainer_validation import TOML, full_setup  # noqa: F401


def _trainer_with_accum(cfg_path, tmp_path, accum, name):
    cfg = load_config(cfg_path)
    cfg["trainer"]["train"]["grad_accum_steps"] = accum
    # exact partition equivalence needs drop_band off (a microbatch's
    # drop pattern is positional — same distributed semantics as the
    # reference's per-DDP-replica drop_band, but a different subset)
    cfg["model"]["args"]["num_groups_in_drop_band"] = 0
    return Trainer(cfg, experiment_name=name)


def test_accum_step_matches_plain_step(full_setup):  # noqa: F811
    """G=2 accumulation must produce the same loss and updated params as
    the plain step (fp32, no drop_band: the mean-reduced loss over equal
    microbatches is exactly the full-batch mean)."""
    cfg_path, tmp_path = full_setup
    t1 = _trainer_with_accum(cfg_path, tmp_path, 1, "accum1")
    t2 = _trainer_with_accum(cfg_path, tmp_path, 2, "accum2")

    rng = np.random.default_rng(3)
    noisy = jnp.asarray(rng.standard_normal((8, 6400)).astype(np.float32) * 0.1)
    clean = noisy * 0.8

    s1, l1 = t1._train_step(t1.state, noisy, clean)
    s2, l2 = t2._train_step(t2.state, noisy, clean)
    assert float(l1) == pytest.approx(float(l2), rel=1e-5)
    leaves1 = jax.tree.leaves(s1["params"])
    leaves2 = jax.tree.leaves(s2["params"])
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-5, atol=2e-6,
        )


def test_accum_with_drop_band_trains(full_setup):  # noqa: F811
    """With drop_band active the per-microbatch pattern is positional
    (reference-distributed semantics) — the step must still run and
    produce a finite loss and finite param updates."""
    cfg_path, _tmp = full_setup
    cfg = load_config(cfg_path)
    cfg["trainer"]["train"]["grad_accum_steps"] = 2
    tr = Trainer(cfg, experiment_name="accum_db")
    rng = np.random.default_rng(4)
    noisy = jnp.asarray(rng.standard_normal((8, 6400)).astype(np.float32) * 0.1)
    state, loss = tr._train_step(tr.state, noisy, noisy * 0.8)
    assert np.isfinite(float(loss))
    assert all(
        bool(jnp.isfinite(p).all()) for p in jax.tree.leaves(state["params"])
    )


def test_recommended_grad_accum_policy():
    """The auto picker encodes the measured crossovers (v5e, bf16,
    flagship, drop_groups=2): shipped shapes stay G=1; B>=160 short
    crops split to a monolithic-stash microbatch; long crops split to
    the largest microbatch that fits HBM."""
    m = MODEL_REGISTRY["fullsubnet"]()
    t_short = int(16000 * 3.072) // 256 + 1
    t_long = int(16000 * 30.0) // 256 + 1
    cases = {
        (64, t_short): 1,
        (96, t_short): 1,
        (128, t_short): 1,   # shipped recipe: behavior unchanged
        (160, t_short): 2,   # measured 1183 vs 926
        (256, t_short): 2,   # measured 1220 vs 887
        (256, t_long): 4,    # measured 986 vs 852 (remat) / 945 (G=8)
        (512, t_long): 8,
    }
    for (b, t), want in cases.items():
        got = m.recommended_grad_accum(b, t, itemsize=2, drop_groups=2)
        assert got == want, f"B={b} t={t}: got G={got}, want {want}"
        # any pick must keep microbatches valid
        assert b % got == 0 and (b // got) % 2 == 0


def test_improved_recommended_grad_accum_policy():
    """Improved family: the capacity pinch is the per-section stash
    budget (6 GB / num_sections). Measured (v5e, bf16, 3.072 s crops):
    16 kHz B=64 G=1 1051 audio-s/s, B=128 G=1 883 (section stash
    chunked) vs G=2 1133 — the picker must split at B=128 and leave the
    monolithic shapes alone."""
    from fullsubnet_tpu.models.improved_fullsubnet import ImprovedFullSubNet

    m16 = ImprovedFullSubNet()
    t16 = int(16000 * 3.072) // 128 + 1
    cases16 = {32: 1, 64: 1, 128: 2, 256: 4}
    for b, want in cases16.items():
        got = m16.recommended_grad_accum(b, t16, itemsize=2)
        assert got == want, f"16k B={b}: got G={got}, want {want}"
        assert b % got == 0

    m48 = ImprovedFullSubNet(
        n_fft=960, hop_length=480, win_length=960, num_freqs=481,
        freq_cutoffs=[20, 120, 240],
        sb_num_center_freqs=[1, 4, 20, 60],
        sb_num_neighbor_freqs=[15, 15, 15, 15],
        fb_num_center_freqs=[1, 4, 20, 60],
        fb_num_neighbor_freqs=[15, 15, 15, 15],
    )
    t48 = int(48000 * 3.072) // 480 + 1
    # B=64 is right at the budget edge (largest section 1.49 GiB vs the
    # 1.5 GiB slice): stays monolithic; doubling again must split
    cases48 = {16: 1, 32: 1, 64: 1, 128: 2}
    for b, want in cases48.items():
        got = m48.recommended_grad_accum(b, t48, itemsize=2)
        assert got == want, f"48k B={b}: got G={got}, want {want}"


def test_fast_recommended_grad_accum_policy():
    """Fast family: measured 2702 audio-s/s at B=128 G=2 (microbatch 64)
    vs 2024 unsplit; the shipped B=72 recipe and anything that can't hit
    the measured [64, 72] microbatch window stays unsplit."""
    from fullsubnet_tpu.models.fast_fullsubnet import FastFullSubNet

    m = FastFullSubNet()
    t = int(16000 * 3.072) // 256 + 1
    cases = {64: 1, 72: 1, 96: 1, 128: 2, 144: 2, 256: 4, 640: 10}
    for b, want in cases.items():
        got = m.recommended_grad_accum(b, t, itemsize=2)
        assert got == want, f"B={b}: got G={got}, want {want}"
        assert b % got == 0
    # the [64, 72] window was measured at ~3 s crops only: long crops
    # (30 s, ~1876 mel frames) stay unsplit — capacity there is owned by
    # the kernel's chunked-stash escape, not by an unmeasured G policy
    t_long = int(16000 * 30.0) // 256 + 1
    assert m.recommended_grad_accum(128, t_long, itemsize=2) == 1


def test_improved_grad_accum_respects_data_axis():
    from fullsubnet_tpu.models.improved_fullsubnet import ImprovedFullSubNet
    from fullsubnet_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(num_data=4, num_subband=2)
    m = ImprovedFullSubNet()
    t = int(16000 * 3.072) // 128 + 1
    g = m.recommended_grad_accum(512, t, itemsize=2, mesh=mesh)
    assert 512 % g == 0
    assert (512 // g) % 4 == 0  # data axis divisibility
    # 4-way data sharding quarters every section's rows: the same global
    # batch needs a split no larger than the single-chip pick
    assert g <= m.recommended_grad_accum(512, t, itemsize=2)


def test_recommended_grad_accum_respects_mesh():
    """With a mesh, microbatches must stay divisible by the data axis
    and the kernel's row split — and per-device capacity scales, so the
    same global shape needs a smaller (or equal) split."""
    from fullsubnet_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(num_data=4, num_subband=2)
    m = MODEL_REGISTRY["fullsubnet"]()
    t_long = int(16000 * 30.0) // 256 + 1
    g = m.recommended_grad_accum(256, t_long, itemsize=2, drop_groups=2,
                                 mesh=mesh)
    assert 256 % g == 0
    assert (256 // g) % 4 == 0  # data axis divisibility
    assert g <= 4  # 8 devices hold at least what one chip held at G=4


def test_accum_on_device_mesh(full_setup):  # noqa: F811
    """The accumulated step compiles and runs under a multi-device mesh
    (microbatch slicing stays inside each device's shard)."""
    cfg_path, _tmp = full_setup
    if len(jax.devices()) < 2:
        pytest.skip("needs the 8-device CPU mesh")
    cfg = load_config(cfg_path)
    cfg["trainer"]["train"]["grad_accum_steps"] = 2
    cfg["trainer"]["mesh"] = {"data": 4, "subband": 2}
    tr = Trainer(cfg, experiment_name="accum_mesh")
    rng = np.random.default_rng(5)
    noisy = jnp.asarray(rng.standard_normal((8, 6400)).astype(np.float32) * 0.1)
    state, loss = tr._train_step(tr.state, noisy, noisy * 0.8)
    assert np.isfinite(float(loss))


def test_largest_compatible_accum():
    """Explicitly configured splits that don't divide the batch fall
    back to the nearest smaller compatible split (never silently G=1 —
    the user configured accumulation to avoid an OOM)."""
    from fullsubnet_tpu.train.accum import largest_compatible_accum

    assert largest_compatible_accum(4, 256, 1) == 4
    assert largest_compatible_accum(3, 128, 1) == 2  # 3 ∤ 128 -> 2
    assert largest_compatible_accum(4, 250, 1) == 2  # partial batch
    assert largest_compatible_accum(4, 125, 1) == 1  # no even split
    assert largest_compatible_accum(4, 256, 8) == 4  # 256 % (4*8) == 0
    assert largest_compatible_accum(3, 128, 8) == 2  # 128 % (3*8) != 0
    assert largest_compatible_accum(16, 8, 1) == 8   # capped at batch


def test_explicit_accum_indivisible_falls_back_compatibly(full_setup):  # noqa: F811
    """grad_accum_steps=3 with batch 8 must run a compatible split
    (G=2), not the monolithic step — and stay exactly equivalent."""
    cfg_path, tmp_path = full_setup
    t3 = _trainer_with_accum(cfg_path, tmp_path, 3, "accum3")
    t1 = _trainer_with_accum(cfg_path, tmp_path, 1, "accum3ref")

    rng = np.random.default_rng(7)
    noisy = jnp.asarray(rng.standard_normal((8, 6400)).astype(np.float32) * 0.1)
    clean = noisy * 0.8

    s3, l3 = t3._train_step(t3.state, noisy, clean)
    s1, l1 = t1._train_step(t1.state, noisy, clean)
    assert float(l3) == pytest.approx(float(l1), rel=1e-5)
    for a, b in zip(jax.tree.leaves(s3["params"]), jax.tree.leaves(s1["params"])):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-5, atol=2e-6,
        )


def test_auto_fwd_row_tile():
    from fullsubnet_tpu.ops.subband_lstm import auto_fwd_row_tile

    assert auto_fwd_row_tile(640) == 384    # 2x384=768, not 2x512=1024
    assert auto_fwd_row_tile(800) == 512    # even split needs 512
    assert auto_fwd_row_tile(128) == 128
    assert auto_fwd_row_tile(192) == 256    # one 128-multiple tile
    assert auto_fwd_row_tile(257) == 384
    assert auto_fwd_row_tile(32896) == 512  # flagship B=128: unchanged
    assert auto_fwd_row_tile(1028) == 384   # bucketed B=4: 3x384
    assert auto_fwd_row_tile(512) == 512
