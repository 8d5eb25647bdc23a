"""Pallas fused sub-band LSTM kernel parity (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from fullsubnet_tpu.nn.init import linear_init
from fullsubnet_tpu.nn.rnn import lstm_forward, lstm_init
from fullsubnet_tpu.models import FullSubNet
from fullsubnet_tpu.ops.subband_lstm import fused_subband_lstm


def _reference(p, fc, x):
    """Scan-LSTM reference: x [T, N, F] -> [T, N, out]."""
    ref = lstm_forward(p, jnp.swapaxes(x, 0, 1)) @ fc["weight"].T + fc["bias"]
    return jnp.swapaxes(ref, 0, 1)


def test_kernel_matches_scan_reference():
    T, N, F_in, H = 13, 20, 32, 48
    p = lstm_init(jax.random.PRNGKey(0), F_in, H, num_layers=2)
    fc = linear_init(jax.random.PRNGKey(1), H, 2)
    x = jax.random.normal(jax.random.PRNGKey(2), (T, N, F_in))
    ref = _reference(p, fc, x)
    out = fused_subband_lstm(x, p[0][0], p[1][0], fc, row_tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_kernel_row_and_time_padding():
    """N not divisible by row_tile and T not divisible by 8."""
    T, N, F_in, H = 11, 13, 8, 16
    p = lstm_init(jax.random.PRNGKey(3), F_in, H, num_layers=2)
    fc = linear_init(jax.random.PRNGKey(4), H, 2)
    x = jax.random.normal(jax.random.PRNGKey(5), (T, N, F_in))
    ref = _reference(p, fc, x)
    out = fused_subband_lstm(x, p[0][0], p[1][0], fc, row_tile=8, interpret=True)
    assert out.shape == (T, N, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_kernel_time_major_features_layout():
    T, N, F_in, H = 9, 16, 8, 16
    p = lstm_init(jax.random.PRNGKey(6), F_in, H, num_layers=2)
    fc = linear_init(jax.random.PRNGKey(7), H, 2)
    x = jax.random.normal(jax.random.PRNGKey(8), (T, N, F_in))
    a = fused_subband_lstm(x, p[0][0], p[1][0], fc, row_tile=8, interpret=True)
    b = fused_subband_lstm(
        jnp.swapaxes(x, 1, 2), p[0][0], p[1][0], fc,
        row_tile=8, interpret=True, time_major_features=True,
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_model_pallas_branch_matches_forward():
    """FullSubNet._pallas_subband (interpret) == standard forward."""
    for norm in ("offline_laplace_norm", "cumulative_laplace_norm"):
        model = FullSubNet(
            num_freqs=33, sb_num_neighbors=3, fb_model_hidden_size=16,
            sb_model_hidden_size=12, norm_type=norm,
        )
        params = model.init(jax.random.PRNGKey(0), weight_init=False)
        x = jnp.asarray(
            np.abs(
                np.random.default_rng(0).standard_normal((2, 1, 33, 37))
            ).astype(np.float32)
        )
        ref = model(params, x, dropping_band=False)

        xx = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, model.look_ahead)))
        fb_in = model.norm(xx).reshape(2, 33, -1)
        fb_out = model.fb_model(params["fb_model"], fb_in).reshape(2, 1, 33, -1)
        noisy_pad = jnp.pad(xx[:, 0], ((0, 0), (3, 3), (0, 0)), mode="reflect")
        mu = model._sb_norm_mu(noisy_pad, fb_out[:, 0], 33)
        out = model._pallas_subband(
            params, noisy_pad, fb_out[:, 0], 33, mu, mu.shape[1] == 1,
            interpret=True,
        )[..., model.look_ahead :]
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
        )


def test_kernel_gru_matches_scan_reference():
    from fullsubnet_tpu.nn.rnn import gru_forward, gru_init

    T, N, F_in, H = 13, 20, 32, 48
    p = gru_init(jax.random.PRNGKey(0), F_in, H, num_layers=2)
    fc = linear_init(jax.random.PRNGKey(1), H, 2)
    x = jax.random.normal(jax.random.PRNGKey(2), (T, N, F_in))
    ref = gru_forward(p, jnp.swapaxes(x, 0, 1)) @ fc["weight"].T + fc["bias"]
    ref = jnp.swapaxes(ref, 0, 1)
    out = fused_subband_lstm(x, p[0][0], p[1][0], fc, row_tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_model_pallas_branch_gru():
    """FullSubNet configured with GRU also routes through the kernel."""
    model = FullSubNet(
        num_freqs=33, sb_num_neighbors=3, fb_model_hidden_size=16,
        sb_model_hidden_size=12, sequence_model="GRU",
        norm_type="cumulative_laplace_norm",
    )
    params = model.init(jax.random.PRNGKey(0), weight_init=False)
    x = jnp.asarray(
        np.abs(np.random.default_rng(0).standard_normal((2, 1, 33, 37))).astype(
            np.float32
        )
    )
    ref = model(params, x, dropping_band=False)

    xx = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, model.look_ahead)))
    fb_in = model.norm(xx).reshape(2, 33, -1)
    fb_out = model.fb_model(params["fb_model"], fb_in).reshape(2, 1, 33, -1)
    noisy_pad = jnp.pad(xx[:, 0], ((0, 0), (3, 3), (0, 0)), mode="reflect")
    mu = model._sb_norm_mu(noisy_pad, fb_out[:, 0], 33)
    out = model._pallas_subband(
        params, noisy_pad, fb_out[:, 0], 33, mu, mu.shape[1] == 1, interpret=True
    )[..., model.look_ahead :]
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
    )


# --------------------------------------------------------------------------
# Training variant: custom-VJP gradient parity vs the differentiable scan
# --------------------------------------------------------------------------


def _grad_setup(cell, T, N, F_in, H, seed=0):
    from fullsubnet_tpu.nn.rnn import gru_init

    init = lstm_init if cell == "lstm" else gru_init
    p = init(jax.random.PRNGKey(seed), F_in, H, num_layers=2)
    fc = linear_init(jax.random.PRNGKey(seed + 1), H, 2)
    x = jax.random.normal(jax.random.PRNGKey(seed + 2), (T, N, F_in))
    tgt = jax.random.normal(jax.random.PRNGKey(seed + 3), (T, N, 2))
    return p, fc, x, tgt


def _assert_tree_close(a, b, atol, rtol):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for ga, gb in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(ga), np.asarray(gb), atol=atol, rtol=rtol
        )


def _check_grad_parity(cell, T, N, F_in, H, row_tile, **kernel_kwargs):
    from fullsubnet_tpu.nn.rnn import gru_forward
    from fullsubnet_tpu.nn.rnn import lstm_forward as lf
    from fullsubnet_tpu.ops.subband_lstm import fused_subband_lstm_train

    fwd = lf if cell == "lstm" else gru_forward
    p, fc, x, tgt = _grad_setup(cell, T, N, F_in, H)

    def loss_ref(params, x):
        pp, pfc = params
        out = fwd(pp, jnp.swapaxes(x, 0, 1)) @ pfc["weight"].T + pfc["bias"]
        return jnp.mean(jnp.square(jnp.swapaxes(out, 0, 1) - tgt))

    def loss_fused(params, x):
        pp, pfc = params
        out = fused_subband_lstm_train(
            x, pp[0][0], pp[1][0], pfc, row_tile=row_tile, interpret=True,
            **kernel_kwargs,
        )
        return jnp.mean(jnp.square(out - tgt))

    lr, gr = jax.value_and_grad(loss_ref, argnums=(0, 1))((p, fc), x)
    lft, gf = jax.value_and_grad(loss_fused, argnums=(0, 1))((p, fc), x)
    np.testing.assert_allclose(float(lft), float(lr), rtol=1e-5)
    _assert_tree_close(gf, gr, atol=1e-5, rtol=1e-4)


def test_train_kernel_grad_parity_lstm():
    _check_grad_parity("lstm", T=13, N=16, F_in=32, H=48, row_tile=8)


def test_train_kernel_grad_parity_gru():
    _check_grad_parity("gru", T=13, N=16, F_in=32, H=48, row_tile=8)


def test_train_kernel_grad_parity_padded():
    """N not divisible by row_tile, T not divisible by 8."""
    _check_grad_parity("lstm", T=11, N=13, F_in=8, H=16, row_tile=8)


# --- time-chunked stash (remat at chunk granularity) ----------------------


def test_train_kernel_grad_parity_chunked_lstm():
    """T spans several chunks; T not a multiple of the chunk."""
    _check_grad_parity(
        "lstm", T=29, N=16, F_in=8, H=16, row_tile=8, time_chunk=8
    )


def test_train_kernel_grad_parity_chunked_gru():
    _check_grad_parity(
        "gru", T=29, N=16, F_in=8, H=16, row_tile=8, time_chunk=8
    )


def test_train_kernel_grad_parity_chunked_padded_rows():
    """Chunked remat with N not divisible by row_tile."""
    _check_grad_parity(
        "lstm", T=17, N=13, F_in=8, H=16, row_tile=8, time_chunk=8
    )


def test_train_kernel_auto_chunk_from_budget():
    """A tiny stash budget forces the chunked path automatically."""
    _check_grad_parity(
        "lstm", T=29, N=16, F_in=8, H=16, row_tile=8, stash_budget=4096
    )


def test_pick_chunk_bounds():
    from fullsubnet_tpu.ops.subband_lstm import _pick_chunk

    budget = 6 * 2**30
    # fits: stay monolithic
    assert _pick_chunk(192, 128, 384, "lstm", 2, budget) == 0
    # does not fit, budget achievable: a multiple of 8 that respects it
    k = _pick_chunk(1880, 16384, 384, "lstm", 2, budget)
    per_step = 4 * 16384 * 384 * 2
    t8 = -(-1880 // 8) * 8
    assert k % 8 == 0 and 8 <= k <= t8
    assert (-(-t8 // k) + k) * per_step <= budget
    # budget unachievable even at the sqrt(T) minimum: returns that minimum
    k = _pick_chunk(1880, 32768, 384, "lstm", 2, budget)
    assert k == max(8, int(round((t8**0.5) / 8.0)) * 8)


# --- split-dW backward (wide hidden sizes) ---------------------------------


def test_train_kernel_grad_parity_split_dw_lstm():
    _check_grad_parity(
        "lstm", T=13, N=16, F_in=32, H=48, row_tile=8, split_dw=True
    )


def test_train_kernel_grad_parity_split_dw_gru():
    _check_grad_parity(
        "gru", T=13, N=16, F_in=32, H=48, row_tile=8, split_dw=True
    )


def test_train_kernel_grad_parity_split_dw_chunked():
    """Both escapes at once: wide-H streaming dW + chunk-remat stash."""
    _check_grad_parity(
        "lstm", T=21, N=13, F_in=8, H=16, row_tile=8,
        split_dw=True, time_chunk=8,
    )


def test_model_fused_training_chunked_grads():
    """FullSubNet's fused drop_band training pipeline with a stash budget
    small enough to force the time-chunked VJP: gradients == the standard
    (unfused, scan) forward path."""
    model = FullSubNet(
        num_freqs=32, sb_num_neighbors=3, fb_model_hidden_size=16,
        sb_model_hidden_size=12, norm_type="cumulative_laplace_norm",
    )
    model._PALLAS_TRAIN_STASH_BUDGET = 4096  # force chunking in the kernel
    params = model.init(jax.random.PRNGKey(0), weight_init=False)
    x = jnp.asarray(
        np.abs(
            np.random.default_rng(3).standard_normal((2, 1, 32, 21))
        ).astype(np.float32)
    )
    xx = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, model.look_ahead)))
    noisy_pad = jnp.pad(xx[:, 0], ((0, 0), (3, 3), (0, 0)), mode="reflect")
    tgt = jnp.asarray(
        np.random.default_rng(4)
        .standard_normal((2, 2, 32, 21))
        .astype(np.float32)
    )

    def loss_pallas(p):
        fb_in = model.norm(xx).reshape(2, 32, -1)
        fb_out = model.fb_model(p["fb_model"], fb_in).reshape(2, 1, 32, -1)
        mu = model._sb_norm_mu(noisy_pad, fb_out[:, 0], 32)
        o = model._pallas_subband(
            p, noisy_pad, fb_out[:, 0], 32, mu, mu.shape[1] == 1,
            interpret=True, training=True,
        )[..., model.look_ahead :]
        return jnp.mean(jnp.square(o - tgt))

    def loss_ref(p):
        return jnp.mean(
            jnp.square(model(p, x, dropping_band=False) - tgt)
        )

    lr, gr = jax.value_and_grad(loss_ref)(params)
    lp, gp = jax.value_and_grad(loss_pallas)(params)
    np.testing.assert_allclose(float(lp), float(lr), rtol=1e-5)
    _assert_tree_close(gp, gr, atol=2e-5, rtol=1e-3)


def test_model_row_group_remat_grads():
    """Row-group remat (batch split + jax.checkpoint per group): forward
    and gradients == the standard (unfused, scan) path. B=4 split into
    G=2 groups."""
    model = FullSubNet(
        num_freqs=32, sb_num_neighbors=3, fb_model_hidden_size=16,
        sb_model_hidden_size=12, norm_type="cumulative_laplace_norm",
    )
    params = model.init(jax.random.PRNGKey(0), weight_init=False)
    x = jnp.asarray(
        np.abs(
            np.random.default_rng(7).standard_normal((4, 1, 32, 15))
        ).astype(np.float32)
    )
    xx = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, model.look_ahead)))
    noisy_pad = jnp.pad(xx[:, 0], ((0, 0), (3, 3), (0, 0)), mode="reflect")
    tgt = jnp.asarray(
        np.random.default_rng(8)
        .standard_normal((4, 2, 32, 15))
        .astype(np.float32)
    )

    def loss_grouped(p):
        fb_in = model.norm(xx).reshape(4, 32, -1)
        fb_out = model.fb_model(p["fb_model"], fb_in).reshape(4, 1, 32, -1)
        mu = model._sb_norm_mu(noisy_pad, fb_out[:, 0], 32)
        o = model._pallas_subband(
            p, noisy_pad, fb_out[:, 0], 32, mu, mu.shape[1] == 1,
            interpret=True, training=True, row_groups=2,
        )[..., model.look_ahead :]
        return jnp.mean(jnp.square(o - tgt))

    def loss_ref(p):
        return jnp.mean(
            jnp.square(model(p, x, dropping_band=False) - tgt)
        )

    lr, gr = jax.value_and_grad(loss_ref)(params)
    lg, gg = jax.value_and_grad(loss_grouped)(params)
    np.testing.assert_allclose(float(lg), float(lr), rtol=1e-5)
    _assert_tree_close(gg, gr, atol=2e-5, rtol=1e-3)


def test_model_row_group_remat_with_drop_band():
    """row_groups x drop_groups interaction: each slice's group-major
    reorder is local, so the grouped path must re-permute its output to
    the GLOBAL group-major (drop_band) order — forward and grads must
    equal the ungrouped fused drop path exactly."""
    model = FullSubNet(
        num_freqs=32, sb_num_neighbors=3, fb_model_hidden_size=16,
        sb_model_hidden_size=12, norm_type="cumulative_laplace_norm",
    )
    params = model.init(jax.random.PRNGKey(0), weight_init=False)
    x = jnp.asarray(
        np.abs(
            np.random.default_rng(9).standard_normal((4, 1, 32, 15))
        ).astype(np.float32)
    )
    xx = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, model.look_ahead)))
    noisy_pad = jnp.pad(xx[:, 0], ((0, 0), (3, 3), (0, 0)), mode="reflect")
    tgt = jnp.asarray(
        np.random.default_rng(10)
        .standard_normal((4, 2, 16, 15))  # F' = 32 // 2 drop groups
        .astype(np.float32)
    )

    def loss(p, row_groups):
        fb_in = model.norm(xx).reshape(4, 32, -1)
        fb_out = model.fb_model(p["fb_model"], fb_in).reshape(4, 1, 32, -1)
        mu = model._sb_norm_mu(noisy_pad, fb_out[:, 0], 32)
        o = model._pallas_subband(
            p, noisy_pad, fb_out[:, 0], 32, mu, mu.shape[1] == 1,
            interpret=True, drop_groups=2, training=True,
            row_groups=row_groups,
        )[..., model.look_ahead :]
        return jnp.mean(jnp.square(o - tgt))

    lr, gr = jax.value_and_grad(lambda p: loss(p, 1))(params)
    lg, gg = jax.value_and_grad(lambda p: loss(p, 2))(params)
    np.testing.assert_allclose(float(lg), float(lr), rtol=1e-5)
    _assert_tree_close(gg, gr, atol=2e-5, rtol=1e-3)


def test_pick_row_groups_routing():
    """The capacity router returns (1, None) when the full batch fits,
    the smallest valid batch split + its time-chunk when only groups
    fit, and (0, None) when nothing does. Splits must keep per-group
    batches divisible by drop_groups."""
    model = FullSubNet()  # H=384 LSTM sub-band stage
    t, unit, f_eff = 1880, 32, 128  # ~30 s crops, drop_band G=2

    # small batch: fits outright
    assert model._pick_row_groups(8, f_eff, 188, unit, 2, 2) == (1, None)
    # B=256 x 30 s bf16: the measured fallback shape — must now split
    g, chunk = model._pick_row_groups(256, f_eff, t, unit, 2, 2)
    assert g > 1
    bg = 256 // g
    assert bg % 2 == 0  # drop_groups divisibility
    assert chunk is not None and (chunk == 0 or chunk % 8 == 0)
    # the per-group transient-aware peak respects the budget, and the
    # next-smaller split would not
    _, peak = model._grouped_chunk(t, bg * f_eff, 384, unit, "lstm", 2,
                                   model._PALLAS_TRAIN_STASH_BUDGET)
    assert peak <= model._PALLAS_TRAIN_STASH_BUDGET
    for smaller in (gg for gg in (2, 4, 8, 16, 32, 64) if gg < g):
        _, p = model._grouped_chunk(
            t, (256 // smaller) * f_eff, 384, unit, "lstm", 2,
            model._PALLAS_TRAIN_STASH_BUDGET,
        )
        assert p > model._PALLAS_TRAIN_STASH_BUDGET
    # absurd budget: nothing fits -> scan fallback
    model._PALLAS_TRAIN_STASH_BUDGET = 2**20
    assert model._pick_row_groups(256, f_eff, t, unit, 2, 2) == (0, None)


def test_auto_bwd_row_tile():
    """The backward-tile picker: largest of (512, 256, 128) fitting the
    VMEM estimate cap, bounded by the padded row count."""
    from fullsubnet_tpu.nn.init import linear_init
    from fullsubnet_tpu.nn.rnn import lstm_init
    from fullsubnet_tpu.ops.subband_lstm import (
        _BWD_VMEM_ESTIMATE_CAP,
        _bwd_vmem_estimate,
        auto_bwd_row_tile,
        train_stash_bytes,
    )

    p = lstm_init(jax.random.PRNGKey(0), 32, 384, num_layers=2)
    # flagship sub-band stage, many rows: the big tile (measured +8%)
    assert auto_bwd_row_tile((p[0][0], p[1][0]), 2, 16384) == 512
    # row-count bound: small stages stay at small tiles
    assert auto_bwd_row_tile((p[0][0], p[1][0]), 2, 100) == 128
    assert auto_bwd_row_tile((p[0][0], p[1][0]), 2, 200) == 256
    # NO-EXTRA-PADDING rule: a bigger tile is taken only when it pads
    # nothing beyond the 128-tile baseline (n=640 at tile 512 would pad
    # to 1024, 1.6x the work for ~8%) — this is also what makes the
    # 128-padded stash accounting in train_stash_bytes exact
    assert auto_bwd_row_tile((p[0][0], p[1][0]), 2, 640) == 128
    assert auto_bwd_row_tile((p[0][0], p[1][0]), 2, 768) == 256
    assert train_stash_bytes(16, 640, 384) < train_stash_bytes(16, 1024, 384)
    # wide f32 split layers: the VMEM cap pushes the tile down
    pw = lstm_init(jax.random.PRNGKey(0), 512, 512, num_layers=2)
    tw = auto_bwd_row_tile((pw[0][0], pw[1][0]), 4, 16384)
    assert tw < 512
    assert (
        _bwd_vmem_estimate(512, 512, 2048, tw, 4, "lstm", True)
        <= _BWD_VMEM_ESTIMATE_CAP
    )
    # a caller-forced split_dw is honored in the tile sizing
    assert auto_bwd_row_tile(
        (pw[0][0], pw[1][0]), 4, 16384, split_dw=False
    ) <= tw


def test_auto_split_dw_vmem_estimate():
    """The per-layer VMEM estimate flips split_dw on exactly for the
    configurations whose fused accumulators bust the 12 MB estimate
    budget (kept there on purpose: admitting the wide layers fused was
    measured neutral-or-worse and OOMs fast_fullsubnet's HBM — see
    _FUSED_DW_VMEM_LIMIT)."""
    from fullsubnet_tpu.ops.subband_lstm import _auto_split_dw

    # flagship sub-band layers, bf16 at row_tile 128: fused fits
    assert not _auto_split_dw(32, 384, 4 * 384, 128, 2, "lstm")
    assert not _auto_split_dw(384, 384, 4 * 384, 128, 2, "lstm")
    # f32 at H=384 (e.g. a model without a bf16 policy): split
    assert _auto_split_dw(384, 384, 4 * 384, 128, 4, "lstm")
    # wide 512-hidden full-band stage, even in bf16: split
    assert _auto_split_dw(512, 512, 4 * 512, 128, 2, "lstm")


def test_inference_entry_is_differentiable():
    """jax.grad through fused_subband_lstm itself (not the _train twin)
    must work — the custom VJP is attached to both entries, so there is
    no non-differentiable kernel path left."""
    from fullsubnet_tpu.ops.subband_lstm import fused_subband_lstm

    p, fc, x, tgt = _grad_setup("lstm", T=9, N=12, F_in=8, H=16)

    def loss(params):
        pp, pfc = params
        out = fused_subband_lstm(
            x, pp[0][0], pp[1][0], pfc, row_tile=8, interpret=True
        )
        return jnp.mean(jnp.square(out - tgt))

    val, grads = jax.value_and_grad(loss)((p, fc))
    assert np.isfinite(float(val))
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))
