"""Aux components: ChannelWiseLayerNorm, group dropout, profiling, trainer
validation visualization."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from fullsubnet_tpu.acoustics.feature import (
    channel_wise_layer_norm,
    reduce_complexity_separately,
)


def test_channel_wise_layer_norm_matches_torch():
    torch.manual_seed(0)
    ln = torch.nn.LayerNorm(6)
    x = torch.randn(2, 6, 10)
    with torch.no_grad():
        ref = ln(x.transpose(1, 2)).transpose(1, 2).numpy()
    ours = channel_wise_layer_norm(
        jnp.asarray(x.numpy()),
        jnp.asarray(ln.weight.detach().numpy()),
        jnp.asarray(ln.bias.detach().numpy()),
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5, rtol=1e-4)


def _torch_reduce_complexity(sb, fb):
    """Reference base_model.py:48-100 restated."""
    sb, fb = torch.from_numpy(sb), torch.from_numpy(fb)
    batch_size, n_freqs = fb.shape[0], fb.shape[1]
    sub_batch_size = batch_size // 3
    out = []
    for idx in range(3):
        bidx = torch.arange(idx * sub_batch_size, (idx + 1) * sub_batch_size)
        fb_s = torch.index_select(fb, 0, bidx)
        sb_s = torch.index_select(sb, 0, bidx)
        fidx = torch.arange(idx + 1, n_freqs - 1, step=3)
        fb_s = torch.index_select(fb_s, 1, fidx)
        sb_s = torch.index_select(sb_s, 1, fidx)
        out.append(torch.cat([sb_s, fb_s], dim=-2))
    return torch.cat(out, dim=0).numpy()


def test_reduce_complexity_separately_matches_reference():
    rng = np.random.default_rng(0)
    sb = rng.standard_normal((6, 17, 1, 5, 8)).astype(np.float32)
    fb = rng.standard_normal((6, 17, 1, 3, 8)).astype(np.float32)
    ref = _torch_reduce_complexity(sb, fb)
    ours = np.asarray(
        reduce_complexity_separately(jnp.asarray(sb), jnp.asarray(fb))
    )
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_profiling_timed_and_memory():
    from fullsubnet_tpu.profiling import device_memory_stats, timed

    f = jax.jit(lambda x: x * 2 + 1)
    x = jnp.ones((128, 128))
    sec = timed(f, x, iters=3, warmup=1)
    assert sec > 0
    stats = device_memory_stats()
    assert len(stats) >= 1


def test_profiling_trace(tmp_path):
    from fullsubnet_tpu.profiling import annotate, trace

    with trace(str(tmp_path / "trace")):
        with annotate("test_span"):
            jax.block_until_ready(jnp.ones((64, 64)) @ jnp.ones((64, 64)))
    # a trace directory should have been produced
    assert any((tmp_path / "trace").rglob("*"))


def test_enable_compilation_cache(tmp_path, monkeypatch):
    import os

    import jax
    import jax.numpy as jnp

    from fullsubnet_tpu.utils import enable_compilation_cache

    monkeypatch.delenv("FULLSUBNET_COMPILE_CACHE", raising=False)
    assert enable_compilation_cache(None) is None  # unset -> stays off

    monkeypatch.setenv("FULLSUBNET_COMPILE_CACHE", str(tmp_path / "env_cache"))
    old_dir = jax.config.jax_compilation_cache_dir
    old_min = jax.config.jax_persistent_cache_min_compile_time_secs
    old_size = jax.config.jax_persistent_cache_min_entry_size_bytes
    try:
        p = enable_compilation_cache(None, min_compile_seconds=0.0)
        assert p == str(tmp_path / "env_cache")

        # explicit dir beats the env var; compiled executables persist
        p = enable_compilation_cache(
            str(tmp_path / "cache"), min_compile_seconds=0.0
        )
        f = jax.jit(lambda x: jnp.tanh(x @ x.T).sum())
        f(jnp.ones((32, 32))).block_until_ready()
        assert len(os.listdir(p)) > 0
    finally:
        jax.config.update("jax_compilation_cache_dir", old_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", old_min)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", old_size)
