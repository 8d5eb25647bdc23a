"""Sharded multi-device inference == single-device output."""

import jax
import jax.numpy as jnp
import numpy as np

from fullsubnet_tpu.models import FullSubNet
from fullsubnet_tpu.parallel.inference import make_parallel_enhancer
from fullsubnet_tpu.parallel.mesh import make_mesh


def _model():
    model = FullSubNet(
        num_freqs=33, sb_num_neighbors=3, fb_model_hidden_size=16,
        sb_model_hidden_size=12,
    )
    params = model.init(jax.random.PRNGKey(0), weight_init=False)
    return model, params


def _single_device_reference(model, params, noisy, n_fft=64, hop=32):
    from fullsubnet_tpu.acoustics.mask import decompress_cIRM
    from fullsubnet_tpu.acoustics.stft import istft, stft_complex

    spec = stft_complex(noisy, n_fft, hop, n_fft)
    mag = jnp.abs(spec)[:, None]
    crm = model(params, mag, dropping_band=False)
    crm = decompress_cIRM(jnp.transpose(crm, (0, 2, 3, 1)))
    er = crm[..., 0] * spec.real - crm[..., 1] * spec.imag
    ei = crm[..., 1] * spec.real + crm[..., 0] * spec.imag
    return istft((er, ei), n_fft, hop, n_fft, length=noisy.shape[-1],
                 input_type="real_imag")


def test_parallel_enhancer_matches_single_device():
    assert len(jax.devices()) == 8
    for shape in [(4, 2), (8, 1), (2, 4)]:  # (data, subband)
        mesh = make_mesh(num_data=shape[0], num_subband=shape[1])
        model, params = _model()
        fn = make_parallel_enhancer(model, mesh, n_fft=64, hop_length=32,
                                    win_length=64)
        rng = np.random.default_rng(0)
        noisy = jnp.asarray(rng.standard_normal((8, 4000)).astype(np.float32))
        out = fn(params, noisy)
        ref = _single_device_reference(model, params, noisy)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-3
        )


def test_parallel_enhancer_output_sharded():
    mesh = make_mesh(num_data=4, num_subband=2)
    model, params = _model()
    fn = make_parallel_enhancer(model, mesh, n_fft=64, hop_length=32,
                                win_length=64)
    noisy = jnp.ones((8, 2000), jnp.float32)
    out = fn(params, noisy)
    # output is sharded over the data axis
    assert len(out.sharding.device_set) >= 4


def test_shard_mapped_pallas_kernel_matches_unsharded():
    """The multi-chip kernel path: when the sharding hint carries a mesh,
    _pallas_subband shard_maps the fused kernel over the row axes. Rows are
    independent sequences, so the sharded result (8-device CPU mesh,
    interpret-mode kernel) must equal the unsharded scan forward — and the
    custom VJP must psum weight grads back to replicated correctly."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from fullsubnet_tpu.models import FullSubNet

    model = FullSubNet(
        num_freqs=32, sb_num_neighbors=3, fb_model_hidden_size=16,
        sb_model_hidden_size=12, norm_type="cumulative_laplace_norm",
    )
    params = model.init(jax.random.PRNGKey(0), weight_init=False)
    x = jnp.asarray(
        np.abs(np.random.default_rng(1).standard_normal((2, 1, 32, 21))).astype(
            np.float32
        )
    )
    ref = model(params, x, dropping_band=False)

    devices = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, axis_names=("data", "subband"))
    sb_sh = NamedSharding(mesh, P(("data", "subband"), None, None))

    def hint(v):
        return jax.lax.with_sharding_constraint(v, sb_sh)

    hint.mesh = mesh
    hint.row_axes = ("data", "subband")

    # drive _pallas_subband directly (the CPU backend gate would otherwise
    # route to the chunked scan); interpret=True runs the kernel per shard
    xx = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, model.look_ahead)))
    fb_in = model.norm(xx).reshape(2, 32, -1)
    fb_out = model.fb_model(params["fb_model"], fb_in).reshape(2, 1, 32, -1)
    noisy_pad = jnp.pad(xx[:, 0], ((0, 0), (3, 3), (0, 0)), mode="reflect")
    mu = model._sb_norm_mu(noisy_pad, fb_out[:, 0], 32)

    out = model._pallas_subband(
        params, noisy_pad, fb_out[:, 0], 32, mu, mu.shape[1] == 1,
        sharding_hint=hint, interpret=True,
    )[..., model.look_ahead :]
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
    )

    # gradient through the shard_mapped TRAIN kernel == unsharded gradient
    tgt = jnp.asarray(
        np.random.default_rng(2).standard_normal(ref.shape).astype(np.float32)
    )

    def loss_sharded(p):
        fb_i = model.norm(xx).reshape(2, 32, -1)
        fb_o = model.fb_model(p["fb_model"], fb_i).reshape(2, 1, 32, -1)
        o = model._pallas_subband(
            p, noisy_pad, fb_o[:, 0], 32,
            model._sb_norm_mu(noisy_pad, fb_o[:, 0], 32),
            False, sharding_hint=hint, interpret=True, training=True,
        )[..., model.look_ahead :]
        return jnp.mean(jnp.square(o - tgt))

    def loss_ref(p):
        return jnp.mean(jnp.square(model(p, x, dropping_band=False) - tgt))

    ls, gs = jax.value_and_grad(loss_sharded)(params)
    lr, gr = jax.value_and_grad(loss_ref)(params)
    np.testing.assert_allclose(float(ls), float(lr), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gr)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-3
        )


def test_shard_mapped_pallas_kernel_chunked_vjp():
    """shard_map + the TIME-CHUNKED custom VJP (tiny stash budget): the
    per-shard chunked backward kernels must still produce the unsharded
    gradients, with weight grads psummed back to replicated."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from fullsubnet_tpu.models import FullSubNet

    model = FullSubNet(
        num_freqs=32, sb_num_neighbors=3, fb_model_hidden_size=16,
        sb_model_hidden_size=12, norm_type="cumulative_laplace_norm",
    )
    model._PALLAS_TRAIN_STASH_BUDGET = 4096  # force the chunked VJP
    params = model.init(jax.random.PRNGKey(0), weight_init=False)
    x = jnp.asarray(
        np.abs(np.random.default_rng(5).standard_normal((2, 1, 32, 21))).astype(
            np.float32
        )
    )
    xx = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, model.look_ahead)))
    noisy_pad = jnp.pad(xx[:, 0], ((0, 0), (3, 3), (0, 0)), mode="reflect")
    tgt = jnp.asarray(
        np.random.default_rng(6).standard_normal((2, 2, 32, 21)).astype(
            np.float32
        )
    )

    devices = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, axis_names=("data", "subband"))
    sb_sh = NamedSharding(mesh, P(("data", "subband"), None, None))

    def hint(v):
        return jax.lax.with_sharding_constraint(v, sb_sh)

    hint.mesh = mesh
    hint.row_axes = ("data", "subband")

    def loss_sharded(p):
        fb_i = model.norm(xx).reshape(2, 32, -1)
        fb_o = model.fb_model(p["fb_model"], fb_i).reshape(2, 1, 32, -1)
        mu = model._sb_norm_mu(noisy_pad, fb_o[:, 0], 32)
        o = model._pallas_subband(
            p, noisy_pad, fb_o[:, 0], 32, mu, mu.shape[1] == 1,
            sharding_hint=hint, interpret=True, training=True,
        )[..., model.look_ahead :]
        return jnp.mean(jnp.square(o - tgt))

    def loss_ref(p):
        return jnp.mean(jnp.square(model(p, x, dropping_band=False) - tgt))

    ls, gs = jax.value_and_grad(loss_sharded)(params)
    lr, gr = jax.value_and_grad(loss_ref)(params)
    np.testing.assert_allclose(float(ls), float(lr), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gr)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-3
        )


def test_shard_mapped_row_group_remat_grads():
    """Row-group remat COMPOSED with the shard_mapped kernel: each
    checkpointed group's kernel call shard_maps over the (data, subband)
    row axes; forward and gradients must equal the unsharded, ungrouped
    reference forward."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from fullsubnet_tpu.models import FullSubNet

    model = FullSubNet(
        num_freqs=32, sb_num_neighbors=3, fb_model_hidden_size=16,
        sb_model_hidden_size=12, norm_type="cumulative_laplace_norm",
    )
    params = model.init(jax.random.PRNGKey(3), weight_init=False)
    x = jnp.asarray(
        np.abs(np.random.default_rng(4).standard_normal((4, 1, 32, 15))).astype(
            np.float32
        )
    )
    devices = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, axis_names=("data", "subband"))
    sb_sh = NamedSharding(mesh, P(("data", "subband"), None, None))

    def hint(v):
        return jax.lax.with_sharding_constraint(v, sb_sh)

    hint.mesh = mesh
    hint.row_axes = ("data", "subband")

    xx = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, model.look_ahead)))
    noisy_pad = jnp.pad(xx[:, 0], ((0, 0), (3, 3), (0, 0)), mode="reflect")
    tgt = jnp.asarray(
        np.random.default_rng(5).standard_normal((4, 2, 32, 15)).astype(
            np.float32
        )
    )

    def loss(p, row_groups, use_hint):
        fb_i = model.norm(xx).reshape(4, 32, -1)
        fb_o = model.fb_model(p["fb_model"], fb_i).reshape(4, 1, 32, -1)
        mu = model._sb_norm_mu(noisy_pad, fb_o[:, 0], 32)
        o = model._pallas_subband(
            p, noisy_pad, fb_o[:, 0], 32, mu, mu.shape[1] == 1,
            sharding_hint=hint if use_hint else None,
            interpret=True, training=True, row_groups=row_groups,
        )[..., model.look_ahead :]
        return jnp.mean(jnp.square(o - tgt))

    def loss_ref(p):
        return jnp.mean(jnp.square(model(p, x, dropping_band=False) - tgt))

    lr, gr = jax.value_and_grad(loss_ref)(params)
    lg, gg = jax.value_and_grad(lambda p: loss(p, 2, True))(params)
    np.testing.assert_allclose(float(lg), float(lr), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gg), jax.tree.leaves(gr)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-3
        )


def test_multislice_mesh_layout_and_psum():
    """[trainer.mesh] slices: the data axis is slice-major (pseudo-slices
    on CPU), sub-band stays within a slice, and a data-axis psum runs."""
    devs = jax.devices()[:8]
    mesh = make_mesh(num_data=4, num_subband=2, devices=devs, num_slices=2)
    assert mesh.devices.shape == (4, 2)
    # slice-major data axis: rows 0-1 come from the first pseudo-slice
    # (devices 0-3), rows 2-3 from the second (devices 4-7)
    first = {d.id for d in mesh.devices[:2].ravel()}
    second = {d.id for d in mesh.devices[2:].ravel()}
    assert first == {d.id for d in devs[:4]}
    assert second == {d.id for d in devs[4:]}

    # the gradient-sync shape: mean over the data axis crosses slices
    from jax.sharding import NamedSharding, PartitionSpec as P

    x = jnp.arange(8.0).reshape(4, 2)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "subband")))
    out = jax.jit(
        lambda v: jnp.mean(v, axis=0),
        out_shardings=NamedSharding(mesh, P("subband")),
    )(xs)
    np.testing.assert_allclose(np.asarray(out), np.mean(np.arange(8.0).reshape(4, 2), axis=0))


def test_multislice_requires_data_divisible_by_slices():
    import pytest

    with pytest.raises(AssertionError, match="divisible by the slice count"):
        make_mesh(num_data=3, num_subband=2, devices=jax.devices()[:6],
                  num_slices=2)


def test_parallel_bucketed_enhancer_matches_single_device():
    # multi-chip x batched x per-example lengths: the production shape.
    # Each padded row's valid prefix must equal the unsharded unpadded run.
    mesh = make_mesh(num_data=4, num_subband=2)
    model, params = _model()
    fn = make_parallel_enhancer(
        model, mesh, n_fft=64, hop_length=32, win_length=64, bucketed=True
    )
    rng = np.random.default_rng(1)
    lens = [3000, 2600, 3900, 2100, 3500, 2800, 3100, 2400]
    bucket = 4000  # covers max(L) + n_fft
    padded = np.zeros((8, bucket), np.float32)
    for i, L in enumerate(lens):
        padded[i, :L] = rng.standard_normal(L).astype(np.float32)
    out = np.asarray(
        fn(params, jnp.asarray(padded), jnp.asarray(lens, jnp.int32))
    )
    for i, L in enumerate(lens):
        ref = _single_device_reference(
            model, params, jnp.asarray(padded[i:i + 1, :L])
        )
        np.testing.assert_allclose(
            out[i, :L], np.asarray(ref)[0], atol=1e-4, rtol=1e-3
        )
