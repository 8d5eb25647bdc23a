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
