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


# ---------------------------------------------------------------------------
# Bucketed time_domain (Improved FullSubNet valid_samples)
# ---------------------------------------------------------------------------


def _tiny_improved(norm):
    import jax

    from fullsubnet_tpu.models.improved_fullsubnet import ImprovedFullSubNet

    model = ImprovedFullSubNet(
        n_fft=64, hop_length=16, win_length=64, num_freqs=33,
        freq_cutoffs=(8, 16), sb_num_center_freqs=(1, 2, 4),
        sb_num_neighbor_freqs=(3, 3, 3), fb_num_center_freqs=(1, 2, 4),
        fb_num_neighbor_freqs=(3, 3, 3), fb_hidden_size=16,
        sb_hidden_size=12, norm_type=norm,
    )
    params = model.init(jax.random.PRNGKey(3), weight_init=False)
    return model, params


@pytest.mark.parametrize(
    "norm",
    [
        "offline_laplace_norm",
        "offline_gaussian_norm",
        "cumulative_laplace_norm",
    ],
)
def test_improved_valid_samples_exact(norm):
    """Model-level: zero-padded wave + valid_samples == unpadded run, for
    masked-offline and causal norms, ragged lengths."""
    import jax.numpy as jnp

    model, params = _tiny_improved(norm)
    rng = np.random.default_rng(17)
    for length in (1000, 1024, 777):
        wave = (0.2 * rng.standard_normal(length)).astype(np.float32)
        exact = np.asarray(model(params, jnp.asarray(wave)[None]))[0, 0]

        bucket = 1600
        padded = np.zeros((1, bucket), np.float32)
        padded[0, :length] = wave
        out = np.asarray(
            model(
                params, jnp.asarray(padded),
                valid_samples=jnp.asarray(length, jnp.int32),
            )
        )[0, 0]
        np.testing.assert_allclose(out[:length], exact, atol=2e-5)


def test_improved_valid_samples_batched_vector():
    """[B] per-example lengths in one padded batch: each row equals its
    own unpadded run."""
    import jax.numpy as jnp

    model, params = _tiny_improved("offline_laplace_norm")
    rng = np.random.default_rng(18)
    lengths = [900, 1111]
    waves = [
        (0.2 * rng.standard_normal(L)).astype(np.float32) for L in lengths
    ]
    bucket = 1600
    padded = np.zeros((2, bucket), np.float32)
    for i, w in enumerate(waves):
        padded[i, : len(w)] = w
    out = np.asarray(
        model(
            params, jnp.asarray(padded),
            valid_samples=jnp.asarray(lengths, jnp.int32),
        )
    )[:, 0]
    for i, w in enumerate(waves):
        exact = np.asarray(model(params, jnp.asarray(w)[None]))[0, 0]
        np.testing.assert_allclose(out[i, : len(w)], exact, atol=2e-5)


def test_time_domain_strategy_buckets(tmp_path):
    """Inferencer.time_domain routes Improved FullSubNet through the
    bucketed program: one compile serves several lengths, outputs exact."""
    import jax.numpy as jnp

    from fullsubnet_tpu.infer.inferencer import (
        Inferencer,
        time_domain_bucketed_capable,
    )

    model, params = _tiny_improved("offline_laplace_norm")
    assert time_domain_bucketed_capable(model)

    inf = Inferencer.__new__(Inferencer)  # compute-path-only instance
    inf.model = model
    inf.params = params
    inf.acoustics = {
        "n_fft": 64, "hop_length": 16, "win_length": 64, "sr": 16000,
    }
    inf.sr = 16000
    inf.inference_config = {"bucket_seconds": 0.1}
    inf.inference_args = {}
    inf._jitted = {}
    inf._model_kwargs = {}

    rng = np.random.default_rng(19)
    for length in (1000, 1313):  # same 0.1 s bucket grid -> one compile
        wave = (0.2 * rng.standard_normal(length)).astype(np.float32)
        got = inf.time_domain(jnp.asarray(wave)[None])
        exact = np.asarray(model(params, jnp.asarray(wave)[None]))[0, 0]
        assert got.shape == (length,)
        np.testing.assert_allclose(got, exact, atol=2e-5)
    assert "bucketed_td" in inf._jitted


# ---------------------------------------------------------------------------
# Bucketed full_band_crm_mask for Fast FullSubNet (valid_frames incl. the
# downsampled bottleneck clock's partial tail block)
# ---------------------------------------------------------------------------


def _tiny_fast(norm):
    from fullsubnet_tpu.models import FastFullSubNet

    model = FastFullSubNet(
        encoder_input_size=33,
        num_mels=8,
        noisy_input_num_neighbors=2,
        bottleneck_hidden_size=16,
        norm_type=norm,
    )
    params = model.init(jax.random.PRNGKey(5), weight_init=False)
    return model, params


@pytest.mark.parametrize(
    "norm",
    [
        "offline_laplace_norm",
        "offline_gaussian_norm",
        "cumulative_laplace_norm",
    ],
)
def test_fast_valid_frames_exact(norm):
    """Model-level: zero-padded magnitudes + valid_frames == unpadded run.
    Lengths cover both tail cases of real_time_downsampling at the TRUE
    frame count (vt = t + look_ahead 2, shrink 2: t=19 -> r=0, t=20 ->
    r=1) so the reconstructed partial-tail-block statistics are hit."""
    model, params = _tiny_fast(norm)
    rng = np.random.default_rng(21)
    bucket_t = 32
    for t in (19, 20, 31):
        mag = np.abs(rng.standard_normal((1, 1, 33, t))).astype(np.float32)
        exact = np.asarray(model(params, jnp.asarray(mag)))
        padded = np.zeros((1, 1, 33, bucket_t), np.float32)
        padded[..., :t] = mag
        out = np.asarray(
            model(
                params,
                jnp.asarray(padded),
                valid_frames=jnp.asarray(t, jnp.int32),
            )
        )
        assert out.shape == (1, 2, 33, bucket_t)
        np.testing.assert_allclose(out[..., :t], exact, atol=2e-5)


def test_fast_valid_frames_batched_vector():
    """[B] per-example frame counts in one padded batch: each row equals
    its own unpadded run (both offline-norm clocks masked per-example)."""
    model, params = _tiny_fast("offline_gaussian_norm")
    rng = np.random.default_rng(22)
    lengths = [19, 26]
    bucket_t = 32
    padded = np.zeros((2, 1, 33, bucket_t), np.float32)
    mags = []
    for i, t in enumerate(lengths):
        m = np.abs(rng.standard_normal((1, 33, t))).astype(np.float32)
        mags.append(m)
        padded[i, ..., :t] = m
    out = np.asarray(
        model(
            params,
            jnp.asarray(padded),
            valid_frames=jnp.asarray(lengths, jnp.int32),
        )
    )
    for i, t in enumerate(lengths):
        exact = np.asarray(model(params, jnp.asarray(mags[i])[None]))
        np.testing.assert_allclose(out[i : i + 1, ..., :t], exact, atol=2e-5)


def test_fast_bucketed_enhance_fn_exact():
    """build_bucketed_enhance_fn routes Fast FullSubNet (bucketed_capable)
    and its wave output over the true samples equals the direct
    (unpadded) full_band_crm_mask program."""
    from fullsubnet_tpu.infer.inferencer import (
        Inferencer,
        bucketed_capable,
        build_bucketed_enhance_fn,
    )

    model, params = _tiny_fast("offline_laplace_norm")
    assert bucketed_capable(model, "full_band_crm_mask")
    assert not bucketed_capable(model, "mag")

    acoustics = {"n_fft": 64, "hop_length": 16, "win_length": 64, "sr": 16000}
    bucketed = jax.jit(build_bucketed_enhance_fn(model, acoustics))

    inf = Inferencer.__new__(Inferencer)  # compute-path-only instance
    inf.model = model
    inf.params = params
    inf.acoustics = acoustics
    inf._model_kwargs = {}

    rng = np.random.default_rng(23)
    for length in (1000, 1313):
        wave = (0.2 * rng.standard_normal(length)).astype(np.float32)
        exact = np.asarray(
            inf._full_band_crm_mask_fn(params, jnp.asarray(wave)[None])
        )[0]
        bucket = 1600
        padded = np.zeros((1, bucket), np.float32)
        padded[0, :length] = wave
        got = np.asarray(
            bucketed(
                params, jnp.asarray(padded), jnp.asarray(length, jnp.int32)
            )
        )[0]
        np.testing.assert_allclose(got[:length], exact[:length], atol=2e-5)
