"""Trainer validation epoch: metrics, visualization, best-epoch selection."""

import numpy as np
import pytest

from fullsubnet_tpu.data.wavio import write_wav

TOML = """
[meta]
save_dir = "{save_dir}"
seed = 0
use_amp = false

[acoustics]
n_fft = 320
win_length = 320
sr = 16000
hop_length = 160

[loss_function]
name = "mse_loss"

[optimizer]
lr = 0.001

[train_dataset]
path = "dataset_train.Dataset"
[train_dataset.args]
clean_dataset = "{scp}"
noise_dataset = "{scp_noise}"
rir_dataset = "{scp_rir}"
reverb_proportion = 0.0
silence_length = 0.1
snr_range = [5, 10]
sr = 16000
sub_sample_length = 0.4
target_dB_FS = -25
target_dB_FS_floating_value = 5

[train_dataset.dataloader]
batch_size = 8
num_workers = 0
drop_last = true

[validation_dataset]
path = "dataset_validation.Dataset"
[validation_dataset.args]
dataset_dir_list = ["{val_with}", "{val_no}"]
sr = 16000

[model]
path = "fullsubnet.model.Model"
[model.args]
sb_num_neighbors = 2
fb_num_neighbors = 0
num_freqs = 161
look_ahead = 2
sequence_model = "LSTM"
fb_output_activate_function = "ReLU"
sb_output_activate_function = false
fb_model_hidden_size = 12
sb_model_hidden_size = 8
weight_init = true
norm_type = "offline_laplace_norm"
num_groups_in_drop_band = 2

[trainer]
path = "trainer.Trainer"
[trainer.train]
clip_grad_norm_value = 10
epochs = 1
save_checkpoint_interval = 1
[trainer.validation]
save_max_metric_score = true
validation_interval = 1
[trainer.visualization]
n_samples = 2
num_workers = 2
"""


@pytest.fixture
def full_setup(tmp_path):
    sr = 16000
    rng = np.random.default_rng(0)
    t = np.arange(sr) / sr
    speech = (0.4 * np.sin(2 * np.pi * 300 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)

    clean_dir = tmp_path / "clean"
    clean_dir.mkdir()
    paths = []
    for i in range(8):
        p = clean_dir / f"c{i}.wav"
        write_wav(p, speech, sr)
        paths.append(str(p))
    (tmp_path / "clean.txt").write_text("\n".join(paths) + "\n")
    noise_p = tmp_path / "n.wav"
    write_wav(noise_p, (0.05 * rng.standard_normal(sr)).astype(np.float32), sr)
    (tmp_path / "noise.txt").write_text(str(noise_p) + "\n")
    rir = np.zeros(100, np.float32); rir[0] = 1
    rir_p = tmp_path / "r.wav"
    write_wav(rir_p, rir, sr)
    (tmp_path / "rir.txt").write_text(str(rir_p) + "\n")

    # validation layout with BOTH splits
    for cond in ("with_reverb", "no_reverb"):
        nd = tmp_path / "val" / cond / "noisy"
        cd = tmp_path / "val" / cond / "clean"
        nd.mkdir(parents=True); cd.mkdir(parents=True)
        write_wav(nd / f"clnsp1_x_snr10_tl-25_fileid_0.wav",
                  speech + 0.1 * rng.standard_normal(sr).astype(np.float32), sr)
        write_wav(cd / "clean_fileid_0.wav", speech, sr)

    cfg = TOML.format(
        save_dir=str(tmp_path / "exp"),
        scp=str(tmp_path / "clean.txt"),
        scp_noise=str(tmp_path / "noise.txt"),
        scp_rir=str(tmp_path / "rir.txt"),
        val_with=str(tmp_path / "val" / "with_reverb"),
        val_no=str(tmp_path / "val" / "no_reverb"),
    )
    cfg_path = tmp_path / "cfg.toml"
    cfg_path.write_text(cfg)
    return cfg_path, tmp_path


def test_full_train_loop_with_validation(full_setup):
    """trainer.train(): one epoch incl. validation, checkpointing, best."""
    cfg_path, tmp_path = full_setup
    from fullsubnet_tpu.config import load_config
    from fullsubnet_tpu.train.trainer import Trainer

    trainer = Trainer(load_config(cfg_path), experiment_name="valtest")
    trainer.train()
    # validation produced a score and the best checkpoint was saved
    assert trainer.ckpt.has("latest")
    assert trainer.ckpt.has("best")
    assert float(np.asarray(trainer.state["best_score"])) > 0.0
    # TB logs written
    assert any((tmp_path / "exp" / "valtest" / "logs").iterdir())


def test_only_validation_mode(full_setup):
    cfg_path, _ = full_setup
    from fullsubnet_tpu.config import load_config
    from fullsubnet_tpu.train.trainer import Trainer

    trainer = Trainer(
        load_config(cfg_path), only_validation=True, experiment_name="valonly"
    )
    trainer.train()  # runs a single validation pass, must not crash
    assert trainer.ckpt.has("best")  # first score is always the best


def test_validation_score_uses_with_reverb_split(full_setup):
    """Model selection score comes from the With_reverb split (reference
    fullsubnet/trainer.py:181)."""
    cfg_path, _ = full_setup
    from fullsubnet_tpu.config import load_config
    from fullsubnet_tpu.train.trainer import Trainer

    trainer = Trainer(load_config(cfg_path), experiment_name="score")
    rows = [
        (np.ones(1600, np.float32), np.ones(1600, np.float32),
         np.ones(1600, np.float32), "With_reverb"),
        (np.ones(1600, np.float32), np.ones(1600, np.float32),
         np.ones(1600, np.float32), "No_reverb"),
    ]
    # degenerate rows -> STOI fallback path must still compute
    score = trainer.metrics_visualization(rows, epoch=1)
    assert np.isfinite(score)


def test_sharded_validation_matches_serial(full_setup, monkeypatch):
    """Simulate a 2-process run: each fake process enhances only its shard
    (i = pid, pid+2, ...), the reductions sum both shards' contributions,
    and the resulting score/losses equal the serial single-process run."""
    import jax

    from fullsubnet_tpu.config import load_config
    from fullsubnet_tpu.train.trainer import Trainer

    cfg_path, _ = full_setup
    trainer = Trainer(load_config(cfg_path), experiment_name="shardval")

    serial_score = trainer._validation_epoch(epoch=1)

    # fake 2-process reduction: accumulate both pids' local matrices
    stash = {}

    def fake_psum(self, arr):
        key = arr.shape
        if key not in stash:
            stash[key] = np.zeros_like(arr)
        stash[key] = stash[key] + arr
        return stash[key].copy()

    shard_sizes = []
    monkeypatch.setattr(Trainer, "_psum_across_processes", fake_psum)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    orig_epoch = Trainer._validation_epoch

    scores = []
    for pid in [0, 1]:
        monkeypatch.setattr(jax, "process_index", lambda p=pid: p)
        # record how many utterances this fake process enhanced
        calls = []
        orig_enh = Trainer._enhance_utterance

        def counting_enh(self, noisy, clean, _calls=calls):
            _calls.append(1)
            return orig_enh(self, noisy, clean)

        monkeypatch.setattr(Trainer, "_enhance_utterance", counting_enh)
        scores.append(orig_epoch(trainer, epoch=1))
        shard_sizes.append(len(calls))
        monkeypatch.setattr(Trainer, "_enhance_utterance", orig_enh)

    total = len(trainer.valid_dataset)
    assert sum(shard_sizes) == total  # every utterance enhanced exactly once
    assert max(shard_sizes) <= -(-total // 2)  # actually sharded
    # the last fake process saw both shards' sums -> the global score
    np.testing.assert_allclose(scores[-1], serial_score, rtol=1e-6)


def test_validation_loss_logged(full_setup):
    """Per-speech-type validation loss is computed and logged (reference
    fullsubnet/trainer.py:160-169)."""
    from fullsubnet_tpu.config import load_config
    from fullsubnet_tpu.train.trainer import Trainer

    cfg_path, _ = full_setup
    trainer = Trainer(load_config(cfg_path), experiment_name="valloss")
    logged = {}
    trainer._log_scalar = lambda tag, val, step: logged.__setitem__(tag, val)
    trainer._validation_epoch(epoch=1)
    assert "Validation/Loss_With_reverb" in logged
    assert "Validation/Loss_No_reverb" in logged
    assert all(np.isfinite(v) for v in logged.values())


@pytest.mark.parametrize(
    "norm",
    [
        "offline_laplace_norm",
        "cumulative_laplace_norm",
        "offline_gaussian_norm",
        "cumulative_layer_norm",
        "forgetting_norm",
    ],
)
def test_bucketed_enhancement_exact(full_setup, norm):
    """Length-bucketed validation enhancement (one compile per bucket) is
    EXACTLY the unpadded per-length run: masked norm statistics, re-created
    tail reflection, masked iSTFT, rescaled masked loss."""
    from fullsubnet_tpu.config import load_config
    from fullsubnet_tpu.train.trainer import Trainer

    cfg_path, tmp_path = full_setup
    cfg = load_config(cfg_path)
    cfg["model"]["args"]["norm_type"] = norm
    trainer = Trainer(cfg, experiment_name=f"bucket_{norm}")
    assert trainer._bucketing_supported()

    rng = np.random.default_rng(11)
    for length in (16000, 15373, 9000):  # exact-bucket, ragged, short
        noisy = (0.1 * rng.standard_normal(length)).astype(np.float32)
        clean = (0.1 * rng.standard_normal(length)).astype(np.float32)

        enhanced_b, loss_b = trainer._enhance_utterance(noisy, clean)

        # ground truth: the per-length (unbucketed) path
        fn = trainer._build_enhance_fn()
        import jax.numpy as jnp

        enhanced_u, loss_u = fn(
            trainer.state["params"], jnp.asarray(noisy)[None],
            jnp.asarray(clean)[None],
        )
        enhanced_u = np.asarray(enhanced_u[0])

        assert enhanced_b.shape == enhanced_u.shape == (length,)
        np.testing.assert_allclose(enhanced_b, enhanced_u, atol=2e-5)
        np.testing.assert_allclose(loss_b, float(loss_u), rtol=1e-4)


def test_bucketed_enhancement_single_compile(full_setup):
    """Different lengths inside one bucket must not trigger recompiles."""
    from fullsubnet_tpu.config import load_config
    from fullsubnet_tpu.train.trainer import Trainer

    cfg_path, _ = full_setup
    trainer = Trainer(load_config(cfg_path), experiment_name="bucketcc")
    rng = np.random.default_rng(12)
    for length in (14500, 14800, 15100):  # all pad to the same bucket
        noisy = (0.1 * rng.standard_normal(length)).astype(np.float32)
        clean = (0.1 * rng.standard_normal(length)).astype(np.float32)
        trainer._enhance_utterance(noisy, clean)
    # one bucket -> one cache entry
    assert trainer._enhance_bucket_fn._cache_size() == 1


def test_best_score_init_for_minimize_metric(full_setup):
    """save_max_metric_score=false initializes best to +inf (reference
    base_trainer.py:90), so the first (lowest) score saves a best."""
    cfg_path, tmp_path = full_setup
    import re

    text = cfg_path.read_text().replace(
        "save_max_metric_score = true", "save_max_metric_score = false"
    )
    cfg2 = tmp_path / "cfg_min.toml"
    cfg2.write_text(text)
    from fullsubnet_tpu.config import load_config
    from fullsubnet_tpu.train.trainer import Trainer

    t = Trainer(load_config(cfg2), experiment_name="minmetric")
    assert float(np.asarray(t.state["best_score"])) == float("inf")
    assert t._is_best_epoch(0.5)        # first score always best
    assert not t._is_best_epoch(0.9)    # higher is NOT better
    assert t._is_best_epoch(0.4)


def test_preload_from_other_experiment_dir(full_setup):
    """-P with an Orbax checkpoint directory from ANOTHER experiment must
    resolve against that directory, not the new experiment's."""
    cfg_path, tmp_path = full_setup
    import jax

    from fullsubnet_tpu.config import load_config
    from fullsubnet_tpu.train.trainer import Trainer

    src = Trainer(load_config(cfg_path), experiment_name="srcexp")
    src._save_checkpoint(1, is_best=False)
    ckpt_dir = src.checkpoints_dir / "latest"
    assert ckpt_dir.exists()

    dst = Trainer(
        load_config(cfg_path), experiment_name="dstexp",
        preloaded_model_path=str(ckpt_dir),
    )
    for a, b in zip(
        jax.tree.leaves(dst.state["params"]),
        jax.tree.leaves(src.state["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_masked_gaussian_norm_near_constant_input_finite():
    # count-based masked variance (sumsq - count*mu^2)/(count-1) can go
    # slightly negative in f32 for near-constant magnitudes (catastrophic
    # cancellation) -> sqrt NaN poisoning the whole bucket; the clamp must
    # keep the bucketed path finite (review finding, round 3)
    import jax
    import jax.numpy as jnp

    from fullsubnet_tpu.models import FullSubNet

    m = FullSubNet(
        num_freqs=161, sb_num_neighbors=3, fb_model_hidden_size=16,
        sb_model_hidden_size=12, norm_type="offline_gaussian_norm",
    )
    p = m.init(jax.random.PRNGKey(0), weight_init=False)
    jitter = 1e-4 * jax.random.normal(jax.random.PRNGKey(1), (1, 1, 161, 200))
    x = jnp.full((1, 1, 161, 200), 3.0, jnp.float32) * (1 + jitter)
    out = m(p, x, valid_frames=jnp.asarray([180]))
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize(
    "norm",
    [
        "offline_laplace_norm",
        "offline_gaussian_norm",
        "cumulative_laplace_norm",
    ],
)
def test_bucketed_enhancement_exact_fullband(full_setup, norm):
    """The fullband baseline buckets too (valid_frames via the shared
    masked_offline_norm helper): bucketed == unpadded, all norms."""
    from fullsubnet_tpu.config import load_config
    from fullsubnet_tpu.train.trainer import Trainer

    cfg_path, tmp_path = full_setup
    cfg = load_config(cfg_path)
    cfg["model"]["path"] = "fullband_baseline.model.Model"
    cfg["model"]["args"] = {
        "num_freqs": 161,
        "look_ahead": 2,
        "sequence_model": "LSTM",
        "output_activate_function": False,
        "hidden_size": 24,
        "weight_init": False,
        "norm_type": norm,
    }
    trainer = Trainer(cfg, experiment_name=f"bucket_fb_{norm}")
    assert trainer._bucketing_supported()

    rng = np.random.default_rng(13)
    for length in (16000, 15373):  # exact-bucket and ragged
        noisy = (0.1 * rng.standard_normal(length)).astype(np.float32)
        clean = (0.1 * rng.standard_normal(length)).astype(np.float32)

        enhanced_b, loss_b = trainer._enhance_utterance(noisy, clean)

        fn = trainer._build_enhance_fn()
        import jax.numpy as jnp

        enhanced_u, loss_u = fn(
            trainer.state["params"], jnp.asarray(noisy)[None],
            jnp.asarray(clean)[None],
        )
        enhanced_u = np.asarray(enhanced_u[0])

        assert enhanced_b.shape == enhanced_u.shape == (length,)
        np.testing.assert_allclose(enhanced_b, enhanced_u, atol=2e-5)
        np.testing.assert_allclose(loss_b, float(loss_u), rtol=1e-4)


@pytest.mark.parametrize(
    "norm", ["offline_laplace_norm", "cumulative_laplace_norm"]
)
def test_bucketed_enhancement_exact_fast(full_setup, norm):
    """Fast FullSubNet buckets validation too (valid_frames at both the
    mel-frame clock and the downsampled bottleneck clock): bucketed ==
    unpadded, offline and causal norms, ragged lengths covering both
    real_time_downsampling tail cases."""
    from fullsubnet_tpu.config import load_config
    from fullsubnet_tpu.train.trainer import Trainer

    cfg_path, tmp_path = full_setup
    cfg = load_config(cfg_path)
    cfg["model"]["path"] = "fast_fullsubnet.model.Model"
    cfg["model"]["args"] = {
        "encoder_input_size": 161,
        "num_mels": 16,
        "noisy_input_num_neighbors": 2,
        "encoder_output_num_neighbors": 0,
        "bottleneck_hidden_size": 16,
        "bottleneck_num_layers": 2,
        "look_ahead": 2,
        "shrink_size": 2,
        "sequence_model": "LSTM",
        "norm_type": norm,
    }
    trainer = Trainer(cfg, experiment_name=f"bucket_fast_{norm}")
    assert trainer._bucketing_supported()

    rng = np.random.default_rng(14)
    for length in (16000, 15373):  # exact-bucket and ragged
        noisy = (0.1 * rng.standard_normal(length)).astype(np.float32)
        clean = (0.1 * rng.standard_normal(length)).astype(np.float32)

        enhanced_b, loss_b = trainer._enhance_utterance(noisy, clean)

        fn = trainer._build_enhance_fn()
        import jax.numpy as jnp

        enhanced_u, loss_u = fn(
            trainer.state["params"], jnp.asarray(noisy)[None],
            jnp.asarray(clean)[None],
        )
        enhanced_u = np.asarray(enhanced_u[0])

        assert enhanced_b.shape == enhanced_u.shape == (length,)
        np.testing.assert_allclose(enhanced_b, enhanced_u, atol=2e-5)
        np.testing.assert_allclose(loss_b, float(loss_u), rtol=1e-4)


@pytest.mark.parametrize("loss_name", ["mse_loss", "si_snr_loss"])
def test_bucketed_enhancement_exact_improved(full_setup, loss_name):
    """The wave-to-wave Improved family buckets validation through
    valid_samples + the exact masked waveform loss: bucketed ==
    unpadded for mean-based AND si_snr losses, ragged lengths."""
    from fullsubnet_tpu.config import load_config
    from fullsubnet_tpu.train.trainer import Trainer

    cfg_path, tmp_path = full_setup
    cfg = load_config(cfg_path)
    cfg["loss_function"]["name"] = loss_name
    cfg["model"]["path"] = "improved_fullsubnet.model.Model"
    cfg["model"]["args"] = {
        "n_fft": 64,
        "hop_length": 16,
        "win_length": 64,
        "num_freqs": 33,
        "freq_cutoffs": [8, 16],
        "sb_num_center_freqs": [1, 2, 4],
        "sb_num_neighbor_freqs": [3, 3, 3],
        "fb_num_center_freqs": [1, 2, 4],
        "fb_num_neighbor_freqs": [3, 3, 3],
        "fb_hidden_size": 16,
        "sb_hidden_size": 12,
        "norm_type": "offline_laplace_norm",
    }
    trainer = Trainer(cfg, experiment_name=f"bucket_imp_{loss_name}")
    assert trainer._bucketing_supported()

    rng = np.random.default_rng(15)
    for length in (16000, 15373):  # exact-bucket and ragged
        noisy = (0.1 * rng.standard_normal(length)).astype(np.float32)
        clean = (0.1 * rng.standard_normal(length)).astype(np.float32)

        enhanced_b, loss_b = trainer._enhance_utterance(noisy, clean)

        fn = trainer._build_enhance_fn()
        import jax.numpy as jnp

        enhanced_u, loss_u = fn(
            trainer.state["params"], jnp.asarray(noisy)[None],
            jnp.asarray(clean)[None],
        )
        enhanced_u = np.asarray(enhanced_u[0])

        assert enhanced_b.shape == enhanced_u.shape == (length,)
        np.testing.assert_allclose(enhanced_b, enhanced_u, atol=2e-5)
        np.testing.assert_allclose(loss_b, float(loss_u), rtol=1e-4)


def test_masked_waveform_loss_exact():
    """masked_waveform_loss == the plain loss on the unpadded signal,
    for every loss with a masked form; unsupported losses return None."""
    import jax.numpy as jnp

    from fullsubnet_tpu.train.loss import (
        l1_loss,
        masked_waveform_loss,
        mse_loss,
        si_snr_loss,
    )

    rng = np.random.default_rng(16)
    length, bucket = 777, 1024
    p = (0.3 * rng.standard_normal(length)).astype(np.float32)
    t = (0.3 * rng.standard_normal(length)).astype(np.float32)
    pp = np.zeros((1, bucket), np.float32); pp[0, :length] = p
    tp = np.zeros((1, bucket), np.float32); tp[0, :length] = t
    mask = (np.arange(bucket) < length).astype(np.float32)[None]
    for fn in (mse_loss, l1_loss, si_snr_loss):
        want = float(fn(jnp.asarray(p)[None], jnp.asarray(t)[None]))
        got = float(
            masked_waveform_loss(
                fn, jnp.asarray(pp), jnp.asarray(tp), jnp.asarray(mask),
                length,
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-5)
    assert masked_waveform_loss(
        lambda a, b: 0.0, jnp.asarray(pp), jnp.asarray(tp),
        jnp.asarray(mask), length,
    ) is None
