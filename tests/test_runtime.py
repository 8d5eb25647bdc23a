"""End-to-end runtime tests: inference CLI path and trainer on the
8-device virtual CPU mesh."""

import numpy as np
import pytest
import torch

from fullsubnet_tpu.data.wavio import read_wav, write_wav


def _write_tiny_fullsubnet_ckpt(path):
    """Create a torch checkpoint with the reference key layout."""
    import sys

    sys.path.insert(0, "tests") if "tests" not in sys.path else None
    from tests._reference_loader import load_reference_model

    ref_mod = load_reference_model("fullsubnet")
    torch.manual_seed(0)
    tmodel = ref_mod.Model(
        num_freqs=161, look_ahead=2, sequence_model="LSTM", fb_num_neighbors=0,
        sb_num_neighbors=3, fb_output_activate_function="ReLU",
        sb_output_activate_function=False, fb_model_hidden_size=32,
        sb_model_hidden_size=24, norm_type="offline_laplace_norm",
        num_groups_in_drop_band=2, weight_init=False,
    )
    torch.save({"model": tmodel.state_dict(), "epoch": 7}, path)
    return tmodel


TINY_MODEL_TOML = """
[acoustics]
n_fft = 320
win_length = 320
sr = 16000
hop_length = 160

[inferencer]
path = "inferencer.Inferencer"
type = "full_band_crm_mask"
[inferencer.args]

[dataset]
path = "dataset_inference.Dataset"
[dataset.args]
dataset_dir_list = ["{noisy_dir}"]
sr = 16000

[model]
path = "fullsubnet.model.Model"
[model.args]
sb_num_neighbors = 3
fb_num_neighbors = 0
num_freqs = 161
look_ahead = 2
sequence_model = "LSTM"
fb_output_activate_function = "ReLU"
sb_output_activate_function = false
fb_model_hidden_size = 32
sb_model_hidden_size = 24
weight_init = false
norm_type = "offline_laplace_norm"
num_groups_in_drop_band = 2
"""


def test_inference_end_to_end(tmp_path):
    """wav in -> config-driven Inferencer -> enhanced wav out, bit-matching
    the reference enhancement pipeline run on the same checkpoint."""
    sr = 16000
    rng = np.random.default_rng(0)
    t = np.arange(sr) / sr
    noisy = (
        0.4 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(sr)
    ).astype(np.float32)

    noisy_dir = tmp_path / "noisy_in"
    noisy_dir.mkdir()
    write_wav(noisy_dir / "utt1.wav", noisy, sr)

    ckpt_path = tmp_path / "ckpt.tar"
    tmodel = _write_tiny_fullsubnet_ckpt(ckpt_path)

    cfg_path = tmp_path / "inference.toml"
    cfg_path.write_text(TINY_MODEL_TOML.format(noisy_dir=noisy_dir))

    from fullsubnet_tpu.config import load_config
    from fullsubnet_tpu.infer.inferencer import Inferencer

    inferencer = Inferencer(load_config(cfg_path), str(ckpt_path), str(tmp_path / "out"))
    enhanced_dir = inferencer()
    out, got_sr = read_wav(enhanced_dir / "utt1.wav")
    assert got_sr == sr and out.shape == noisy.shape
    assert np.max(np.abs(out)) <= 1.0

    # golden check vs torch reference pipeline (same checkpoint)
    from fullsubnet_tpu.acoustics.mask import decompress_cIRM as _dec  # noqa

    with torch.no_grad():
        spec = torch.stft(
            torch.from_numpy(noisy[None]), 320, 160, 320,
            window=torch.hann_window(320), return_complex=True,
        )
        mag = spec.abs().unsqueeze(1)
        crm = tmodel(mag).permute(0, 2, 3, 1)
        lim = 9.9
        crm = (
            lim * (crm >= lim) - lim * (crm <= -lim) + crm * (torch.abs(crm) < lim)
        )
        crm = -10 * torch.log((10 - crm) / (10 + crm))
        er = crm[..., 0] * spec.real - crm[..., 1] * spec.imag
        ei = crm[..., 1] * spec.real + crm[..., 0] * spec.imag
        ref = torch.istft(
            torch.complex(er, ei), 320, 160, 320,
            window=torch.hann_window(320), length=sr,
        ).numpy()[0]
    # the CLI writes reference-style unconditional 0.8 FS peak
    # normalization (base_inferencer.py:182) — apply it to the oracle too
    ref = ref / np.max(np.abs(ref)) * 0.8
    np.testing.assert_allclose(out, ref, atol=2e-3)  # int16 quantization floor


TINY_TRAIN_TOML = """
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
clean_dataset = "{clean_scp}"
noise_dataset = "{noise_scp}"
rir_dataset = "{rir_scp}"
reverb_proportion = 0.25
silence_length = 0.1
snr_range = [0, 10]
sr = 16000
sub_sample_length = 0.4
target_dB_FS = -25
target_dB_FS_floating_value = 10

[train_dataset.dataloader]
batch_size = 8
num_workers = 0
drop_last = true

[model]
path = "fullsubnet.model.Model"
[model.args]
sb_num_neighbors = 3
fb_num_neighbors = 0
num_freqs = 161
look_ahead = 2
sequence_model = "LSTM"
fb_output_activate_function = "ReLU"
sb_output_activate_function = false
fb_model_hidden_size = 16
sb_model_hidden_size = 12
weight_init = true
norm_type = "offline_laplace_norm"
num_groups_in_drop_band = 2

[trainer]
path = "trainer.Trainer"
[trainer.train]
clip_grad_norm_value = 10
epochs = 2
save_checkpoint_interval = 1
[trainer.validation]
save_max_metric_score = true
validation_interval = 10
"""


@pytest.fixture
def train_setup(tmp_path):
    sr = 16000
    rng = np.random.default_rng(0)
    t = np.arange(sr) / sr
    clean_dir = tmp_path / "clean"
    noise_dir = tmp_path / "noise"
    rir_dir = tmp_path / "rir"
    for d in (clean_dir, noise_dir, rir_dir):
        d.mkdir()
    clean_paths = []
    for i in range(8):
        p = clean_dir / f"c{i}.wav"
        write_wav(p, (0.5 * np.sin(2 * np.pi * (150 + 40 * i) * t)).astype(np.float32), sr)
        clean_paths.append(str(p))
    noise_p = noise_dir / "n0.wav"
    write_wav(noise_p, (0.1 * rng.standard_normal(sr)).astype(np.float32), sr)
    rir = np.zeros(400, dtype=np.float32)
    rir[0] = 1.0
    rir_p = rir_dir / "r0.wav"
    write_wav(rir_p, rir, sr)

    scp = {}
    for name, paths in [
        ("clean", clean_paths), ("noise", [str(noise_p)]), ("rir", [str(rir_p)])
    ]:
        f = tmp_path / f"{name}.txt"
        f.write_text("\n".join(paths) + "\n")
        scp[name] = str(f)
    return tmp_path, scp


def test_trainer_two_epochs_on_mesh(train_setup, tmp_path):
    """Trainer runs 2 epochs data-parallel over the 8-device CPU mesh,
    loss decreases-ish, checkpoints resume."""
    import jax

    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"

    root, scp = train_setup
    cfg_text = TINY_TRAIN_TOML.format(
        save_dir=str(tmp_path / "exp"),
        clean_scp=scp["clean"],
        noise_scp=scp["noise"],
        rir_scp=scp["rir"],
    )
    cfg_path = tmp_path / "train.toml"
    cfg_path.write_text(cfg_text)

    from fullsubnet_tpu.config import load_config
    from fullsubnet_tpu.train.trainer import Trainer

    import jax.numpy as jnp

    trainer = Trainer(load_config(cfg_path), experiment_name="tiny")
    loss1 = trainer._train_epoch(1)
    loss2 = trainer._train_epoch(2)
    assert np.isfinite(loss1) and np.isfinite(loss2)
    assert loss2 <= loss1 * 1.5  # sanity: not exploding

    trainer.state["epoch"] = jnp.asarray(2, jnp.int32)
    trainer._save_checkpoint(epoch=2, is_best=True)
    assert trainer.ckpt.has("latest") and trainer.ckpt.has("best")

    # resume into a fresh trainer
    trainer2 = Trainer(
        load_config(cfg_path), resume=True, experiment_name="tiny"
    )
    assert int(np.asarray(trainer2.state["epoch"])) == 2
    p1 = jax.tree.leaves(trainer.state["params"])[0]
    p2 = jax.tree.leaves(trainer2.state["params"])[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)


def test_train_step_gradient_sync(train_setup, tmp_path):
    """The jitted step must produce replicated params regardless of which
    device held which batch shard (DP psum correctness)."""
    import jax
    import jax.numpy as jnp

    root, scp = train_setup
    cfg_text = TINY_TRAIN_TOML.format(
        save_dir=str(tmp_path / "exp2"),
        clean_scp=scp["clean"],
        noise_scp=scp["noise"],
        rir_scp=scp["rir"],
    )
    cfg_path = tmp_path / "t.toml"
    cfg_path.write_text(cfg_text)

    from fullsubnet_tpu.config import load_config
    from fullsubnet_tpu.parallel.mesh import shard_batch
    from fullsubnet_tpu.train.trainer import Trainer

    trainer = Trainer(load_config(cfg_path), experiment_name="sync")
    rng = np.random.default_rng(0)
    noisy = rng.standard_normal((8, 6400)).astype(np.float32)
    clean = rng.standard_normal((8, 6400)).astype(np.float32)
    batch = shard_batch((jnp.asarray(noisy), jnp.asarray(clean)), trainer.mesh)
    new_state, loss = trainer._train_step(trainer.state, *batch)
    assert np.isfinite(float(loss))
    # params are fully replicated -> addressable shards identical
    leaf = jax.tree.leaves(new_state["params"])[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_trainer_subband_mesh_parity(train_setup, tmp_path):
    """[trainer.mesh] data=4/subband=2: the train step over a (data,
    subband) mesh — batch sharded on `data`, sub-band rows spread over the
    full mesh via sharding_hint — computes the same update as the default
    (8, 1) data-only mesh."""
    import jax
    import jax.numpy as jnp

    root, scp = train_setup
    cfg_text = TINY_TRAIN_TOML.format(
        save_dir=str(tmp_path / "expsb"),
        clean_scp=scp["clean"],
        noise_scp=scp["noise"],
        rir_scp=scp["rir"],
    )
    cfg_path = tmp_path / "train_sb.toml"
    cfg_path.write_text(cfg_text)

    from fullsubnet_tpu.config import load_config
    from fullsubnet_tpu.train.trainer import Trainer

    cfg_a = load_config(cfg_path)
    trainer_a = Trainer(cfg_a, experiment_name="mesh81")
    assert trainer_a.mesh.devices.shape == (8, 1)
    loss_a = trainer_a._train_epoch(1)

    cfg_b = load_config(cfg_path)
    cfg_b["trainer"]["mesh"] = {"data": 4, "subband": 2}
    trainer_b = Trainer(cfg_b, experiment_name="mesh42")
    assert trainer_b.mesh.devices.shape == (4, 2)
    loss_b = trainer_b._train_epoch(1)

    np.testing.assert_allclose(loss_b, loss_a, rtol=1e-4)
    for pa, pb in zip(
        jax.tree.leaves(trainer_a.state["params"]),
        jax.tree.leaves(trainer_b.state["params"]),
    ):
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb), atol=5e-5, rtol=1e-4
        )


def test_train_cli_distributed_gate():
    # --num-processes/--process-id alone must trigger distributed init —
    # silently training standalone would duplicate work and write
    # conflicting checkpoints (review finding, round 3)
    import argparse

    from fullsubnet_tpu.train.cli import _wants_distributed

    def ns(**kw):
        base = dict(coordinator=None, num_processes=None, process_id=None)
        base.update(kw)
        return argparse.Namespace(**base)

    assert not _wants_distributed(ns(), {})
    assert _wants_distributed(ns(coordinator="h:1234"), {})
    assert _wants_distributed(ns(num_processes=4), {})
    assert _wants_distributed(ns(process_id=2), {})
    assert _wants_distributed(ns(), {"FULLSUBNET_DISTRIBUTED": "1"})
    assert _wants_distributed(ns(), {"FULLSUBNET_DISTRIBUTED": "True"})
    assert not _wants_distributed(ns(), {"FULLSUBNET_DISTRIBUTED": "0"})
