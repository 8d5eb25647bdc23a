"""Host-RSS recycle watchdog: graceful checkpoint-and-exec mid-training.

Guards long trainings against host-side memory growth outside our
control (the axon remote-PJRT client leaks every host->device
transfer's full size — a 20k-step run was OOM-killed at 130 GB RSS).
``[trainer.train] host_rss_recycle_gb`` makes the trainer write a
resumable ``latest`` checkpoint at the epoch boundary and re-exec
itself (CLI) or exit 75 (supervisor-managed).
"""

import os
import subprocess
import sys

import numpy as np

from fullsubnet_tpu.data.wavio import write_wav

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

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
dataset_dir_list = ["{val_no}"]
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
epochs = 3
save_checkpoint_interval = 10
host_rss_recycle_gb = 0.001
[trainer.validation]
save_max_metric_score = true
validation_interval = 10
[trainer.visualization]
n_samples = 0
num_workers = 1
"""


def _setup(tmp_path):
    sr = 16000
    rng = np.random.default_rng(0)
    t = np.arange(sr) / sr
    speech = (0.4 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    paths = []
    for i in range(8):
        p = tmp_path / f"c{i}.wav"
        write_wav(p, speech, sr)
        paths.append(str(p))
    (tmp_path / "clean.txt").write_text("\n".join(paths) + "\n")
    noise_p = tmp_path / "n.wav"
    write_wav(noise_p, (0.05 * rng.standard_normal(sr)).astype(np.float32), sr)
    (tmp_path / "noise.txt").write_text(str(noise_p) + "\n")
    rir = np.zeros(100, np.float32)
    rir[0] = 1
    rir_p = tmp_path / "r.wav"
    write_wav(rir_p, rir, sr)
    (tmp_path / "rir.txt").write_text(str(rir_p) + "\n")
    nd = tmp_path / "val" / "no_reverb" / "noisy"
    cd = tmp_path / "val" / "no_reverb" / "clean"
    nd.mkdir(parents=True)
    cd.mkdir(parents=True)
    write_wav(nd / "clnsp1_x_snr10_tl-25_fileid_0.wav",
              speech + 0.1 * rng.standard_normal(sr).astype(np.float32), sr)
    write_wav(cd / "clean_fileid_0.wav", speech, sr)
    cfg_path = tmp_path / "cfg.toml"
    cfg_path.write_text(TOML.format(
        save_dir=str(tmp_path / "exp"),
        scp=str(tmp_path / "clean.txt"),
        scp_noise=str(tmp_path / "noise.txt"),
        scp_rir=str(tmp_path / "rir.txt"),
        val_no=str(tmp_path / "val" / "no_reverb"),
    ))
    return cfg_path


def test_cli_self_exec_recycles_and_completes(tmp_path):
    """With an absurdly low threshold the CLI trainer recycles (execs
    itself with -R) after epochs 1 and 2 and still finishes all 3 epochs
    in ONE process (same PID across execs), exit 0."""
    cfg_path = _setup(tmp_path)
    env = dict(os.environ)
    env.update(PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO + os.pathsep + env.get("PYTHONPATH", ""))
    # don't inherit the suite's 8-device virtual mesh (conftest): the
    # single-device CLI run is the production shape being tested
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    out = subprocess.run(
        [sys.executable, "-m", "fullsubnet_tpu.train.cli", "-C", str(cfg_path)],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    log = out.stdout
    assert log.count("[recycle] host RSS") == 2, log
    # each exec'd replacement resumed from the recycle's checkpoint
    assert "Training will begin at 2 epoch" in log
    assert "Training will begin at 3 epoch" in log
    assert "epoch 3" in log

    # `latest` is the LAST recycle's checkpoint (epoch 2): the final
    # epoch saves only on the regular save/validation cadence (interval
    # 10 here), matching the reference's epoch-save semantics
    from fullsubnet_tpu.checkpoint import CheckpointManager

    mgr = CheckpointManager(
        tmp_path / "exp" / "cfg" / "checkpoints", recover=False
    )
    state = mgr.restore("latest")
    assert int(np.asarray(state["epoch"])) == 2


def test_supervisor_exit_code_without_recycle_argv(tmp_path, monkeypatch):
    """Programmatic Trainer use (no CLI): the recycle exits 75 —
    tools/train_quality.py's run_training treats that as a planned
    restart, not a failure."""
    from fullsubnet_tpu.config import load_config
    from fullsubnet_tpu.train.trainer import Trainer

    cfg_path = _setup(tmp_path)
    trainer = Trainer(load_config(cfg_path), experiment_name="recycle75")
    assert trainer.recycle_argv is None
    assert trainer.host_rss_recycle_gb == 0.001
    assert Trainer._host_rss_gb() > 0.01  # /proc read works

    calls = {}

    def fake_exit(code):
        calls["code"] = code
        raise SystemExit(code)

    monkeypatch.setattr(os, "_exit", fake_exit)
    try:
        trainer.train()
    except SystemExit as e:
        assert e.code == Trainer.RECYCLE_EXIT_CODE == 75
    assert calls["code"] == 75

    # the recycle checkpointed epoch 1 before exiting
    from fullsubnet_tpu.checkpoint import CheckpointManager

    mgr = CheckpointManager(
        tmp_path / "exp" / "recycle75" / "checkpoints", recover=False
    )
    state = mgr.restore("latest")
    assert int(np.asarray(state["epoch"])) == 1

    # below threshold: no exit
    trainer2 = Trainer(load_config(cfg_path), resume=True,
                       experiment_name="recycle75")
    trainer2.host_rss_recycle_gb = 10_000.0
    trainer2._maybe_recycle(1)  # returns quietly
