"""On-device mixture synthesis: parity with the host mixer and the
trainer integration (reference synthesis semantics:
``recipes/dns_interspeech_2020/dataset_train.py:136-224``)."""

import numpy as np
import pytest

from fullsubnet_tpu.data.datasets import TrainDataset
from fullsubnet_tpu.data.wavio import write_wav


def _host_mix(clean, noise, snr, rir, seed, target=-25, floating=10):
    """Host oracle with the internal draws reproduced for the device path."""
    rng = np.random.default_rng(seed)
    rng_shadow = np.random.default_rng(seed)
    picked = rir
    if rir is not None and rir.ndim > 1:
        picked = rir[int(rng_shadow.integers(0, rir.shape[0])), :]
    noisy_target = int(
        rng_shadow.integers(target - floating, target + floating)
    )
    noisy, clean_t = TrainDataset.snr_mix(
        clean_y=clean.copy(),
        noise_y=noise.copy(),
        snr=snr,
        target_dB_FS=target,
        target_dB_FS_floating_value=floating,
        rir=None if rir is None else rir.copy(),
        rng=rng,
    )
    return noisy, clean_t, picked, noisy_target


def test_device_snr_mix_matches_host():
    from fullsubnet_tpu.data.device_mixer import device_snr_mix

    rng = np.random.default_rng(42)
    B, L, R = 6, 4000, 900
    clean = (0.3 * rng.standard_normal((B, L))).astype(np.float32)
    # row 4: huge crest factor so the tailored mixture clips and the
    # rescale branch is exercised
    clean[4] *= 0.01
    clean[4, 100] = 5.0
    noise = (0.1 * rng.standard_normal((B, L))).astype(np.float32)

    rir_short = np.zeros(300, np.float32)
    rir_short[0], rir_short[120] = 1.0, 0.5
    rir_long = (0.2 * rng.standard_normal(R)).astype(np.float32)
    rir_long[0] = 1.0
    rir_multi = np.stack([rir_long, -0.5 * rir_long])  # [2, R]
    rirs = [None, rir_short, rir_long, rir_multi, None, rir_short]
    snrs = [-5, 0, 7, 20, 3, 12]

    host_noisy, host_clean = [], []
    dev_rir = np.zeros((B, R), np.float32)
    flags = np.zeros(B, np.float32)
    targets = np.zeros(B, np.float32)
    for i in range(B):
        n, c, picked, tgt = _host_mix(clean[i], noise[i], snrs[i], rirs[i], seed=100 + i)
        host_noisy.append(n)
        host_clean.append(c)
        targets[i] = tgt
        if picked is not None:
            dev_rir[i, : len(picked)] = picked
            flags[i] = 1.0

    dev_noisy, dev_clean = device_snr_mix(
        clean, noise, dev_rir, flags, np.asarray(snrs, np.float32), targets
    )
    dev_noisy, dev_clean = np.asarray(dev_noisy), np.asarray(dev_clean)
    scale = np.abs(np.stack(host_noisy)).max()
    np.testing.assert_allclose(
        dev_noisy, np.stack(host_noisy), rtol=2e-4, atol=2e-5 * scale
    )
    np.testing.assert_allclose(
        dev_clean, np.stack(host_clean), rtol=2e-4, atol=2e-5 * scale
    )
    # the clip-rescue row really was rescued
    assert np.abs(dev_noisy[4]).max() <= 0.999


def test_device_snr_mix_no_rir_static_gate():
    """A [B, 1] placeholder RIR buffer (dataset with no usable RIRs)
    must trace WITHOUT the full-batch FFT convolution and still match
    the host mixer; a genuine 1-sample RIR is the exact per-row scale."""
    import jax
    from fullsubnet_tpu.data.device_mixer import device_snr_mix

    rng = np.random.default_rng(3)
    B, L = 4, 2000
    clean = (0.3 * rng.standard_normal((B, L))).astype(np.float32)
    noise = (0.1 * rng.standard_normal((B, L))).astype(np.float32)
    snrs = np.asarray([0.0, 5.0, -3.0, 12.0], np.float32)
    targets = np.asarray([-25.0, -20.0, -30.0, -25.0], np.float32)
    rir1 = np.ones((B, 1), np.float32)  # identity kernel
    flags = np.asarray([0.0, 1.0, 0.0, 1.0], np.float32)

    jaxpr = str(jax.make_jaxpr(device_snr_mix)(
        clean, noise, rir1, flags, snrs, targets
    ))
    assert "fft" not in jaxpr  # the static gate skipped the convolution

    # host oracle: same draws via the shared shadow helper
    host_targets = np.zeros(B, np.float32)
    host_noisy, host_clean = [], []
    for i in range(B):
        rir = np.ones(1, np.float32) if flags[i] else None
        n, c, _picked, tgt = _host_mix(
            clean[i], noise[i], float(snrs[i]), rir, seed=200 + i
        )
        host_noisy.append(n)
        host_clean.append(c)
        host_targets[i] = tgt

    dev_noisy, dev_clean = device_snr_mix(
        clean, noise, rir1, flags, snrs, host_targets
    )
    np.testing.assert_allclose(
        np.asarray(dev_noisy), np.stack(host_noisy), rtol=2e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(dev_clean), np.stack(host_clean), rtol=2e-4, atol=1e-5
    )


def test_wav_frames_odd_fmt_chunk(tmp_path):
    """RIFF requires word alignment: an odd-sized fmt chunk carries a
    pad byte that must be skipped before the next chunk header."""
    import struct

    from fullsubnet_tpu.data.wavio import wav_frames

    frames, sr, ch = 777, 8000, 1
    fmt = struct.pack("<HHIIHH", 1, ch, sr, sr * 2, 2, 16) + b"\x00"
    assert len(fmt) % 2 == 1  # odd on purpose
    data = b"\x00\x00" * frames
    blob = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 1 + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"\x00"  # pad
        + b"data" + struct.pack("<I", len(data)) + data
    )
    p = tmp_path / "oddfmt.wav"
    p.write_bytes(blob)
    assert wav_frames(p) == (frames, sr, ch)


def test_wav_frames_malformed_headers(tmp_path):
    """Malformed/unsupported WAVs fail dataset-construction-time with a
    clear ValueError instead of a struct.error or a garbage frame count
    that mis-sizes the device-synthesis RIR buffer."""
    import struct

    import pytest

    from fullsubnet_tpu.data.wavio import wav_frames

    def wav(fmt_payload, data_size, data=b"", riff=b"RIFF"):
        body = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt_payload)) + fmt_payload
            + (b"\x00" if len(fmt_payload) % 2 else b"")
            + b"data" + struct.pack("<I", data_size) + data
        )
        return riff + struct.pack("<I", len(body)) + body

    good_fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)

    # truncated fmt chunk (< 16 bytes)
    p = tmp_path / "shortfmt.wav"
    p.write_bytes(wav(good_fmt[:10], 4, b"\x00" * 4))
    with pytest.raises(ValueError, match="malformed fmt"):
        wav_frames(p)

    # zero block_align would divide by zero / garbage frames
    bad_align = struct.pack("<HHIIHH", 1, 1, 8000, 0, 0, 16)
    p = tmp_path / "badalign.wav"
    p.write_bytes(wav(bad_align, 4, b"\x00" * 4))
    with pytest.raises(ValueError, match="invalid fmt"):
        wav_frames(p)

    # streaming sentinel data size
    p = tmp_path / "streaming.wav"
    p.write_bytes(wav(good_fmt, 0xFFFFFFFF))
    with pytest.raises(ValueError, match="unsized data"):
        wav_frames(p)

    # RF64: 32-bit fields are sentinels, real sizes live in ds64
    p = tmp_path / "rf64.wav"
    p.write_bytes(wav(good_fmt, 4, b"\x00" * 4, riff=b"RF64"))
    with pytest.raises(ValueError, match="RF64"):
        wav_frames(p)

    # truncated header
    p = tmp_path / "trunc.wav"
    p.write_bytes(b"RIFF\x00\x00")
    with pytest.raises(ValueError, match="truncated"):
        wav_frames(p)


def test_wav_frames_and_resampled_length(tmp_path):
    from fullsubnet_tpu.data.wavio import (
        load_wav,
        resampled_length,
        wav_frames,
    )

    rng = np.random.default_rng(0)
    mono = (0.3 * rng.standard_normal(12345)).astype(np.float32)
    p1 = tmp_path / "mono.wav"
    write_wav(p1, mono, 16000)
    frames, sr, ch = wav_frames(p1)
    assert (frames, sr, ch) == (12345, 16000, 1)

    stereo = (0.1 * rng.standard_normal((999, 2))).astype(np.float32)
    from scipy.io import wavfile

    p2 = tmp_path / "stereo48k.wav"
    wavfile.write(p2, 48000, (stereo * 32767).astype(np.int16))
    frames, sr, ch = wav_frames(p2)
    assert (frames, sr, ch) == (999, 48000, 2)
    got = load_wav(p2, sr=16000)
    assert got.shape[-1] == resampled_length(999, 48000, 16000)


@pytest.fixture
def mixer_layout(tmp_path):
    sr = 16000
    rng = np.random.default_rng(7)
    t = np.arange(sr) / sr

    clean_dir = tmp_path / "clean"
    noise_dir = tmp_path / "noise"
    rir_dir = tmp_path / "rir"
    for d in (clean_dir, noise_dir, rir_dir):
        d.mkdir()
    clean_paths, noise_paths, rir_paths = [], [], []
    for i in range(8):
        p = clean_dir / f"c{i}.wav"
        write_wav(
            p, (0.4 * np.sin(2 * np.pi * (180 + 40 * i) * t)).astype(np.float32), sr
        )
        clean_paths.append(str(p))
    for i in range(2):
        p = noise_dir / f"n{i}.wav"
        write_wav(p, (0.1 * rng.standard_normal(sr // 3)).astype(np.float32), sr)
        noise_paths.append(str(p))
    # two RIRs of different lengths, one multichannel — exercises the
    # fixed-buffer padding and the host channel pick
    r0 = np.zeros(500, np.float32)
    r0[0], r0[333] = 1.0, 0.3
    write_wav(rir_dir / "r0.wav", r0, sr)
    rir_paths.append(str(rir_dir / "r0.wav"))
    r1 = (0.1 * rng.standard_normal((2, 1200))).astype(np.float32)
    r1[:, 0] = 1.0
    from scipy.io import wavfile

    wavfile.write(rir_dir / "r1.wav", sr, r1.T.copy())  # float32 [T, C]
    rir_paths.append(str(rir_dir / "r1.wav"))

    scp = {}
    for name, paths in [
        ("clean", clean_paths), ("noise", noise_paths), ("rir", rir_paths)
    ]:
        f = tmp_path / f"{name}.txt"
        f.write_text("\n".join(paths) + "\n")
        scp[name] = str(f)
    return scp, sr


def test_component_dataset_matches_host_mixer(mixer_layout):
    from fullsubnet_tpu.data.device_mixer import device_snr_mix

    scp, sr = mixer_layout
    common = dict(
        clean_dataset=scp["clean"],
        noise_dataset=scp["noise"],
        rir_dataset=scp["rir"],
        snr_range=(-5, 20),
        reverb_proportion=0.5,
        silence_length=0.1,
        target_dB_FS=-25,
        target_dB_FS_floating_value=10,
        sub_sample_length=0.4,
        sr=sr,
        seed=3,
    )
    host_ds = TrainDataset(**common)
    dev_ds = TrainDataset(device_synthesis=True, **common)
    # buffer sized from headers: the longest RIR is the 1200-sample one
    assert dev_ds.rir_samples == 1200

    for epoch in (0, 1):
        host_ds.set_epoch(epoch)
        dev_ds.set_epoch(epoch)
        reverb_seen = noreverb_seen = False
        for item in range(len(host_ds)):
            noisy_h, clean_h = host_ds[item]
            comps = dev_ds[item]
            assert [np.shape(c) for c in comps[:3]] == [
                (len(noisy_h),), (len(noisy_h),), (1200,)
            ]
            reverb_seen |= bool(comps[3])
            noreverb_seen |= not bool(comps[3])
            noisy_d, clean_d = device_snr_mix(
                *[np.asarray(c)[None] for c in comps],
                target_db_fs=-25.0,
            )
            scale = max(np.abs(noisy_h).max(), 1e-3)
            np.testing.assert_allclose(
                np.asarray(noisy_d)[0], noisy_h, rtol=2e-4, atol=3e-5 * scale
            )
            np.testing.assert_allclose(
                np.asarray(clean_d)[0], clean_h, rtol=2e-4, atol=3e-5 * scale
            )
        assert reverb_seen and noreverb_seen  # both branches exercised


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
reverb_proportion = 0.5
silence_length = 0.1
snr_range = [5, 10]
sr = 16000
sub_sample_length = 0.4
target_dB_FS = -25
target_dB_FS_floating_value = 5
{extra_dataset_args}

[train_dataset.dataloader]
batch_size = 8
num_workers = 0
drop_last = true

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
validation_interval = 10
"""


def _trainer_setup(tmp_path, mixer_layout, extra_dataset_args):
    scp, _sr = mixer_layout
    cfg = TOML.format(
        save_dir=str(tmp_path / "exp"),
        scp=scp["clean"],
        scp_noise=scp["noise"],
        scp_rir=scp["rir"],
        extra_dataset_args=extra_dataset_args,
    )
    cfg_path = tmp_path / f"cfg{abs(hash(extra_dataset_args)) % 100}.toml"
    cfg_path.write_text(cfg)
    from fullsubnet_tpu.config import load_config

    return load_config(cfg_path)


def test_trainer_device_synthesis_mixed_mesh(tmp_path, mixer_layout):
    """Device synthesis on a (data=4, subband=2) mesh: the component
    batch shards over the data axis and the step stays finite."""
    from fullsubnet_tpu.train.trainer import Trainer

    cfg = _trainer_setup(tmp_path, mixer_layout, "device_synthesis = true")
    cfg.setdefault("trainer", {})["mesh"] = {"data": 4, "subband": 2}
    trainer = Trainer(cfg, experiment_name="devsynth_mesh")
    loss = trainer._train_epoch(0)
    assert np.isfinite(loss) and loss > 0.0


def test_trainer_device_synthesis_matches_host_loss(tmp_path, mixer_layout):
    """The fused device-synthesis step trains on the SAME mixtures as the
    host pipeline: first-epoch mean loss matches to f32 round-off."""
    from fullsubnet_tpu.train.trainer import Trainer

    losses = {}
    for mode, extra in [("host", ""), ("device", "device_synthesis = true")]:
        trainer = Trainer(
            _trainer_setup(tmp_path, mixer_layout, extra),
            experiment_name=f"devsynth_{mode}",
        )
        losses[mode] = trainer._train_epoch(0)
    assert np.isfinite(losses["device"]) and losses["device"] > 0.0
    np.testing.assert_allclose(losses["device"], losses["host"], rtol=5e-4)


def test_int16_transfer_bit_parity_on_grid():
    """device_synthesis_transfer='int16': on the int16 grid (16-bit PCM
    sources at native rate) the device mixer's output is BIT-IDENTICAL
    to the f32 transfer — the upcast is an exact power-of-two scale and
    the mixer is per-row scale-invariant."""
    import jax

    from fullsubnet_tpu.data.datasets import _quantize_int16
    from fullsubnet_tpu.data.device_mixer import device_snr_mix

    rng = np.random.default_rng(11)
    B, L, R = 4, 3200, 700
    # on-grid signals: integers / 32768
    clean = rng.integers(-9000, 9000, (B, L)).astype(np.float32) / 32768.0
    noise = rng.integers(-3000, 3000, (B, L)).astype(np.float32) / 32768.0
    rir = np.zeros((B, R), np.float32)
    rir[:, 0] = 29491 / 32768.0  # int16 peaks top out at 32767/32768
    rir[:, 1:] = rng.integers(-8000, 8000, (B, R - 1)) / 32768.0
    flags = np.array([1, 0, 1, 0], np.float32)
    snr = np.array([-5, 3, 10, 20], np.float32)
    tdb = np.array([-30, -25, -20, -18], np.float32)

    q = _quantize_int16
    assert q(clean).dtype == np.int16
    np.testing.assert_array_equal(q(clean).astype(np.float32) / 32768.0, clean)

    jmix = jax.jit(device_snr_mix)
    nf, cf = jmix(clean, noise, rir, flags, snr, tdb)
    ni, ci = jmix(q(clean), q(noise), q(rir), flags, snr, tdb)
    np.testing.assert_array_equal(np.asarray(nf), np.asarray(ni))
    np.testing.assert_array_equal(np.asarray(cf), np.asarray(ci))


def test_int16_transfer_dataset_components(mixer_layout):
    """The dataset ships int16 components under the flag; through the
    mixer they match the f32-transfer path (exactly for int16-source
    rows; the float32-format multichannel RIR quantizes to ~3e-5)."""
    import jax

    from fullsubnet_tpu.data.device_mixer import device_snr_mix

    scp, sr = mixer_layout
    common = dict(
        clean_dataset=scp["clean"], noise_dataset=scp["noise"],
        rir_dataset=scp["rir"], snr_range=(-5, 20),
        reverb_proportion=0.5, silence_length=0.1, target_dB_FS=-25,
        target_dB_FS_floating_value=10, sub_sample_length=0.4, sr=sr,
        seed=3, device_synthesis=True,
    )
    f32_ds = TrainDataset(device_synthesis_transfer="f32", **common)
    i16_ds = TrainDataset(device_synthesis_transfer="int16", **common)
    jmix = jax.jit(device_snr_mix)
    for item in range(6):
        cf, nf, rf, flag, snr, tdb = f32_ds[item]
        ci, ni, ri, flag2, snr2, tdb2 = i16_ds[item]
        assert ci.dtype == ni.dtype == ri.dtype == np.int16
        assert (flag, snr, tdb) == (flag2, snr2, tdb2)
        a = jmix(cf[None], nf[None], rf[None],
                 flag[None], snr[None], tdb[None])
        b = jmix(ci[None], ni[None], ri[None],
                 flag[None], snr[None], tdb[None])
        np.testing.assert_allclose(
            np.asarray(a[0]), np.asarray(b[0]), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(a[1]), np.asarray(b[1]), atol=2e-4
        )


def test_int16_transfer_rejects_unknown():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="device_synthesis_transfer"):
        TrainDataset(
            clean_dataset="/dev/null", noise_dataset="/dev/null",
            rir_dataset="/dev/null", snr_range=(0, 5),
            reverb_proportion=0.0, silence_length=0.1, target_dB_FS=-25,
            target_dB_FS_floating_value=10, sub_sample_length=0.4,
            sr=16000, device_synthesis_transfer="fp8",
        )
