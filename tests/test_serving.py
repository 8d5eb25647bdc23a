"""AOT serving export: StableHLO artifacts round-trip without model code.

The exported program must reproduce the Inferencer's enhancement exactly
(bucketed mode: for ANY length in the bucket; exact mode: per length).
"""

import json

import jax
import numpy as np
import pytest

from fullsubnet_tpu.config import load_config

SERVING_TOML = """
[acoustics]
n_fft = 320
win_length = 320
sr = 16000
hop_length = 160

[inferencer]
path = "inferencer.Inferencer"
type = "full_band_crm_mask"

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
weight_init = false
norm_type = "offline_laplace_norm"
num_groups_in_drop_band = 2
"""

FULLBAND_TOML = """
[acoustics]
n_fft = 320
win_length = 320
sr = 16000
hop_length = 160

[inferencer]
path = "inferencer.Inferencer"
type = "scaled_mask"

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


def _orbax_ckpt(tmp_path, config):
    """Init params from the config's model and save an Orbax 'latest'."""
    from fullsubnet_tpu import config as config_lib
    from fullsubnet_tpu.checkpoint import CheckpointManager

    model, _ = config_lib.build_model(config)
    params = model.init(jax.random.PRNGKey(0), weight_init=False)
    mgr = CheckpointManager(tmp_path / "ckpts")
    mgr.save({"params": params}, epoch=0, keep_weights_history=False)
    return tmp_path / "ckpts" / "latest"


def _noisy(sr, seconds, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    return (
        0.3 * np.sin(2 * np.pi * 440 * t)
        + 0.05 * rng.standard_normal(len(t))
    ).astype(np.float32)


def test_serving_bucketed_matches_inferencer(tmp_path):
    from fullsubnet_tpu.infer.inferencer import Inferencer
    from fullsubnet_tpu.serving import ServingModel, export_enhancer

    cfg_path = tmp_path / "cfg.toml"
    cfg_path.write_text(SERVING_TOML)
    config = load_config(cfg_path)
    ckpt = _orbax_ckpt(tmp_path, config)

    manifest = export_enhancer(
        config, str(ckpt), tmp_path / "artifact", seconds=(1.0, 2.0)
    )
    assert manifest["mode"] == "bucketed"
    assert manifest["lengths"] == [16000, 32000]

    served = ServingModel.load(tmp_path / "artifact")
    inf = Inferencer(
        {k: v for k, v in config.items()}, str(ckpt), output_dir=None
    )
    # two different lengths through the SAME 1 s bucket must both equal
    # the exact unpadded Inferencer run
    for seconds, seed in ((0.7, 0), (0.55, 1)):
        wav = _noisy(16000, seconds, seed)
        got = served.enhance(wav)
        want = np.asarray(
            inf._jit_for("full_band_crm_mask")(inf.params, wav[None])
        )[0]
        assert got.shape == wav.shape
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_serving_exact_mode_and_errors(tmp_path):
    from fullsubnet_tpu.infer.inferencer import Inferencer
    from fullsubnet_tpu.serving import ServingModel, export_enhancer

    cfg_path = tmp_path / "cfg.toml"
    cfg_path.write_text(FULLBAND_TOML)
    config = load_config(cfg_path)
    ckpt = _orbax_ckpt(tmp_path, config)

    manifest = export_enhancer(
        config, str(ckpt), tmp_path / "artifact", seconds=(1.0,)
    )
    assert manifest["mode"] == "exact"
    served = ServingModel.load(tmp_path / "artifact")

    wav = _noisy(16000, 1.0)
    got = served.enhance(wav)
    inf = Inferencer(
        {k: v for k, v in config.items()}, str(ckpt), output_dir=None
    )
    want = np.asarray(inf._jit_for("scaled_mask")(inf.params, wav[None]))[0]
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    with pytest.raises(ValueError, match="no program for length"):
        served.enhance(_noisy(16000, 0.5))


def test_serving_cli_and_overwrite(tmp_path):
    from fullsubnet_tpu.serving import export_enhancer, main

    cfg_path = tmp_path / "cfg.toml"
    cfg_path.write_text(SERVING_TOML)
    config = load_config(cfg_path)
    ckpt = _orbax_ckpt(tmp_path, config)

    out = tmp_path / "artifact"
    main([
        "-C", str(cfg_path), "-M", str(ckpt), "-O", str(out),
        "--seconds", "1",
    ])
    manifest = json.loads((out / "manifest.json").read_text())
    assert manifest["programs"] == {"16000": "program_16000.stablehlo"}
    assert (out / "program_16000.stablehlo").stat().st_size > 0

    with pytest.raises(FileExistsError):
        export_enhancer(config, str(ckpt), out, seconds=(1.0,))
    export_enhancer(config, str(ckpt), out, seconds=(1.0,), overwrite=True)


def test_inferencer_bucketed_matches_exact(tmp_path):
    # the Inferencer's full_band_crm_mask now buckets utterance lengths
    # (one compile per bucket instead of one per exact length); the
    # bucketed result must equal the exact per-length run
    import jax.numpy as jnp

    from fullsubnet_tpu.infer.inferencer import Inferencer

    cfg_path = tmp_path / "cfg.toml"
    cfg_path.write_text(SERVING_TOML)
    config = load_config(cfg_path)
    ckpt = _orbax_ckpt(tmp_path, config)

    inf = Inferencer(config, str(ckpt), output_dir=None)
    for seconds, seed in ((0.7, 0), (0.9, 1)):
        wav = _noisy(16000, seconds, seed)
        got = inf.full_band_crm_mask(jnp.asarray(wav[None]))
        want = np.asarray(
            inf._jit_for("full_band_crm_mask")(inf.params, wav[None])
        )[0]
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
    assert "bucketed" in inf._jitted

    # bucket_seconds = 0 opts out: the strategy stays on exact compiles
    config2 = dict(config)
    config2["inferencer"] = dict(config.get("inferencer", {}))
    config2["inferencer"]["bucket_seconds"] = 0
    inf2 = Inferencer(config2, str(ckpt), output_dir=None)
    wav = _noisy(16000, 0.7)
    out = inf2.full_band_crm_mask(jnp.asarray(wav[None]))
    assert np.isfinite(out).all()
    assert "bucketed" not in inf2._jitted


def test_batched_bucketed_fn_matches_per_utterance(tmp_path):
    # many utterances of DIFFERENT lengths padded into one device call
    # (per-example valid_frames vector) must each equal their unpadded
    # per-utterance run — on the unfused path and on the fused sub-band
    # path (masked _sb_norm_mu denominator)
    import jax.numpy as jnp

    from fullsubnet_tpu.infer.inferencer import (
        Inferencer,
        build_bucketed_enhance_fn,
    )

    cfg_path = tmp_path / "cfg.toml"
    cfg_path.write_text(SERVING_TOML)
    config = load_config(cfg_path)
    ckpt = _orbax_ckpt(tmp_path, config)
    inf = Inferencer(config, str(ckpt), output_dir=None)

    lens = [11200, 8800, 14000]
    wavs = [_noisy(16000, L / 16000, seed=i) for i, L in enumerate(lens)]
    bucket = 16000  # covers max(L) + n_fft with step = 1 s
    padded = np.zeros((4, bucket), np.float32)  # one filler row
    lengths = np.full(4, lens[0], np.int32)
    for i, w in enumerate(wavs):
        padded[i, : len(w)] = w
        lengths[i] = len(w)

    wants = [
        np.asarray(
            inf._jit_for("full_band_crm_mask")(inf.params, w[None])
        )[0]
        for w in wavs
    ]

    fn = jax.jit(build_bucketed_enhance_fn(inf.model, inf.acoustics))
    out = np.asarray(fn(inf.params, jnp.asarray(padded), jnp.asarray(lengths)))
    for i, (L, want) in enumerate(zip(lens, wants)):
        np.testing.assert_allclose(out[i, :L], want, atol=2e-5, rtol=1e-4)

    # force the fused sub-band pipeline (never materializes the unfold)
    inf.model._FUSED_SB_THRESHOLD = 0
    fn2 = jax.jit(build_bucketed_enhance_fn(inf.model, inf.acoustics))
    out2 = np.asarray(
        fn2(inf.params, jnp.asarray(padded), jnp.asarray(lengths))
    )
    for i, (L, want) in enumerate(zip(lens, wants)):
        np.testing.assert_allclose(out2[i, :L], want, atol=2e-5, rtol=1e-4)


def test_batched_inference_cli_matches_serial(tmp_path):
    # [inferencer] batch_size > 1 groups utterances into padded batches;
    # written outputs must equal the serial per-utterance run
    from fullsubnet_tpu.data.wavio import read_wav, write_wav
    from fullsubnet_tpu.infer.inferencer import Inferencer

    noisy_dir = tmp_path / "noisy"
    noisy_dir.mkdir()
    for i, seconds in enumerate((0.7, 0.55, 0.9, 1.3, 0.8)):
        write_wav(
            noisy_dir / f"utt{i}.wav", _noisy(16000, seconds, seed=i), 16000
        )

    dataset = f"""
[dataset]
path = "dataset_inference.Dataset"
[dataset.args]
dataset_dir_list = ["{noisy_dir}"]
sr = 16000
"""
    cfg_path = tmp_path / "cfg.toml"
    cfg_path.write_text(SERVING_TOML + dataset)
    config = load_config(cfg_path)
    ckpt = _orbax_ckpt(tmp_path, config)

    serial = Inferencer(config, str(ckpt), str(tmp_path / "out_serial"))
    serial_dir = serial()

    config_b = load_config(cfg_path)
    config_b["inferencer"]["batch_size"] = 2
    batched = Inferencer(config_b, str(ckpt), str(tmp_path / "out_batched"))
    batched_dir = batched()

    for i in range(5):
        a, _ = read_wav(serial_dir / f"utt{i}.wav")
        b, _ = read_wav(batched_dir / f"utt{i}.wav")
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2e-4)  # int16 floor + 2e-5


def test_batched_bucketed_through_pallas_kernel_interpret(tmp_path):
    # batched inference on TPU routes the fused sub-band stage through the
    # Pallas kernel; the per-example masked-mu path must hold there too
    # (interpret mode on CPU)
    import jax.numpy as jnp

    from fullsubnet_tpu.infer.inferencer import (
        Inferencer,
        build_bucketed_enhance_fn,
    )

    cfg_path = tmp_path / "cfg.toml"
    cfg_path.write_text(SERVING_TOML)
    config = load_config(cfg_path)
    ckpt = _orbax_ckpt(tmp_path, config)
    inf = Inferencer(config, str(ckpt), output_dir=None)

    lens = [5600, 4400]
    wavs = [_noisy(16000, L / 16000, seed=i) for i, L in enumerate(lens)]
    wants = [
        np.asarray(
            inf._jit_for("full_band_crm_mask")(inf.params, w[None])
        )[0]
        for w in wavs
    ]

    inf.model._FUSED_SB_THRESHOLD = 0
    inf.model.pallas_interpret = True
    padded = np.zeros((2, 8000), np.float32)
    lengths = np.asarray(lens, np.int32)
    for i, w in enumerate(wavs):
        padded[i, : len(w)] = w
    fn = jax.jit(build_bucketed_enhance_fn(inf.model, inf.acoustics))
    out = np.asarray(fn(inf.params, jnp.asarray(padded), jnp.asarray(lengths)))
    for i, (L, want) in enumerate(zip(lens, wants)):
        np.testing.assert_allclose(out[i, :L], want, atol=2e-5, rtol=1e-4)


def test_serving_batched_artifact(tmp_path):
    # batch=3 artifact: enhance_batch groups by bucket, pads partial
    # chunks with filler rows, and each result equals the unpadded
    # Inferencer run
    from fullsubnet_tpu.infer.inferencer import Inferencer
    from fullsubnet_tpu.serving import ServingModel, export_enhancer

    cfg_path = tmp_path / "cfg.toml"
    cfg_path.write_text(SERVING_TOML)
    config = load_config(cfg_path)
    ckpt = _orbax_ckpt(tmp_path, config)

    manifest = export_enhancer(
        config, str(ckpt), tmp_path / "artifact", seconds=(1.0, 2.0), batch=3
    )
    assert manifest["batch"] == 3
    served = ServingModel.load(tmp_path / "artifact")

    inf = Inferencer(dict(config), str(ckpt), output_dir=None)
    lens = [0.7, 0.55, 0.9, 1.3]  # 3 in the 1 s bucket + 1 in the 2 s
    waves = [_noisy(16000, s, seed=i) for i, s in enumerate(lens)]
    got = served.enhance_batch(waves)
    for w, g in zip(waves, got):
        want = np.asarray(
            inf._jit_for("full_band_crm_mask")(inf.params, w[None])
        )[0]
        assert g.shape == w.shape
        np.testing.assert_allclose(g, want, atol=2e-5, rtol=1e-4)

    # single-wave enhance routes through the batched program too
    one = served.enhance(waves[0])
    np.testing.assert_allclose(one, got[0], atol=1e-7)

    # exact-mode export refuses batch > 1
    cfg2 = tmp_path / "cfg2.toml"
    cfg2.write_text(FULLBAND_TOML)
    config2 = load_config(cfg2)
    ckpt2 = _orbax_ckpt(tmp_path / "fb", config2)
    with pytest.raises(ValueError, match="bucketed"):
        export_enhancer(
            config2, str(ckpt2), tmp_path / "artifact2", seconds=(1.0,),
            batch=2,
        )


def test_bucketed_exact_with_odd_n_fft(tmp_path):
    # odd n_fft: stft center-pads by 2*(n_fft//2) = n_fft - 1 samples, so
    # the valid frame count is 1 + (L-1)//hop, not 1 + L//hop — the
    # traced_num_frames helper must keep bucketed == exact (review
    # finding, round 3)
    import jax.numpy as jnp

    from fullsubnet_tpu.infer.inferencer import Inferencer

    toml = SERVING_TOML.replace("n_fft = 320", "n_fft = 321").replace(
        "win_length = 320", "win_length = 321"
    )
    cfg_path = tmp_path / "cfg.toml"
    cfg_path.write_text(toml)
    config = load_config(cfg_path)
    ckpt = _orbax_ckpt(tmp_path, config)
    inf = Inferencer(config, str(ckpt), output_dir=None)

    # hop | L is the case where the even-formula overcounts by one frame
    wav = _noisy(16000, 11200 / 16000, seed=3)
    assert len(wav) % 160 == 0
    got = inf.full_band_crm_mask(jnp.asarray(wav[None]))
    want = np.asarray(
        inf._jit_for("full_band_crm_mask")(inf.params, wav[None])
    )[0]
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_serving_unexportable_strategy_errors(tmp_path):
    from fullsubnet_tpu.serving import export_enhancer

    toml = FULLBAND_TOML.replace(
        'type = "scaled_mask"', 'type = "overlapped_chunk"'
    )
    cfg_path = tmp_path / "cfg.toml"
    cfg_path.write_text(toml)
    config = load_config(cfg_path)
    ckpt = _orbax_ckpt(tmp_path, config)
    with pytest.raises(ValueError, match="not exportable"):
        export_enhancer(config, str(ckpt), tmp_path / "artifact")


def test_streaming_serving_export_matches_live_enhancer(tmp_path):
    # the exported stream_init/stream_hop programs driven by
    # StreamingServingModel must reproduce the live StreamingEnhancer's
    # wave output exactly (same host protocol, same device math) —
    # real-time serving without the model source
    from fullsubnet_tpu import config as config_lib
    from fullsubnet_tpu.infer.streaming import StreamingEnhancer
    from fullsubnet_tpu.serving import (
        StreamingServingModel,
        export_streaming_enhancer,
    )

    toml = SERVING_TOML.replace(
        'norm_type = "offline_laplace_norm"',
        'norm_type = "cumulative_laplace_norm"',
    )
    cfg_path = tmp_path / "cfg.toml"
    cfg_path.write_text(toml)
    config = load_config(cfg_path)
    ckpt = _orbax_ckpt(tmp_path, config)

    manifest = export_streaming_enhancer(
        config, str(ckpt), tmp_path / "artifact"
    )
    assert manifest["format"] == "fullsubnet_tpu.serving-stream/1"
    assert manifest["look_ahead"] == 2
    served = StreamingServingModel.load(tmp_path / "artifact")

    model, _ = config_lib.build_model(config)
    import jax as _jax

    params = model.init(_jax.random.PRNGKey(0), weight_init=False)
    live = StreamingEnhancer(model, params, n_fft=320, hop_length=160)

    wav = _noisy(16000, 0.45, seed=7)
    st_l, st_s = live.init_state(), served.init_state()
    got_l, got_s = [], []
    i, rng = 0, np.random.default_rng(3)
    while i < len(wav):  # ragged push sizes exercise the staging ring
        n = int(rng.integers(40, 400))
        chunk = wav[i : i + n]
        i += n
        st_l, out_l = live.push(st_l, chunk)
        st_s, out_s = served.push(st_s, chunk)
        got_l.append(out_l)
        got_s.append(out_s)
    st_l, out_l = live.flush(st_l)
    st_s, out_s = served.flush(st_s)
    got_l.append(out_l)
    got_s.append(out_s)
    a = np.concatenate(got_l)
    b = np.concatenate(got_s)
    assert a.shape == b.shape and a.size > len(wav) // 2
    np.testing.assert_allclose(b, a, atol=1e-6, rtol=1e-6)


IMPROVED_TOML = """
[acoustics]
n_fft = 64
win_length = 64
sr = 16000
hop_length = 16

[inferencer]
path = "inferencer.Inferencer"
type = "time_domain"

[model]
path = "improved_fullsubnet.model.Model"
[model.args]
n_fft = 64
hop_length = 16
win_length = 64
num_freqs = 33
freq_cutoffs = [8, 16]
sb_num_center_freqs = [1, 2, 4]
sb_num_neighbor_freqs = [3, 3, 3]
fb_num_center_freqs = [1, 2, 4]
fb_num_neighbor_freqs = [3, 3, 3]
fb_hidden_size = 16
sb_hidden_size = 12
norm_type = "cumulative_laplace_norm"
"""


def test_streaming_serving_export_improved_family(tmp_path):
    # the improved family streams through the wave host's spectrum-domain
    # mode; its exported artifact must match the live enhancer
    from fullsubnet_tpu import config as config_lib
    from fullsubnet_tpu.infer.streaming import StreamingEnhancer
    from fullsubnet_tpu.serving import (
        StreamingServingModel,
        export_streaming_enhancer,
    )

    cfg_path = tmp_path / "cfg.toml"
    cfg_path.write_text(IMPROVED_TOML)
    config = load_config(cfg_path)
    ckpt = _orbax_ckpt(tmp_path, config)

    manifest = export_streaming_enhancer(
        config, str(ckpt), tmp_path / "artifact"
    )
    assert manifest["look_ahead"] == 0
    served = StreamingServingModel.load(tmp_path / "artifact")

    model, _ = config_lib.build_model(config)
    import jax as _jax

    params = model.init(_jax.random.PRNGKey(0), weight_init=False)
    live = StreamingEnhancer(model, params, n_fft=64, hop_length=16)

    wav = _noisy(16000, 1600 / 16000, seed=2)
    st_l, st_s = live.init_state(), served.init_state()
    got_l, got_s = [], []
    for i in range(0, len(wav), 100):
        st_l, a = live.push(st_l, wav[i : i + 100])
        st_s, b = served.push(st_s, wav[i : i + 100])
        got_l.append(a)
        got_s.append(b)
    _, a = live.flush(st_l)
    _, b = served.flush(st_s)
    got_l.append(a)
    got_s.append(b)
    a = np.concatenate(got_l)
    b = np.concatenate(got_s)
    assert a.shape == b.shape and a.size >= len(wav)
    np.testing.assert_allclose(b, a, atol=1e-6, rtol=1e-6)


def test_streaming_export_rejects_offline_norm(tmp_path):
    from fullsubnet_tpu.serving import export_streaming_enhancer

    cfg_path = tmp_path / "cfg.toml"
    cfg_path.write_text(SERVING_TOML)  # offline norm: not streamable
    config = load_config(cfg_path)
    ckpt = _orbax_ckpt(tmp_path, config)
    with pytest.raises(ValueError, match="not streamable"):
        export_streaming_enhancer(config, str(ckpt), tmp_path / "artifact")


def test_batched_bucketed_cumulative_norm(tmp_path):
    # cumulative-norm recipes (the released cum checkpoint path) are
    # causal, so the batched bucketed path must be exact there too —
    # both on the unfused and the fused (masked-mu bypassed) pipeline
    import jax.numpy as jnp

    from fullsubnet_tpu.infer.inferencer import (
        Inferencer,
        build_bucketed_enhance_fn,
    )

    toml = SERVING_TOML.replace(
        'norm_type = "offline_laplace_norm"',
        'norm_type = "cumulative_laplace_norm"',
    )
    cfg_path = tmp_path / "cfg.toml"
    cfg_path.write_text(toml)
    config = load_config(cfg_path)
    ckpt = _orbax_ckpt(tmp_path, config)
    inf = Inferencer(config, str(ckpt), output_dir=None)

    lens = [11200, 8800]
    wavs = [_noisy(16000, L / 16000, seed=i) for i, L in enumerate(lens)]
    wants = [
        np.asarray(
            inf._jit_for("full_band_crm_mask")(inf.params, w[None])
        )[0]
        for w in wavs
    ]
    padded = np.zeros((2, 16000), np.float32)
    for i, w in enumerate(wavs):
        padded[i, : len(w)] = w
    lengths = np.asarray(lens, np.int32)
    for threshold in (None, 0):  # unfused, then fused
        if threshold is not None:
            inf.model._FUSED_SB_THRESHOLD = threshold
        fn = jax.jit(build_bucketed_enhance_fn(inf.model, inf.acoustics))
        out = np.asarray(
            fn(inf.params, jnp.asarray(padded), jnp.asarray(lengths))
        )
        for i, (L, want) in enumerate(zip(lens, wants)):
            np.testing.assert_allclose(out[i, :L], want, atol=2e-5, rtol=1e-4)


def test_multistream_serving_export_matches_live(tmp_path):
    # the exported batched stream_init/stream_reset/stream_hop programs
    # driven by MultiStreamServingModel must reproduce the live
    # MultiStreamEnhancer slot-for-slot — concurrent real-time serving
    # without the model source
    from fullsubnet_tpu import config as config_lib
    from fullsubnet_tpu.infer.streaming import MultiStreamEnhancer
    from fullsubnet_tpu.serving import (
        MultiStreamServingModel,
        export_streaming_enhancer,
    )

    toml = SERVING_TOML.replace(
        'norm_type = "offline_laplace_norm"',
        'norm_type = "cumulative_laplace_norm"',
    )
    cfg_path = tmp_path / "cfg.toml"
    cfg_path.write_text(toml)
    config = load_config(cfg_path)
    ckpt = _orbax_ckpt(tmp_path, config)

    manifest = export_streaming_enhancer(
        config, str(ckpt), tmp_path / "artifact", streams=3
    )
    assert manifest["format"] == "fullsubnet_tpu.serving-multistream/1"
    assert manifest["streams"] == 3
    served = MultiStreamServingModel.load(tmp_path / "artifact")

    model, _ = config_lib.build_model(config)
    import jax as _jax

    params = model.init(_jax.random.PRNGKey(0), weight_init=False)
    live = MultiStreamEnhancer(
        model, params, n_fft=320, hop_length=160, max_streams=3
    )

    waves = [_noisy(16000, 0.3, seed=20 + k) for k in range(2)]
    st_l, st_s = live.init_state(), served.init_state()
    slots_l = [live.open_stream(st_l) for _ in waves]
    slots_s = [served.open_stream(st_s) for _ in waves]
    got_l = {s: [] for s in slots_l}
    got_s = {s: [] for s in slots_s}
    i, rng = 0, np.random.default_rng(5)
    n_max = max(len(w) for w in waves)
    while i < n_max:  # ragged interleaved pushes
        n = int(rng.integers(100, 500))
        for k, w in enumerate(waves):
            chunk = w[i : i + n]
            if len(chunk):
                live.push(st_l, slots_l[k], chunk)
                served.push(st_s, slots_s[k], chunk)
        i += n
        for slot, out in live.poll(st_l).items():
            got_l[slot].append(out)
        for slot, out in served.poll(st_s).items():
            got_s[slot].append(out)
    for k in range(len(waves)):
        got_l[slots_l[k]].append(live.drain(st_l, slots_l[k]))
        got_s[slots_s[k]].append(served.drain(st_s, slots_s[k]))
        a = np.concatenate(got_l[slots_l[k]])
        b = np.concatenate(got_s[slots_s[k]])
        assert len(a) == len(b)
        assert len(a) >= len(waves[k])
        np.testing.assert_allclose(
            b, a, atol=1e-5,
            err_msg=f"served stream {k} != live multi-stream",
        )


def test_serving_fullband_bucketed_export(tmp_path):
    # the fullband baseline's reference recipe is full_band_crm_mask
    # (reference fullband_baseline/inference.toml:10) — it now exports in
    # bucketed mode (valid_frames): any length in the bucket is exact
    from fullsubnet_tpu.serving import ServingModel, export_enhancer

    toml = FULLBAND_TOML.replace(
        'type = "scaled_mask"', 'type = "full_band_crm_mask"'
    )
    cfg_path = tmp_path / "cfg.toml"
    cfg_path.write_text(toml)
    config = load_config(cfg_path)
    ckpt = _orbax_ckpt(tmp_path, config)

    manifest = export_enhancer(
        config, str(ckpt), tmp_path / "artifact", seconds=[1.0], batch=2
    )
    assert manifest["mode"] == "bucketed"
    served = ServingModel.load(tmp_path / "artifact")

    # ground truth: the Inferencer's own (bucketed) enhancement
    from fullsubnet_tpu.infer.inferencer import Inferencer

    cfg2 = dict(config)
    cfg2.pop("dataset", None)
    inf = Inferencer(cfg2, str(ckpt), output_dir=None)

    waves = [_noisy(16000, 0.61, seed=31), _noisy(16000, 0.37, seed=32)]
    outs = served.enhance_batch(waves)
    for w, got in zip(waves, outs):
        ref = np.asarray(
            inf._jit_for("full_band_crm_mask")(inf.params, w[None])
        )[0]
        assert got.shape == ref.shape == w.shape
        np.testing.assert_allclose(got, ref, atol=1e-5)


def test_serving_improved_time_domain_bucketed_export(tmp_path):
    # the improved family's time_domain strategy exports in bucketed
    # mode (model-level valid_samples): one program per bucket, exact for
    # any length in it, batched too
    from fullsubnet_tpu import config as config_lib
    from fullsubnet_tpu.serving import ServingModel, export_enhancer

    toml = IMPROVED_TOML.replace(
        'norm_type = "cumulative_laplace_norm"',
        'norm_type = "offline_laplace_norm"',
    )
    cfg_path = tmp_path / "cfg.toml"
    cfg_path.write_text(toml)
    config = load_config(cfg_path)
    ckpt = _orbax_ckpt(tmp_path, config)

    manifest = export_enhancer(
        config, str(ckpt), tmp_path / "artifact", seconds=[0.2], batch=2
    )
    assert manifest["mode"] == "bucketed"
    assert manifest["strategy"] == "time_domain"
    served = ServingModel.load(tmp_path / "artifact")

    model, _ = config_lib.build_model(config)
    import jax as _jax
    import jax.numpy as jnp

    params = model.init(_jax.random.PRNGKey(0), weight_init=False)

    waves = [_noisy(16000, 0.11, seed=41), _noisy(16000, 0.172, seed=42)]
    outs = served.enhance_batch(waves)
    for w, got in zip(waves, outs):
        exact = np.asarray(model(params, jnp.asarray(w)[None]))[0, 0]
        assert got.shape == exact.shape == w.shape
        np.testing.assert_allclose(got, exact, atol=2e-5)


FAST_TOML = """
[acoustics]
n_fft = 320
win_length = 320
sr = 16000
hop_length = 160

[inferencer]
path = "inferencer.Inferencer"
type = "full_band_crm_mask"

[model]
path = "fast_fullsubnet.model.Model"
[model.args]
encoder_input_size = 161
num_mels = 16
noisy_input_num_neighbors = 2
encoder_output_num_neighbors = 0
bottleneck_hidden_size = 16
bottleneck_num_layers = 2
look_ahead = 2
shrink_size = 2
sequence_model = "LSTM"
norm_type = "offline_laplace_norm"
"""


def test_serving_fast_bucketed_export(tmp_path):
    # Fast FullSubNet now implements valid_frames (incl. the downsampled
    # bottleneck clock's partial-tail-block statistics), so its
    # full_band_crm_mask recipe exports in bucketed mode too: one
    # program per bucket, exact for any length in it
    from fullsubnet_tpu.infer.inferencer import Inferencer
    from fullsubnet_tpu.serving import ServingModel, export_enhancer

    cfg_path = tmp_path / "cfg.toml"
    cfg_path.write_text(FAST_TOML)
    config = load_config(cfg_path)
    ckpt = _orbax_ckpt(tmp_path, config)

    manifest = export_enhancer(
        config, str(ckpt), tmp_path / "artifact", seconds=[1.0]
    )
    assert manifest["mode"] == "bucketed"
    served = ServingModel.load(tmp_path / "artifact")

    cfg2 = dict(config)
    cfg2.pop("dataset", None)
    inf = Inferencer(cfg2, str(ckpt), output_dir=None)
    for seconds, seed in ((0.61, 51), (0.37, 52)):
        wav = _noisy(16000, seconds, seed)
        got = served.enhance(wav)
        want = np.asarray(
            inf._jit_for("full_band_crm_mask")(inf.params, wav[None])
        )[0]
        assert got.shape == want.shape == wav.shape
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_batched_inference_cli_time_domain_matches_serial(tmp_path):
    # [inferencer] batch_size > 1 with the time_domain strategy routes
    # the Improved family through batched bucketed device calls
    # (per-example valid_samples); written outputs must equal the
    # serial per-utterance run
    from fullsubnet_tpu.data.wavio import read_wav, write_wav
    from fullsubnet_tpu.infer.inferencer import Inferencer

    noisy_dir = tmp_path / "noisy"
    noisy_dir.mkdir()
    for i, seconds in enumerate((0.07, 0.055, 0.09, 0.13, 0.08)):
        write_wav(
            noisy_dir / f"utt{i}.wav", _noisy(16000, seconds, seed=i), 16000
        )

    dataset = f"""
[dataset]
path = "dataset_inference.Dataset"
[dataset.args]
dataset_dir_list = ["{noisy_dir}"]
sr = 16000
"""
    cfg_path = tmp_path / "cfg.toml"
    cfg_path.write_text(
        IMPROVED_TOML + dataset
    )
    config = load_config(cfg_path)
    config["inferencer"]["bucket_seconds"] = 0.05
    ckpt = _orbax_ckpt(tmp_path, config)

    serial = Inferencer(config, str(ckpt), str(tmp_path / "out_serial"))
    serial_dir = serial()

    config_b = load_config(cfg_path)
    config_b["inferencer"]["bucket_seconds"] = 0.05
    config_b["inferencer"]["batch_size"] = 2
    batched = Inferencer(config_b, str(ckpt), str(tmp_path / "out_batched"))
    assert "bucketed_td_batched" not in batched._jitted
    batched_dir = batched()
    assert "bucketed_td_batched" in batched._jitted

    for i in range(5):
        a, _ = read_wav(serial_dir / f"utt{i}.wav")
        b, _ = read_wav(batched_dir / f"utt{i}.wav")
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2e-4)  # int16 floor + 2e-5
