"""Benchmark: FullSubNet real-time factor (audio-sec enhanced / sec / chip).

Runs the flagship FullSubNet full enhancement pipeline (STFT -> fullband +
sub-band LSTMs -> cIRM decompress -> mask -> iSTFT) end-to-end on the
default JAX device, steady-state, and prints ONE JSON line:

    {"metric": "rtf_fullsubnet_16khz", "value": N, "unit":
     "audio_sec_per_sec_per_chip", "vs_baseline": N/500}

``vs_baseline`` is relative to the 500x real-time north-star from
BASELINE.json (the reference publishes no RTF numbers).

Flags: --batch, --seconds, --iters, --dtype {bf16,fp32}, --model.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# error substrings the axon tunnel emits transiently (a retry succeeds);
# anything else is a real failure and must surface
_TRANSIENT_MARKERS = ("FAILED_PRECONDITION", "UNAVAILABLE", "DEADLINE_EXCEEDED")


def _run_with_retry(bench_fn, attempts: int = 3, sleep_s: float = 20.0):
    """Re-run a whole bench mode on transient tunnel errors so the
    round-end artifact survives a remote-backend hiccup. Compiled
    programs persist across attempts (jit cache), so a retry only pays
    the measurement loop."""
    for attempt in range(1, attempts + 1):
        try:
            return bench_fn()
        except Exception as e:  # noqa: BLE001 - filtered by marker below
            msg = str(e)
            transient = any(m in msg for m in _TRANSIENT_MARKERS)
            if not transient or attempt == attempts:
                raise
            print(
                f"[bench] transient backend error (attempt {attempt}/"
                f"{attempts}), retrying in {sleep_s:.0f}s: {msg[:200]}",
                file=sys.stderr,
            )
            time.sleep(sleep_s)


def build_pipeline(model_name: str, dtype):
    from fullsubnet_tpu.acoustics.mask import decompress_cIRM
    from fullsubnet_tpu.acoustics.stft import istft, stft_complex
    from fullsubnet_tpu.models import MODEL_REGISTRY

    n_fft, hop, win = 512, 256, 512

    if model_name == "improved_fullsubnet_48k":
        model = MODEL_REGISTRY["improved_fullsubnet"](
            n_fft=960, hop_length=480, win_length=960, num_freqs=481,
            freq_cutoffs=[20, 120, 240],
            sb_num_center_freqs=[1, 4, 20, 60],
            sb_num_neighbor_freqs=[15, 15, 15, 15],
            fb_num_center_freqs=[1, 4, 20, 60],
            fb_num_neighbor_freqs=[15, 15, 15, 15],
            compute_dtype=dtype,
        )
        params = model.init(jax.random.PRNGKey(0), weight_init=False)
        params = jax.tree.map(lambda x: x.astype(dtype), params)

        def fn(params, noisy):
            return model(params, noisy).astype(jnp.float32)

        return fn, params, model

    if model_name == "improved_fullsubnet":
        # wave-to-wave model: fp32 STFT/iSTFT, low-precision recurrent stacks
        model = MODEL_REGISTRY[model_name](compute_dtype=dtype)
        params = model.init(jax.random.PRNGKey(0), weight_init=False)
        params = jax.tree.map(lambda x: x.astype(dtype), params)

        def fn(params, noisy):
            return model(params, noisy).astype(jnp.float32)

        return fn, params, model

    defaults = {"fullband_baseline": dict(num_freqs=257, hidden_size=512)}
    model = MODEL_REGISTRY[model_name](**defaults.get(model_name, {}))
    params = model.init(jax.random.PRNGKey(0), weight_init=False)
    params = jax.tree.map(lambda x: x.astype(dtype), params)

    import inspect

    # any model with a dropping_band kwarg (FullSubNet, SubBandBaseline)
    # must not drop at inference
    model_kwargs = (
        {"dropping_band": False}
        if "dropping_band" in inspect.signature(model.__call__).parameters
        else {}
    )

    def fn(params, noisy):
        # fp32 STFT (cheap, accuracy-critical), low-precision model compute
        spec = stft_complex(noisy, n_fft, hop, win)
        noisy_mag = jnp.abs(spec)[:, None].astype(dtype)
        crm = model(params, noisy_mag, **model_kwargs)
        crm = jnp.transpose(crm, (0, 2, 3, 1)).astype(jnp.float32)
        crm = decompress_cIRM(crm)
        er = crm[..., 0] * spec.real - crm[..., 1] * spec.imag
        ei = crm[..., 1] * spec.real + crm[..., 0] * spec.imag
        return istft(
            (er, ei), n_fft, hop, win, length=noisy.shape[-1],
            input_type="real_imag",
        )

    return fn, params, model


def bench_train(args):
    """Full training step (STFT -> cIRM target -> fwd -> bwd -> Adam) on
    the reference recipe shapes: 3.072 s crops (override with
    --crop-seconds), drop_band groups=2 where the model uses it. --model
    selects the family (improved_fullsubnet trains wave-to-wave)."""
    import optax

    from fullsubnet_tpu.acoustics.feature import drop_band
    from fullsubnet_tpu.acoustics.mask import build_complex_ideal_ratio_mask
    from fullsubnet_tpu.acoustics.stft import stft_complex
    from fullsubnet_tpu.models import MODEL_REGISTRY

    use_bf16_policy = args.dtype == "bf16"
    cdt = jnp.bfloat16 if use_bf16_policy else jnp.float32
    defaults = {
        "fullband_baseline": dict(num_freqs=257, hidden_size=512),
        # wave-to-wave model: owns its STFT, so the low-precision policy
        # is a constructor arg rather than an input cast
        "improved_fullsubnet": dict(compute_dtype=cdt),
    }
    if args.model == "improved_fullsubnet_48k":
        model = MODEL_REGISTRY["improved_fullsubnet"](
            n_fft=960, hop_length=480, win_length=960, num_freqs=481,
            freq_cutoffs=[20, 120, 240],
            sb_num_center_freqs=[1, 4, 20, 60],
            sb_num_neighbor_freqs=[15, 15, 15, 15],
            fb_num_center_freqs=[1, 4, 20, 60],
            fb_num_neighbor_freqs=[15, 15, 15, 15],
            compute_dtype=cdt,
        )
    else:
        model = MODEL_REGISTRY[args.model](**defaults.get(args.model, {}))
    waveform_model = args.model.startswith("improved_fullsubnet")
    if args.train_unfused:
        # legacy reference-shaped path: no fused pipeline, no Pallas routes
        model._FUSED_SB_THRESHOLD = 2**62
        from fullsubnet_tpu.nn.sequence_model import SequenceModel

        SequenceModel._PALLAS_MIN_ROWS = 2**62
        if hasattr(model, "sb_model") and hasattr(model.sb_model, "use_pallas"):
            model.sb_model.use_pallas = False  # improved-model sections
    params = model.init(jax.random.PRNGKey(0))
    optimizer = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(1e-3))
    opt_state = optimizer.init(params)
    use_bf16 = args.dtype == "bf16"
    groups = int(getattr(model, "num_groups_in_drop_band", 0) or 0)

    def loss_fn(p, noisy, clean):
        if use_bf16:
            p = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, p,
            )
        if waveform_model:
            enhanced = model(p, noisy, training=True)[:, 0]
            return jnp.mean(jnp.square(enhanced.astype(jnp.float32) - clean))
        ns = stft_complex(noisy, 512, 256, 512)
        cs = stft_complex(clean, 512, 256, 512)
        cirm = build_complex_ideal_ratio_mask(ns.real, ns.imag, cs.real, cs.imag)
        if groups > 1 and noisy.shape[0] > groups:  # same gate as the trainer
            cirm = jnp.transpose(
                drop_band(jnp.transpose(cirm, (0, 3, 1, 2)), groups),
                (0, 2, 3, 1),
            )
        mag = jnp.abs(ns)[:, None]
        if use_bf16:
            mag = mag.astype(jnp.bfloat16)
        crm = model(p, mag, training=not args.train_unfused)
        crm = jnp.transpose(crm, (0, 2, 3, 1)).astype(jnp.float32)
        return jnp.mean(jnp.square(crm - cirm))

    seconds = args.crop_seconds
    num_samples = int(args.sr * seconds)

    # gradient-accumulation split: --accum N forces, 0 asks the model's
    # capacity picker for the audio-s/s-maximizing strategy (trainer's
    # auto mode does the same; see Trainer._build_train_step)
    g_accum = args.accum
    if g_accum == 0:
        picker = getattr(model, "recommended_grad_accum", None)
        # frame clock: wave-to-wave models own their STFT (use their hop);
        # spectral models get frames from this bench's stft (hop 256)
        hop = getattr(model, "hop_length", 256) if waveform_model else 256
        g_accum = 1 if picker is None else picker(
            args.batch, num_samples // hop + 1,
            itemsize=2 if use_bf16 else 4,
            drop_groups=groups if groups > 1 and args.batch > groups else 1,
        )
    g_accum = max(1, g_accum)
    if args.accum and args.batch % g_accum != 0:
        raise SystemExit(
            f"--accum {args.accum} does not divide --batch {args.batch}; "
            "pick a divisor (or 0 for auto)"
        )
    if args.batch % g_accum != 0:
        # auto pick incompatible with --batch: match the trainer's
        # behavior (nearest compatible split, train/accum.py) so bench
        # numbers reflect what the trainer would actually run
        from fullsubnet_tpu.train.accum import largest_compatible_accum

        compat = largest_compatible_accum(g_accum, args.batch)
        print(
            f"[bench] auto grad_accum {g_accum} does not divide batch "
            f"{args.batch}; using nearest compatible {compat}",
            file=sys.stderr,
        )
        g_accum = compat

    @jax.jit
    def step(p, o, noisy, clean):
        if g_accum > 1:
            from fullsubnet_tpu.train.accum import (
                scan_accumulated_value_and_grad,
            )

            b = noisy.shape[0]
            nm = noisy.reshape(g_accum, b // g_accum, -1)
            cm = clean.reshape(g_accum, b // g_accum, -1)
            loss, grads = scan_accumulated_value_and_grad(
                loss_fn, p, (nm, cm), g_accum
            )
        else:
            loss, grads = jax.value_and_grad(loss_fn)(p, noisy, clean)
            grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
        updates, o = optimizer.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    rng = np.random.default_rng(0)
    noisy = jnp.asarray(rng.standard_normal((args.batch, num_samples)).astype(np.float32) * 0.1)
    clean = jnp.asarray(rng.standard_normal((args.batch, num_samples)).astype(np.float32) * 0.1)

    for _ in range(args.warmup):
        params, opt_state, loss = step(params, opt_state, noisy, clean)
        float(loss)
    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        params, opt_state, loss = step(params, opt_state, noisy, clean)
        float(loss)  # host sync
        times.append(time.perf_counter() - t0)

    sec_per_step = float(np.median(times))
    from fullsubnet_tpu.roofline import roofline_fields

    hop = getattr(model, "hop_length", 256)
    print(
        json.dumps(
            {
                "metric": f"train_step_{args.model}_{args.dtype}_b{args.batch}",
                "value": round(args.batch * seconds / sec_per_step, 2),
                "unit": "audio_sec_trained_per_sec_per_chip",
                "vs_baseline": round(1.0 / sec_per_step, 4),
                "grad_accum": g_accum,
                **roofline_fields(
                    model, args.batch, num_samples // hop + 1, sec_per_step,
                    itemsize=2 if use_bf16 else 4,
                    drop_groups=(
                        groups if groups > 1 and args.batch > groups else 1
                    ),
                    train=True,
                ),
            }
        )
    )


def bench_data(args):
    """Host-side synthesis throughput through the multiprocess loader:
    on-the-fly noisy mixtures (wav read, noise concat with silence gaps,
    RIR fftconvolve at p=0.75, SNR + loudness mix, anti-clip rescue) at
    the reference recipe's crop length. ``vs_baseline`` is the ratio to
    the flagship train step's peak consumption (1076 audio-s/s at
    B=128) — above 1.0 the host keeps the chip fed."""
    import os
    import tempfile

    from fullsubnet_tpu.data.datasets import TrainDataset
    from fullsubnet_tpu.data.loader import DataLoader
    from fullsubnet_tpu.data.wavio import write_wav

    tmp = tempfile.mkdtemp(prefix="fsn_databench_")
    sr = args.sr
    rng = np.random.default_rng(0)
    t = np.arange(10 * sr) / sr
    clean_paths, noise_paths, rir_paths = [], [], []
    for i in range(32):
        p = os.path.join(tmp, f"c{i}.wav")
        wave = 0.3 * np.sin(2 * np.pi * (150 + 17 * i) * t)
        wave *= 0.6 + 0.4 * np.sin(2 * np.pi * 2.3 * t)
        write_wav(p, wave.astype(np.float32), sr)
        clean_paths.append(p)
    for i in range(8):
        p = os.path.join(tmp, f"n{i}.wav")
        write_wav(p, (0.1 * rng.standard_normal(10 * sr)).astype(np.float32), sr)
        noise_paths.append(p)
    rir_len = int(0.5 * sr)
    for i in range(4):
        r = rng.standard_normal(rir_len) * np.exp(
            -np.arange(rir_len) / (0.05 * sr)
        )
        r[0] = 1.0
        p = os.path.join(tmp, f"r{i}.wav")
        write_wav(p, r.astype(np.float32), sr)
        rir_paths.append(p)

    def scp(name, lst, repeat):
        path = os.path.join(tmp, name + ".txt")
        with open(path, "w") as f:
            f.write("\n".join(lst * repeat) + "\n")
        return path

    # repeat the clean list so one epoch is long enough for steady state
    ds = TrainDataset(
        scp("clean", clean_paths, 256),
        scp("noise", noise_paths, 1),
        scp("rir", rir_paths, 1),
        sr=sr,
        sub_sample_length=args.crop_seconds,
        seed=0,
    )
    loader = DataLoader(
        ds, batch_size=args.batch, shuffle=True, drop_last=True,
        num_workers=args.data_workers, seed=0, prefetch_batches=4,
    )

    def batches():  # epoch-spanning: each epoch's iterator is finite
        epoch = 0
        while True:
            loader.set_epoch(epoch)
            yield from loader
            epoch += 1

    it = batches()
    for _ in range(4):  # warmup: fill the prefetch pipeline
        next(it)
    n_batches = max(1, args.iters * 4)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        noisy, _clean = next(it)
        assert np.isfinite(noisy).all()
    dt = time.perf_counter() - t0
    audio_per_sec = n_batches * args.batch * args.crop_seconds / dt
    print(
        json.dumps(
            {
                "metric": f"data_pipeline_w{args.data_workers}_b{args.batch}",
                "value": round(audio_per_sec, 2),
                "unit": "audio_sec_synthesized_per_sec",
                "vs_baseline": round(audio_per_sec / 1076.0, 4),
            }
        )
    )


def bench_data_device(args):
    """On-device mixture synthesis throughput: the jitted batched
    snr_mix (RIR reverb + SNR mix + loudness + clip rescue) that
    ``device_synthesis = true`` fuses into the train step. Device
    mixer only — the relieved host loader (pure IO) is ``--data``'s
    territory."""
    from fullsubnet_tpu.data.device_mixer import device_snr_mix

    sr = args.sr
    L = int(sr * args.crop_seconds)
    R = int(0.5 * sr)
    rng = np.random.default_rng(0)
    clean = jnp.asarray(
        (0.3 * rng.standard_normal((args.batch, L))).astype(np.float32)
    )
    noise = jnp.asarray(
        (0.1 * rng.standard_normal((args.batch, L))).astype(np.float32)
    )
    rir = np.zeros((args.batch, R), np.float32)
    rir[:, 0] = 1.0
    rir[:, 1:] = 0.05 * rng.standard_normal((args.batch, R - 1)) * np.exp(
        -np.arange(1, R) / (0.05 * sr)
    )
    rir = jnp.asarray(rir)
    flags = jnp.asarray(rng.random(args.batch) < 0.75, jnp.float32)
    snr = jnp.asarray(rng.integers(-5, 21, args.batch), jnp.float32)
    tdb = jnp.asarray(rng.integers(-35, -15, args.batch), jnp.float32)

    jmix = jax.jit(device_snr_mix)

    def run_sync():
        out = None
        for _ in range(args.chain):
            out = jmix(clean, noise, rir, flags, snr, tdb)
        return float(jnp.sum(out[0]))

    for _ in range(args.warmup):
        run_sync()
    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        run_sync()
        times.append(time.perf_counter() - t0)
    sec = float(np.median(times)) / args.chain
    audio_per_sec = args.batch * args.crop_seconds / sec
    print(
        json.dumps(
            {
                "metric": f"device_mix_b{args.batch}",
                "value": round(audio_per_sec, 2),
                "unit": "audio_sec_synthesized_per_sec_per_chip",
                # vs the measured host mixer rate per core (docs/perf.md)
                "vs_baseline": round(audio_per_sec / 1029.0, 4),
            }
        )
    )


def bench_streaming(args):
    """Single-frame streaming step latency: one 16 ms hop per step."""
    from fullsubnet_tpu.infer.streaming import StreamingFullSubNet
    from fullsubnet_tpu.models import FullSubNet

    model = FullSubNet(norm_type="cumulative_laplace_norm")
    params = model.init(jax.random.PRNGKey(0), weight_init=False)

    rng = np.random.default_rng(0)
    if getattr(args, "multistream_only", False):
        bench_multistream(args, model, params, rng)
        return
    engine = StreamingFullSubNet(model, params)
    frame = jnp.asarray(np.abs(rng.standard_normal(model.num_freqs)).astype(np.float32))
    state = engine.init_state()
    for _ in range(args.warmup + 3):
        state, crm = engine.step(state, frame)
    float(jnp.sum(crm))

    times = []
    for _ in range(args.iters * 20):
        t0 = time.perf_counter()
        state, crm = engine.step(state, frame)
        _ = float(jnp.sum(crm))  # force host sync
        times.append(time.perf_counter() - t0)

    hop_sec = 256 / args.sr  # 16 ms of audio per step
    step_ms = float(np.median(times)) * 1e3
    print(
        json.dumps(
            {
                "metric": "streaming_step_latency_fullsubnet",
                "value": round(step_ms, 3),
                "unit": "ms_per_16ms_hop",
                "vs_baseline": round(hop_sec * 1e3 / step_ms, 4),
            }
        )
    )

    # wave-in/wave-out enhancer: the WHOLE hop (framing + rfft + model +
    # mask + OLA) is one jitted device call
    from fullsubnet_tpu.infer.streaming import StreamingEnhancer

    enh = StreamingEnhancer(model, params, n_fft=512, hop_length=256)
    est = enh.init_state()
    hop_samples = (0.1 * rng.standard_normal(256)).astype(np.float32)
    for _ in range(args.warmup + 6):  # warm-up covers priming + look-ahead
        est, _ = enh.push(est, hop_samples)
    times = []
    for _ in range(args.iters * 20):
        t0 = time.perf_counter()
        est, out = enh.push(est, hop_samples)
        assert out.shape == (256,)  # np output: already host-synced
        times.append(time.perf_counter() - t0)
    step_ms = float(np.median(times)) * 1e3
    print(
        json.dumps(
            {
                "metric": "streaming_enhancer_hop_latency_fullsubnet",
                "value": round(step_ms, 3),
                "unit": "ms_per_16ms_hop",
                "vs_baseline": round(hop_sec * 1e3 / step_ms, 4),
            }
        )
    )

    if args.streams > 1:
        bench_multistream(args, model, params, rng)


def bench_multistream(args, model, params, rng):
    """Concurrent-stream serving capacity: B live streams advanced one
    hop per tick in ONE batched device call (MultiStreamEnhancer).
    Capacity = B * hop_time / tick_time concurrent real-time streams."""
    from fullsubnet_tpu.infer.streaming import MultiStreamEnhancer

    B = args.streams
    ms = MultiStreamEnhancer(
        model, params, n_fft=512, hop_length=256, max_streams=B
    )
    state = ms.init_state()
    slots = [ms.open_stream(state) for _ in range(B)]
    hop_samples = (0.1 * rng.standard_normal(256)).astype(np.float32)
    for _ in range(args.warmup + 6):  # covers priming + look-ahead warm-up
        for s in slots:
            ms.push(state, s, hop_samples)
        ms.poll(state)

    times = []
    for _ in range(args.iters * 20):
        for s in slots:
            ms.push(state, s, hop_samples)
        t0 = time.perf_counter()
        out = ms.poll(state)  # np outputs: host-synced
        times.append(time.perf_counter() - t0)
        assert len(out) == B
    tick_ms = float(np.median(times)) * 1e3
    hop_ms = 256 / args.sr * 1e3
    capacity = B * hop_ms / tick_ms
    print(
        json.dumps(
            {
                "metric": f"multistream_capacity_b{B}_fullsubnet",
                "value": round(capacity, 1),
                "unit": "concurrent_realtime_streams_per_chip",
                # per-stream real-time ratio (>1 = all B streams keep up)
                "vs_baseline": round(hop_ms / tick_ms, 4),
                "tick_ms": round(tick_ms, 3),
                # each poll is one device call: on this measurement path
                # the tunnel round trip (~35 ms) IS the tick
                "transport": "remote-tunnel"
                if jax.default_backend() != "cpu" else "local",
            }
        )
    )

    # device-program tick cost: scan K ticks inside ONE program so the
    # per-call round trip amortizes away — the per-tick cost a
    # PCIe-local serving host pays (dispatch there is ~10s of us)
    k_scan = 64
    hop_fn = ms._hop_batch  # the enhancer's own lane-batched hop
    active = jnp.ones((B,), bool)
    hops_k = jnp.tile(jnp.asarray(hop_samples)[None, None], (k_scan, B, 1))

    @jax.jit
    def scan_ticks(params, st, hops):
        def body(s, h):
            s2, out = hop_fn(params, s, h, active)
            return s2, jnp.sum(out)
        s2, sums = jax.lax.scan(body, st, hops)
        return jnp.sum(sums)

    bstate = ms._dev_init_batched()
    float(scan_ticks(ms.params, bstate, hops_k))  # warm
    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        float(scan_ticks(ms.params, bstate, hops_k))
        times.append(time.perf_counter() - t0)
    tick_prog_ms = float(np.median(times)) / k_scan * 1e3
    cap_prog = B * hop_ms / tick_prog_ms
    print(
        json.dumps(
            {
                "metric": f"multistream_program_capacity_b{B}_fullsubnet",
                "value": round(cap_prog, 1),
                "unit": "concurrent_realtime_streams_per_chip",
                "vs_baseline": round(hop_ms / tick_prog_ms, 4),
                "tick_ms": round(tick_prog_ms, 3),
            }
        )
    )


def bench_serving(args):
    """AOT serving-artifact throughput: export the flagship bucketed
    program (random weights), load it back through ServingModel, and
    time ``enhance_batch`` end-to-end (host pad -> program call -> host
    trim) on ``--batch`` utterances of ``--seconds`` each."""
    import tempfile

    from fullsubnet_tpu.checkpoint import CheckpointManager
    from fullsubnet_tpu.config import build_model
    from fullsubnet_tpu.serving import ServingModel, export_enhancer

    if args.model != "fullsubnet":
        raise SystemExit(
            "--serving benches the flagship FullSubNet bucketed artifact "
            "(the fullband baseline buckets too, but is not wired here)"
        )
    config = {
        "acoustics": {
            "n_fft": 512, "win_length": 512,
            "sr": args.sr, "hop_length": 256,
        },
        "inferencer": {
            "path": "inferencer.Inferencer", "type": "full_band_crm_mask",
        },
        "model": {"path": "fullsubnet.model.Model", "args": {}},
    }
    with tempfile.TemporaryDirectory() as tmp:
        model, _ = build_model(config)
        params = model.init(jax.random.PRNGKey(0), weight_init=False)
        mgr = CheckpointManager(f"{tmp}/ckpts")
        mgr.save({"params": params}, epoch=0, keep_weights_history=False)
        export_enhancer(
            config, f"{tmp}/ckpts/latest", f"{tmp}/artifact",
            seconds=(args.seconds,), batch=args.batch,
        )
        served = ServingModel.load(f"{tmp}/artifact")

        rng = np.random.default_rng(0)
        # slightly-short utterances: the artifact pads into the bucket
        # (the production shape; exactly-bucket-length waves would not
        # leave headroom for the tail reflection)
        n = int(args.sr * args.seconds) - 512
        waves = [
            (0.1 * rng.standard_normal(n)).astype(np.float32)
            for _ in range(args.batch)
        ]
        for _ in range(args.warmup):
            out = served.enhance_batch(waves)
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = served.enhance_batch(waves)
            times.append(time.perf_counter() - t0)
        assert all(np.isfinite(o).all() for o in out)
        sec_per_iter = float(np.median(times))
        audio_sec = args.batch * n / args.sr
        rtf = audio_sec / sec_per_iter
        print(
            json.dumps(
                {
                    "metric": "serving_rtf_fullsubnet_"
                    f"{args.sr // 1000}khz_b{args.batch}",
                    "value": round(rtf, 2),
                    "unit": "audio_sec_per_sec_per_chip",
                    "vs_baseline": round(rtf / 500.0, 4),
                    # end-to-end includes host<->device waveform transfer
                    # (~2x 16 MB/call THROUGH THE REMOTE TUNNEL on this
                    # measurement path; PCIe-local on a production host)
                    "transport": "remote-tunnel"
                    if jax.default_backend() != "cpu" else "local",
                }
            )
        )

        # device-program throughput: the artifact's compute alone, on
        # device-resident buffers (the number a PCIe-local host sees).
        # The program's [B, bucket] output feeds back as its input so K
        # chained calls amortize the one scalar-read round trip.
        from fullsubnet_tpu.serving import pad_bucket_batch

        bucket = served.lengths[0]
        padded, lengths = pad_bucket_batch(waves, args.batch, bucket)
        prog = served._programs[bucket]
        x = jnp.asarray(padded)
        tl = np.int32(lengths[0]) if args.batch == 1 else jnp.asarray(lengths)
        k_chain = 4

        def run_chain():
            out = x
            for _ in range(k_chain):
                out = prog.call(served._params, out, tl)
            return float(jnp.sum(out))

        run_chain()  # warm
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            run_chain()
            times.append(time.perf_counter() - t0)
        sec_per_call = float(np.median(times)) / k_chain
        prtf = audio_sec / sec_per_call
        print(
            json.dumps(
                {
                    "metric": "serving_program_rtf_fullsubnet_"
                    f"{args.sr // 1000}khz_b{args.batch}",
                    "value": round(prtf, 2),
                    "unit": "audio_sec_per_sec_per_chip",
                    "vs_baseline": round(prtf / 500.0, 4),
                }
            )
        )


def bench_rtf(args):
    """Offline enhancement real-time factor (the original default mode)."""
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    fn, params, model = build_pipeline(args.model, dtype)
    jfn = jax.jit(fn)

    num_samples = int(args.sr * args.seconds)
    rng = np.random.default_rng(0)
    noisy = jnp.asarray(
        rng.standard_normal((args.batch, num_samples)).astype(np.float32) * 0.1
    )

    # force a scalar host read each timed block: on tunneled/async
    # backends block_until_ready alone can return before the remote
    # computation actually finishes, which inflates RTF by orders of
    # magnitude. The read costs one tunnel round trip (~35-50 ms on this
    # measurement path), which would dominate short programs (the 48 kHz
    # model runs ~60 ms/iter) — so each timed block dispatches `chain`
    # async executions and reads once: executions are ordered on the
    # device stream, so the last output's sum syncing proves all ran.
    def run_sync():
        out = None
        for _ in range(args.chain):
            out = jfn(params, noisy)
        return float(jnp.sum(out))

    for _ in range(args.warmup):
        run_sync()
    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        run_sync()
        times.append(time.perf_counter() - t0)
    sec_per_iter = float(np.median(times)) / args.chain
    audio_sec = args.batch * args.seconds
    rtf = audio_sec / sec_per_iter

    from fullsubnet_tpu.roofline import roofline_fields

    hop = getattr(model, "hop_length", 256)
    print(
        json.dumps(
            {
                "metric": f"rtf_{args.model}_{args.sr // 1000}khz_{args.dtype}",
                "value": round(rtf, 2),
                "unit": "audio_sec_per_sec_per_chip",
                "vs_baseline": round(rtf / 500.0, 4),
                **roofline_fields(
                    model, args.batch, num_samples // hop + 1, sec_per_iter,
                    itemsize=2 if args.dtype == "bf16" else 4,
                ),
            }
        )
    )


# the full-suite items (default mode): everything docs/perf.md claims,
# emitted as one JSON line each so the round artifact captures the lot.
# (mode, overrides) — flagship RTF first (the headline metric).
_SUITE = [
    ("rtf", dict(model="fullsubnet")),
    ("rtf", dict(model="fast_fullsubnet")),
    ("rtf", dict(model="fullband_baseline")),
    ("rtf", dict(model="improved_fullsubnet")),
    ("rtf", dict(model="improved_fullsubnet_48k", sr=48000, batch=32,
                 seconds=10.0)),
    ("train", dict(model="fullsubnet", batch=128)),
    # fast/improved at B=128: the auto capacity pickers split to the
    # measured-optimal microbatch 64 (G=2) — their family records
    ("train", dict(model="fast_fullsubnet", batch=128)),
    ("train", dict(model="fullband_baseline", batch=100)),
    ("train", dict(model="improved_fullsubnet", batch=128)),
    ("train", dict(model="improved_fullsubnet_48k", batch=64, sr=48000)),
    ("streaming", dict(model="fullsubnet", streams=16)),
    # capacity is maximized over lane count: the per-tick cost is
    # dispatch-dominated, so wider lane batches amortize it (the b16 row
    # is kept for round-over-round continuity)
    ("streaming", dict(model="fullsubnet", streams=64,
                       multistream_only=True)),
    ("serving", dict(model="fullsubnet", batch=32, seconds=8.0)),
    ("data", dict(batch=32, data_workers=0, iters=2)),
    ("data_device", dict(batch=128)),
]

_MODE_FNS = {
    "rtf": bench_rtf,
    "train": bench_train,
    "streaming": bench_streaming,
    "serving": bench_serving,
    "data": bench_data,
    "data_device": bench_data_device,
}


def _resolve_shape_defaults(args):
    """Fill unset --sr/--batch/--seconds from the model's native shapes:
    running the 48 kHz model with the 16 kHz defaults both overcounts
    audio-seconds 3x (samples are generated at args.sr but last 1/3 as
    long at 48 kHz) and mislabels the metric."""
    is_48k = getattr(args, "model", None) == "improved_fullsubnet_48k"
    if args.sr is None:
        args.sr = 48000 if is_48k else 16000
    if args.batch is None:
        args.batch = 32 if is_48k else 128
    if args.seconds is None:
        args.seconds = 10.0 if is_48k else 30.0


def run_suite(args):
    """Run every suite item; a failing item prints an error JSON line
    (after the transient-retry policy) instead of killing the rest, so
    the round artifact always captures whatever the backend could do."""
    import copy

    for mode, overrides in _SUITE:
        item = copy.copy(args)
        item.iters = min(args.iters, 5)
        for k, v in overrides.items():
            setattr(item, k, v)
        _resolve_shape_defaults(item)
        try:
            if mode == "data":  # host-only: no tunnel in the loop
                _MODE_FNS[mode](item)
            else:
                _run_with_retry(lambda: _MODE_FNS[mode](item))
        except Exception as e:  # noqa: BLE001 - suite must keep going
            print(
                json.dumps(
                    {
                        "metric": f"{mode}_{getattr(item, 'model', '')}",
                        "error": str(e)[:300],
                    }
                )
            )
            print(f"[bench] suite item {mode}/{overrides} failed: {e}",
                  file=sys.stderr)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--seconds", type=float, default=None)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument(
        "--chain", type=int, default=4,
        help="async executions dispatched per forced host read in --rtf "
        "(amortizes the remote-tunnel round trip that would otherwise "
        "dominate short programs)",
    )
    p.add_argument("--dtype", choices=["bf16", "fp32"], default="bf16")
    p.add_argument(
        "--model", default=None,
        help="model family; with no mode flag, omitting it runs the FULL "
        "suite (every metric docs/perf.md claims, one JSON line each)",
    )
    p.add_argument("--sr", type=int, default=None)
    p.add_argument(
        "--suite", action="store_true",
        help="run the full metric suite (also the default with no args)",
    )
    p.add_argument(
        "--streaming", action="store_true",
        help="benchmark the single-frame streaming step (latency per hop)",
    )
    p.add_argument(
        "--streams", type=int, default=1,
        help="with --streaming: also bench B concurrent streams per "
        "batched device call (MultiStreamEnhancer serving capacity)",
    )
    p.add_argument(
        "--multistream-only", dest="multistream_only", action="store_true",
        help="with --streaming --streams N: skip the single-stream "
        "latency sections (capacity sweep runs only the lane-batched "
        "engine)",
    )
    p.add_argument(
        "--train", action="store_true",
        help="benchmark the jitted training step (fwd+bwd+Adam)",
    )
    p.add_argument(
        "--train-unfused", action="store_true",
        help="with --train: use the legacy unfused (freq_unfold) path",
    )
    p.add_argument(
        "--accum", type=int, default=0,
        help="with --train: gradient-accumulation split (0 = auto via the "
        "model's capacity picker, 1 = off, N = force N microbatches)",
    )
    p.add_argument(
        "--crop-seconds", type=float, default=3.072,
        help="with --train/--data: training crop length in seconds",
    )
    p.add_argument(
        "--data", action="store_true",
        help="benchmark host-side synthesis throughput (loader + mixer)",
    )
    p.add_argument(
        "--serving", action="store_true",
        help="benchmark the AOT serving-artifact path (export + "
        "ServingModel.enhance_batch end-to-end)",
    )
    p.add_argument(
        "--data-workers", type=int, default=16,
        help="with --data: loader worker processes",
    )
    p.add_argument(
        "--data-device", action="store_true",
        help="benchmark on-device mixture synthesis (the jitted batched "
        "snr_mix that [train_dataset.args] device_synthesis fuses into "
        "the train step)",
    )
    args = p.parse_args()

    if args.chain < 1:
        raise SystemExit("--chain must be >= 1")
    if args.streams > 1 and not args.streaming:
        raise SystemExit("--streams is a --streaming mode option")
    any_mode = (
        args.streaming or args.train or args.data or args.serving
        or args.data_device
    )
    if args.suite or (not any_mode and args.model is None):
        if any_mode:
            raise SystemExit("--suite replaces the mode flags")
        if args.model is not None:
            raise SystemExit(
                "--model selects a single-model mode; the suite picks its "
                "own models (drop --model, or drop --suite)"
            )
        run_suite(args)  # resolves shape defaults per suite item
        return
    if args.model is None:
        args.model = "fullsubnet"
    _resolve_shape_defaults(args)
    if args.streaming:
        _run_with_retry(lambda: bench_streaming(args))
        return
    if args.train:
        _run_with_retry(lambda: bench_train(args))
        return
    if args.data_device:
        _run_with_retry(lambda: bench_data_device(args))
        return
    if args.data:
        bench_data(args)  # host-only: no tunnel in the loop
        return
    if args.serving:
        _run_with_retry(lambda: bench_serving(args))
        return
    _run_with_retry(lambda: bench_rtf(args))


if __name__ == "__main__":
    main()
