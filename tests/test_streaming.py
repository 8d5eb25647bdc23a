"""Streaming engine parity: frame-by-frame == offline forward."""

import jax
import jax.numpy as jnp
import numpy as np

from fullsubnet_tpu.acoustics.stft import hann_window, istft, stft_complex
from fullsubnet_tpu.infer.streaming import StreamingFullSubNet, StreamingISTFT
from fullsubnet_tpu.models import FullSubNet


def _tiny_model():
    model = FullSubNet(
        num_freqs=33,
        look_ahead=2,
        fb_num_neighbors=0,
        sb_num_neighbors=3,
        fb_model_hidden_size=16,
        sb_model_hidden_size=12,
        norm_type="cumulative_laplace_norm",
    )
    params = model.init(jax.random.PRNGKey(0), weight_init=False)
    return model, params


def test_streaming_matches_offline_forward():
    model, params = _tiny_model()
    engine = StreamingFullSubNet(model, params)

    rng = np.random.default_rng(0)
    T = 40
    noisy_mag = jnp.asarray(np.abs(rng.standard_normal((33, T))).astype(np.float32))

    offline = model(params, noisy_mag[None, None], dropping_band=False)[0]  # [2, F, T]
    streamed = engine.enhance_spectrogram(noisy_mag)  # [2, F, T]
    np.testing.assert_allclose(
        np.asarray(streamed), np.asarray(offline), atol=1e-4, rtol=1e-3
    )


def test_streaming_step_by_step_equals_block():
    model, params = _tiny_model()
    engine = StreamingFullSubNet(model, params)
    rng = np.random.default_rng(1)
    frames = jnp.asarray(np.abs(rng.standard_normal((10, 33))).astype(np.float32))

    state = engine.init_state()
    outs = []
    for t in range(10):
        state, crm = engine.step(state, frames[t])
        outs.append(crm)
    step_out = jnp.stack(outs)

    state2 = engine.init_state()
    _, block_out = engine.step_block(state2, frames)
    np.testing.assert_allclose(
        np.asarray(step_out), np.asarray(block_out), atol=1e-5, rtol=1e-4
    )


def test_streaming_is_causal():
    """Changing future frames must not change already-emitted masks."""
    model, params = _tiny_model()
    engine = StreamingFullSubNet(model, params)
    rng = np.random.default_rng(2)
    frames = np.abs(rng.standard_normal((12, 33))).astype(np.float32)
    frames2 = frames.copy()
    frames2[8:] *= 7.0

    _, out1 = engine.step_block(engine.init_state(), jnp.asarray(frames))
    _, out2 = engine.step_block(engine.init_state(), jnp.asarray(frames2))
    np.testing.assert_allclose(
        np.asarray(out1[:8]), np.asarray(out2[:8]), atol=1e-6
    )
    assert not np.allclose(np.asarray(out1[8:]), np.asarray(out2[8:]))


def test_streaming_istft_matches_offline():
    """Streaming OLA == offline istft in the steady-state interior."""
    n_fft, hop = 512, 256
    rng = np.random.default_rng(3)
    y = rng.standard_normal((1, 8192)).astype(np.float32)
    spec = stft_complex(y, n_fft, hop, n_fft)  # [1, F, T]
    offline = np.asarray(istft(spec, n_fft, hop, n_fft))  # untrimmed length logic

    s = StreamingISTFT(n_fft, hop)
    state = s.init_state()
    hops = []
    T = spec.shape[-1]
    for t in range(T):
        state, out = s.push(state, spec[0, :, t])
        hops.append(np.asarray(out))
    stream = np.concatenate(hops)

    # streaming output sample i corresponds to padded-signal sample i;
    # istft's `center` trim removes n_fft//2 leading samples. Interior only
    # (first/last frames have partial overlap in the offline version).
    pad = n_fft // 2
    a = stream[pad + hop : T * hop - n_fft]
    b = offline[0][hop : T * hop - n_fft - pad]
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_streaming_full_pipeline_reconstructs():
    """wave -> streaming STFT/model/iSTFT -> wave; output is well-formed."""
    model, params = _tiny_model()
    engine = StreamingFullSubNet(model, params)
    n_fft, hop = 64, 32
    sr_len = 4096
    rng = np.random.default_rng(4)
    y = (0.3 * rng.standard_normal(sr_len)).astype(np.float32)

    spec = stft_complex(jnp.asarray(y)[None], n_fft, hop, n_fft)[0]  # [33, T]
    crm = engine.enhance_spectrogram(jnp.abs(spec))
    from fullsubnet_tpu.acoustics.mask import decompress_cIRM

    crm = decompress_cIRM(jnp.transpose(crm, (1, 2, 0)))  # [F, T, 2]
    er = crm[..., 0] * spec.real - crm[..., 1] * spec.imag
    ei = crm[..., 1] * spec.real + crm[..., 0] * spec.imag

    s = StreamingISTFT(n_fft, hop)
    state = s.init_state()
    outs = []
    for t in range(spec.shape[-1]):
        state, o = s.push(state, jax.lax.complex(er[:, t], ei[:, t]))
        outs.append(np.asarray(o))
    wave = np.concatenate(outs)
    assert np.isfinite(wave).all()
    assert wave.shape[0] == spec.shape[-1] * hop


def test_streaming_enhancer_matches_offline_pipeline():
    """Push-based wave-in/wave-out enhancer == offline full_band_crm_mask
    (cumulative-norm model) in the interior."""
    from fullsubnet_tpu.acoustics.mask import decompress_cIRM
    from fullsubnet_tpu.infer.streaming import StreamingEnhancer

    n_fft, hop = 64, 32
    model, params = _tiny_model()
    rng = np.random.default_rng(7)
    wave = (0.3 * rng.standard_normal(4096)).astype(np.float32)

    spec = stft_complex(jnp.asarray(wave)[None], n_fft, hop, n_fft)
    crm = model(params, jnp.abs(spec)[:, None], dropping_band=False)
    crm = decompress_cIRM(jnp.transpose(crm, (0, 2, 3, 1)))
    er = crm[..., 0] * spec.real - crm[..., 1] * spec.imag
    ei = crm[..., 1] * spec.real + crm[..., 0] * spec.imag
    offline = np.asarray(
        istft((er, ei), n_fft, hop, n_fft, length=4096, input_type="real_imag")
    )[0]

    enh = StreamingEnhancer(model, params, n_fft, hop)
    state = enh.init_state()
    chunks = []
    for i in range(0, 4096, hop):
        state, out = enh.push(state, wave[i : i + hop])
        if len(out):
            chunks.append(out)
    state, out = enh.flush(state)
    if len(out):
        chunks.append(out)
    stream = np.concatenate(chunks)

    # output is sample-aligned with the input (pad prefix dropped) and
    # exact from sample 0 (partial-envelope OLA start)
    np.testing.assert_allclose(stream[:3800], offline[:3800], atol=1e-3)


def test_streaming_enhancer_improved_matches_offline():
    """The push-based wave host wraps the Improved family too (spectrum-
    domain engine, zero look-ahead): stream == offline wave-to-wave
    forward in the interior."""
    from fullsubnet_tpu.infer.streaming import StreamingEnhancer

    model, params = _tiny_improved()
    rng = np.random.default_rng(11)
    wave = (0.2 * rng.standard_normal(2048)).astype(np.float32)
    offline = np.asarray(model(params, jnp.asarray(wave)[None])[0, 0])

    enh = StreamingEnhancer(model, params, n_fft=64, hop_length=16)
    assert enh.look_ahead == 0
    state = enh.init_state()
    chunks = []
    for i in range(0, 2048, 160):  # ragged vs hop: exercises staging
        state, out = enh.push(state, wave[i : i + 160])
        if len(out):
            chunks.append(out)
    state, out = enh.flush(state)
    if len(out):
        chunks.append(out)
    stream = np.concatenate(chunks)

    # aligned output, exact from sample 0 — with hop = n_fft/4 the first
    # hops run on a PARTIAL OLA envelope (the steady-state envelope would
    # under-scale them; regression for the warm-up envelope table)
    np.testing.assert_allclose(stream[:1800], offline[:1800], atol=1e-3)


def test_streaming_fullband_matches_offline():
    """StreamingFullBand frame loop == FullBandModel offline forward."""
    from fullsubnet_tpu.infer.streaming import StreamingFullBand
    from fullsubnet_tpu.models import FullBandModel

    model = FullBandModel(
        num_freqs=33, hidden_size=16, num_layers=2,
        norm_type="cumulative_laplace_norm",
    )
    params = model.init(jax.random.PRNGKey(5), weight_init=False)
    engine = StreamingFullBand(model, params)

    rng = np.random.default_rng(5)
    noisy_mag = jnp.asarray(np.abs(rng.standard_normal((33, 25))).astype(np.float32))
    offline = model(params, noisy_mag[None, None])[0]  # [2, F, T]
    streamed = engine.enhance_spectrogram(noisy_mag)
    np.testing.assert_allclose(
        np.asarray(streamed), np.asarray(offline), atol=1e-4, rtol=1e-3
    )


def test_streaming_fullband_is_causal():
    from fullsubnet_tpu.infer.streaming import StreamingFullBand
    from fullsubnet_tpu.models import FullBandModel

    model = FullBandModel(
        num_freqs=17, hidden_size=8, num_layers=2,
        norm_type="cumulative_laplace_norm",
    )
    params = model.init(jax.random.PRNGKey(6), weight_init=False)
    engine = StreamingFullBand(model, params)
    rng = np.random.default_rng(6)
    frames = np.abs(rng.standard_normal((12, 17))).astype(np.float32)
    frames2 = frames.copy()
    frames2[8:] *= 5.0
    _, out1 = engine.step_block(engine.init_state(), jnp.asarray(frames))
    _, out2 = engine.step_block(engine.init_state(), jnp.asarray(frames2))
    np.testing.assert_allclose(np.asarray(out1[:8]), np.asarray(out2[:8]), atol=1e-6)


def _tiny_improved():
    from fullsubnet_tpu.models import ImprovedFullSubNet

    model = ImprovedFullSubNet(
        n_fft=64, hop_length=16, win_length=64, num_freqs=33,
        freq_cutoffs=(8, 16), sb_num_center_freqs=(1, 2, 4),
        sb_num_neighbor_freqs=(3, 3, 3), fb_num_center_freqs=(1, 2, 4),
        fb_num_neighbor_freqs=(3, 3, 3), fb_hidden_size=16, sb_hidden_size=12,
        norm_type="cumulative_laplace_norm",
    )
    params = model.init(jax.random.PRNGKey(9), weight_init=False)
    return model, params


def test_streaming_improved_matches_offline():
    """StreamingImprovedFullSubNet wave pipeline == offline wave-to-wave
    forward (zero look-ahead: full-length equality)."""
    from fullsubnet_tpu.infer.streaming import StreamingImprovedFullSubNet

    model, params = _tiny_improved()
    rng = np.random.default_rng(8)
    wave = jnp.asarray((0.2 * rng.standard_normal(2048)).astype(np.float32))

    offline = model(params, wave[None])[0, 0]  # [T]
    engine = StreamingImprovedFullSubNet(model, params)
    streamed = engine.enhance_wave(wave)
    np.testing.assert_allclose(
        np.asarray(streamed), np.asarray(offline), atol=1e-4, rtol=1e-3
    )


def test_streaming_improved_is_causal():
    from fullsubnet_tpu.acoustics.stft import stft_complex
    from fullsubnet_tpu.infer.streaming import StreamingImprovedFullSubNet

    model, params = _tiny_improved()
    engine = StreamingImprovedFullSubNet(model, params)
    rng = np.random.default_rng(9)
    wave = (0.2 * rng.standard_normal(2048)).astype(np.float32)
    spec = stft_complex(jnp.asarray(wave)[None], 64, 16, 64)[0].T  # [T', F]
    spec2 = spec.at[60:].multiply(4.0)
    _, out1 = engine.step_block(engine.init_state(), spec)
    _, out2 = engine.step_block(engine.init_state(), spec2)
    np.testing.assert_allclose(
        np.asarray(out1[:60]), np.asarray(out2[:60]), atol=1e-6
    )
    assert not np.allclose(np.asarray(out1[60:]), np.asarray(out2[60:]))


def _tiny_fast():
    from fullsubnet_tpu.models import FastFullSubNet

    model = FastFullSubNet(
        encoder_input_size=33,
        num_mels=8,
        noisy_input_num_neighbors=2,
        norm_type="cumulative_laplace_norm",
    )
    params = model.init(jax.random.PRNGKey(11), weight_init=False)
    return model, params


def test_streaming_fast_matches_offline():
    """StreamingFastFullSubNet (downsampled bottleneck clock + repeat-
    upsampling hold) == FastFullSubNet offline forward. T values cover
    both tail cases of real_time_downsampling (r == 0 and r != 0)."""
    from fullsubnet_tpu.infer.streaming import StreamingFastFullSubNet

    model, params = _tiny_fast()
    engine = StreamingFastFullSubNet(model, params)
    rng = np.random.default_rng(12)
    for t in (19, 20):  # + look_ahead 2 -> n_rest 20 (r=0) / 21 (r=1)
        noisy_mag = jnp.asarray(
            np.abs(rng.standard_normal((33, t))).astype(np.float32)
        )
        offline = model(params, noisy_mag[None, None])[0]  # [2, F, T]
        streamed = engine.enhance_spectrogram(noisy_mag)
        np.testing.assert_allclose(
            np.asarray(streamed), np.asarray(offline), atol=1e-4, rtol=1e-3
        )


def test_streaming_fast_step_equals_block():
    """Single-frame step loop == step_block scan (same compiled math)."""
    from fullsubnet_tpu.infer.streaming import StreamingFastFullSubNet

    model, params = _tiny_fast()
    engine = StreamingFastFullSubNet(model, params)
    rng = np.random.default_rng(13)
    frames = jnp.asarray(
        np.abs(rng.standard_normal((7, 33))).astype(np.float32)
    )
    st = engine.init_state()
    outs = []
    for i in range(frames.shape[0]):
        st, o = engine.step(st, frames[i])
        outs.append(o)
    st2 = engine.init_state()
    _, block = engine.step_block(st2, frames)
    np.testing.assert_allclose(
        np.asarray(jnp.stack(outs)), np.asarray(block), atol=1e-5, rtol=1e-4
    )


def test_streaming_enhancer_fast_model():
    """StreamingEnhancer dispatches to the fast-model engine via
    make_streaming_engine: wave-in/wave-out == offline full_band_crm_mask
    with the fast model, interior samples."""
    from fullsubnet_tpu.acoustics.mask import decompress_cIRM
    from fullsubnet_tpu.infer.streaming import StreamingEnhancer

    n_fft, hop = 64, 32
    model, params = _tiny_fast()
    rng = np.random.default_rng(17)
    wave = (0.3 * rng.standard_normal(4096)).astype(np.float32)

    spec = stft_complex(jnp.asarray(wave)[None], n_fft, hop, n_fft)
    crm = model(params, jnp.abs(spec)[:, None])
    crm = decompress_cIRM(jnp.transpose(crm, (0, 2, 3, 1)))
    er = crm[..., 0] * spec.real - crm[..., 1] * spec.imag
    ei = crm[..., 1] * spec.real + crm[..., 0] * spec.imag
    offline = np.asarray(
        istft((er, ei), n_fft, hop, n_fft, length=4096, input_type="real_imag")
    )[0]

    enh = StreamingEnhancer(model, params, n_fft, hop)
    state = enh.init_state()
    chunks = []
    for i in range(0, 4096, hop):
        state, out = enh.push(state, wave[i : i + hop])
        if len(out):
            chunks.append(out)
    state, out = enh.flush(state)
    if len(out):
        chunks.append(out)
    stream = np.concatenate(chunks)

    np.testing.assert_allclose(stream[:3800], offline[:3800], atol=1e-3)


# ---------------------------------------------------------------------------
# MultiStreamEnhancer: batched concurrent streams == per-stream single path
# ---------------------------------------------------------------------------


def _single_stream_reference(model, params, wave, n_fft, hop):
    """Run one wave through the single-stream StreamingEnhancer."""
    from fullsubnet_tpu.infer.streaming import StreamingEnhancer

    enh = StreamingEnhancer(model, params, n_fft, hop)
    state = enh.init_state()
    chunks = []
    for i in range(0, len(wave), hop):
        state, out = enh.push(state, wave[i : i + hop])
        if len(out):
            chunks.append(out)
    _, out = enh.flush(state)
    if len(out):
        chunks.append(out)
    return np.concatenate(chunks)


def test_multistream_matches_single_stream():
    """3 concurrent streams, interleaved unequal pushes -> each stream's
    output matches its own single-stream run."""
    from fullsubnet_tpu.infer.streaming import MultiStreamEnhancer

    n_fft, hop = 64, 32
    model, params = _tiny_model()
    rng = np.random.default_rng(11)
    waves = [
        (0.3 * rng.standard_normal(2048)).astype(np.float32) for _ in range(3)
    ]
    singles = [
        _single_stream_reference(model, params, w, n_fft, hop) for w in waves
    ]

    ms = MultiStreamEnhancer(model, params, n_fft, hop, max_streams=4)
    state = ms.init_state()
    slots = [ms.open_stream(state) for _ in range(3)]
    got = {s: [] for s in slots}
    # interleave pushes with deliberately unequal chunk sizes
    sizes = [hop, 3 * hop, 2 * hop]
    pos = [0, 0, 0]
    while any(p < 2048 for p in pos):
        for j, slot in enumerate(slots):
            if pos[j] < 2048:
                ms.push(state, slot, waves[j][pos[j] : pos[j] + sizes[j]])
                pos[j] += sizes[j]
        for slot, out in ms.poll(state).items():
            got[slot].append(out)
    for j, slot in enumerate(slots):
        got[slot].append(ms.drain(state, slot))
        stream = np.concatenate(got[slot])
        n = min(len(stream), len(singles[j]))
        assert n >= 2048
        np.testing.assert_allclose(
            stream[:n], singles[j][:n], atol=1e-5,
            err_msg=f"stream {j} diverged from its single-stream run",
        )


def test_multistream_slot_reuse_and_laggy_stream():
    """A slot closed mid-run and reopened serves a fresh stream exactly;
    a stream fed nothing while others tick stays intact."""
    from fullsubnet_tpu.infer.streaming import MultiStreamEnhancer

    n_fft, hop = 64, 32
    model, params = _tiny_model()
    rng = np.random.default_rng(12)
    w_a = (0.3 * rng.standard_normal(1024)).astype(np.float32)
    w_b = (0.3 * rng.standard_normal(1024)).astype(np.float32)
    w_lag = (0.3 * rng.standard_normal(1024)).astype(np.float32)

    ms = MultiStreamEnhancer(model, params, n_fft, hop, max_streams=2)
    state = ms.init_state()
    s_a = ms.open_stream(state)
    s_lag = ms.open_stream(state)

    # feed only the first half of stream A while the laggy slot gets a
    # head start then goes silent
    ms.push(state, s_lag, w_lag[: 4 * hop])
    got_lag = [ms.poll(state).get(s_lag, np.zeros(0, np.float32))]
    ms.push(state, s_a, w_a)
    out = ms.poll(state)
    got_a = [out.get(s_a, np.zeros(0, np.float32))]
    got_lag.append(out.get(s_lag, np.zeros(0, np.float32)))
    got_a.append(ms.drain(state, s_a))
    stream_a = np.concatenate(got_a)

    single_a = _single_stream_reference(model, params, w_a, n_fft, hop)
    n = min(len(stream_a), len(single_a))
    np.testing.assert_allclose(stream_a[:n], single_a[:n], atol=1e-5)

    # reuse A's slot for a brand-new stream; the laggy stream resumes
    s_b = ms.open_stream(state)
    assert s_b == s_a, "freed slot should be reused"
    ms.push(state, s_b, w_b)
    ms.push(state, s_lag, w_lag[4 * hop :])
    out = ms.poll(state)
    got_b = [out.get(s_b, np.zeros(0, np.float32))]
    got_lag.append(out.get(s_lag, np.zeros(0, np.float32)))
    got_b.append(ms.drain(state, s_b))
    got_lag.append(ms.drain(state, s_lag))

    stream_b = np.concatenate(got_b)
    single_b = _single_stream_reference(model, params, w_b, n_fft, hop)
    n = min(len(stream_b), len(single_b))
    np.testing.assert_allclose(
        stream_b[:n], single_b[:n], atol=1e-5,
        err_msg="reused slot not reset to a fresh stream",
    )

    stream_lag = np.concatenate(got_lag)
    single_lag = _single_stream_reference(model, params, w_lag, n_fft, hop)
    n = min(len(stream_lag), len(single_lag))
    np.testing.assert_allclose(
        stream_lag[:n], single_lag[:n], atol=1e-5,
        err_msg="pausing a stream while others tick corrupted its state",
    )


def test_multistream_improved_spectrum_domain():
    """The spectrum-domain (Improved) family works batched too."""
    from fullsubnet_tpu.infer.streaming import MultiStreamEnhancer

    model, params = _tiny_improved()
    rng = np.random.default_rng(13)
    waves = [
        (0.3 * rng.standard_normal(1024)).astype(np.float32) for _ in range(2)
    ]
    singles = [
        _single_stream_reference(model, params, w, 64, 16) for w in waves
    ]
    ms = MultiStreamEnhancer(model, params, 64, 16, max_streams=2)
    state = ms.init_state()
    slots = [ms.open_stream(state) for _ in range(2)]
    got = {s: [] for s in slots}
    for j, slot in enumerate(slots):
        ms.push(state, slot, waves[j])
    for slot, out in ms.poll(state).items():
        got[slot].append(out)
    for j, slot in enumerate(slots):
        got[slot].append(ms.drain(state, slot))
        stream = np.concatenate(got[slot])
        n = min(len(stream), len(singles[j]))
        assert n >= 1024
        np.testing.assert_allclose(stream[:n], singles[j][:n], atol=1e-5)


def test_multistream_finish_rides_shared_ticks():
    """finish() stages the flush tail instead of stalling other streams;
    poll() emits the remainder and frees the slot — total output equals
    the synchronous drain() path."""
    from fullsubnet_tpu.infer.streaming import MultiStreamEnhancer

    n_fft, hop = 64, 32
    model, params = _tiny_model()
    rng = np.random.default_rng(14)
    w_a = (0.3 * rng.standard_normal(1024)).astype(np.float32)
    w_b = (0.3 * rng.standard_normal(2048)).astype(np.float32)

    ms = MultiStreamEnhancer(model, params, n_fft, hop, max_streams=2)
    state = ms.init_state()
    s_a = ms.open_stream(state)
    s_b = ms.open_stream(state)
    ms.push(state, s_a, w_a)
    ms.push(state, s_b, w_b[:1024])
    out = ms.poll(state)
    got_a = [out.get(s_a, np.zeros(0, np.float32))]
    got_b = [out.get(s_b, np.zeros(0, np.float32))]

    # finish A; its tail rides the same ticks that advance B's second half
    ms.finish(state, s_a)
    ms.push(state, s_b, w_b[1024:])
    out = ms.poll(state)
    got_a.append(out.get(s_a, np.zeros(0, np.float32)))
    got_b.append(out.get(s_b, np.zeros(0, np.float32)))
    assert state["slots"][s_a] is None, "finished slot should be freed"
    got_b.append(ms.drain(state, s_b))

    single_a = _single_stream_reference(model, params, w_a, n_fft, hop)
    single_b = _single_stream_reference(model, params, w_b, n_fft, hop)
    stream_a = np.concatenate(got_a)
    stream_b = np.concatenate(got_b)
    n = min(len(stream_a), len(single_a))
    assert n >= 1024
    np.testing.assert_allclose(stream_a[:n], single_a[:n], atol=1e-5)
    n = min(len(stream_b), len(single_b))
    assert n >= 2048
    np.testing.assert_allclose(stream_b[:n], single_b[:n], atol=1e-5)


def test_streaming_enhancer_lookahead_with_deep_overlap():
    """look_ahead > 0 combined with hop < n_fft/2: the look-ahead warm-up
    pushes zero spectra through the OLA, which must NOT advance the
    warm-up envelope index — regression for the first emitted hop being
    normalized by a too-full partial envelope (was ~0.83-0.99x off)."""
    from fullsubnet_tpu.acoustics.mask import decompress_cIRM
    from fullsubnet_tpu.infer.streaming import StreamingEnhancer

    n_fft, hop = 64, 16  # 75% overlap; model look_ahead = 2
    model, params = _tiny_model()
    rng = np.random.default_rng(21)
    wave = (0.3 * rng.standard_normal(2048)).astype(np.float32)

    spec = stft_complex(jnp.asarray(wave)[None], n_fft, hop, n_fft)
    crm = model(params, jnp.abs(spec)[:, None], dropping_band=False)
    crm = decompress_cIRM(jnp.transpose(crm, (0, 2, 3, 1)))
    er = crm[..., 0] * spec.real - crm[..., 1] * spec.imag
    ei = crm[..., 1] * spec.real + crm[..., 0] * spec.imag
    offline = np.asarray(
        istft((er, ei), n_fft, hop, n_fft, length=2048, input_type="real_imag")
    )[0]

    enh = StreamingEnhancer(model, params, n_fft, hop)
    state = enh.init_state()
    chunks = []
    for i in range(0, 2048, 100):  # ragged pushes
        state, out = enh.push(state, wave[i : i + 100])
        if len(out):
            chunks.append(out)
    state, out = enh.flush(state)
    if len(out):
        chunks.append(out)
    stream = np.concatenate(chunks)

    np.testing.assert_allclose(stream[:1900], offline[:1900], atol=1e-3)


def test_streaming_enhancer_rejects_short_window():
    import pytest

    model, params = _tiny_model()
    from fullsubnet_tpu.infer.streaming import StreamingEnhancer

    with pytest.raises(ValueError, match="win_length"):
        StreamingEnhancer(model, params, 64, 32, win_length=40)
