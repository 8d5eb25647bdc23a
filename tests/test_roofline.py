"""Analytic FLOPs/roofline accounting (bench.py's mfu/roofline fields)."""

import numpy as np

from fullsubnet_tpu.nn.sequence_model import SequenceModel
from fullsubnet_tpu.roofline import (
    device_peaks,
    model_fwd_flops,
    model_min_bytes,
    roofline_fields,
    seq_model_flops,
)


def test_seq_model_flops_lstm_closed_form():
    # 2-layer LSTM, in=32, H=64, out=2: per row-step
    #   layer 1: 2 * 4H * (32 + H), layer 2: 2 * 4H * (H + H), proj: 2*H*2
    sm = SequenceModel(32, 2, 64, 2, False, "LSTM", None)
    rows, steps = 7, 11
    want = rows * steps * (
        2 * 4 * 64 * (32 + 64) + 2 * 4 * 64 * (64 + 64) + 2 * 64 * 2
    )
    assert seq_model_flops(sm, rows, steps) == want


def test_seq_model_flops_gru_and_bidi():
    gru = SequenceModel(32, 0, 64, 1, False, "GRU", None)
    lstm = SequenceModel(32, 0, 64, 1, False, "LSTM", None)
    assert seq_model_flops(gru, 3, 5) * 4 == seq_model_flops(lstm, 3, 5) * 3

    bi = SequenceModel(32, 0, 64, 2, True, "LSTM", None)
    # layer 1 doubles (two directions); layer 2 doubles AND takes 2H input
    want = 2 * (2 * 4 * 64 * (32 + 64)) + 2 * (2 * 4 * 64 * (128 + 64))
    assert seq_model_flops(bi, 1, 1) == want


def test_model_stage_structure_flagship():
    from fullsubnet_tpu.models import FullSubNet

    m = FullSubNet(num_freqs=33, fb_model_hidden_size=16,
                   sb_model_hidden_size=8, num_groups_in_drop_band=2,
                   look_ahead=2)
    b, t = 4, 10
    fb = seq_model_flops(m.fb_model, b, t + 2)
    sb = seq_model_flops(m.sb_model, b * 33, t + 2)
    assert model_fwd_flops(m, b, t) == fb + sb
    # fused drop_band shrinks ONLY the sub-band rows: F -> F // groups
    sb_half = seq_model_flops(m.sb_model, b * 16, t + 2)
    assert model_fwd_flops(m, b, t, drop_groups=2) == fb + sb_half


def test_model_stage_structure_fast_downsampled_clock():
    from fullsubnet_tpu.models import FastFullSubNet

    m = FastFullSubNet(shrink_size=2, num_mels=8, bottleneck_hidden_size=8)
    b, t = 2, 9
    tl = t + m.look_ahead
    t_down = (tl - 1 + 1) // 2 + 1  # block 0 + ceil((T-1)/s) blocks
    want = (
        seq_model_flops(m.encoder[0], b, tl)
        + seq_model_flops(m.encoder[1], b, tl)
        + seq_model_flops(m.bottleneck, b * 8, t_down)
        + seq_model_flops(m.decoder_lstm[0], b, tl)
        + seq_model_flops(m.decoder_lstm[1], b, tl)
    )
    assert model_fwd_flops(m, b, t) == want


def test_model_stage_structure_improved_sections():
    from fullsubnet_tpu.models import ImprovedFullSubNet

    m = ImprovedFullSubNet()
    b, t = 2, 9
    want = seq_model_flops(m.fb_model, b, t)
    for (n_units, _w), sm in zip(m._section_shapes(), m.sb_model.sb_models):
        want += seq_model_flops(sm, b * n_units, t)
    assert model_fwd_flops(m, b, t) == want
    # paper shapes: sections cover (256 - 0) bins in units of 1/4/8
    units = [n for n, _ in m._section_shapes()]
    assert units == [20, 15, 22]


def test_roofline_fields_cpu_and_bytes():
    from fullsubnet_tpu.models import FullSubNet

    m = FullSubNet(num_freqs=33, fb_model_hidden_size=16,
                   sb_model_hidden_size=8)
    # bytes lower bound scales with itemsize; train doubles traffic
    b1 = model_min_bytes(m, 2, 8, itemsize=2)
    b2 = model_min_bytes(m, 2, 8, itemsize=4)
    assert b2 == 2 * b1 > 0

    fields = roofline_fields(m, 2, 8, 0.01)
    if device_peaks() is None:  # CPU test env: no peak, no fields
        assert fields == {}
    else:
        assert 0 < fields["mfu"] <= 1.5
        tr = roofline_fields(m, 2, 8, 0.01, train=True)
        assert np.isclose(tr["analytic_tflops"],
                          3 * fields["analytic_tflops"], rtol=1e-6)
