"""SequenceModel's Pallas route (fused dual-cell kernel) == scan path."""

import jax
import jax.numpy as jnp
import numpy as np

from fullsubnet_tpu.nn.sequence_model import SequenceModel


def _setup(cell="LSTM", act="ReLU"):
    sm = SequenceModel(
        input_size=20, output_size=12, hidden_size=16, num_layers=2,
        bidirectional=False, sequence_model=cell,
        output_activate_function=act,
    )
    params = sm.init(jax.random.PRNGKey(0), orthogonal_init=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 20, 17))  # [B, F, T]
    return sm, params, x


def test_pallas_route_matches_scan_lstm():
    sm, params, x = _setup("LSTM", "ReLU")
    ref = sm(params, x)  # scan (CPU)
    out = sm._pallas_forward(params, x, training=False, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_route_matches_scan_gru():
    sm, params, x = _setup("GRU", None)
    ref = sm(params, x)
    out = sm._pallas_forward(params, x, training=False, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_route_training_grads_match_scan():
    sm, params, x = _setup("LSTM", "ReLU")
    tgt = jax.random.normal(jax.random.PRNGKey(2), (8, 12, 17))

    def loss_scan(p):
        return jnp.mean(jnp.square(sm(p, x) - tgt))

    def loss_pallas(p):
        o = sm._pallas_forward(p, x, training=True, interpret=True)
        return jnp.mean(jnp.square(o - tgt))

    lr, gr = jax.value_and_grad(loss_scan)(params)
    lp, gp = jax.value_and_grad(loss_pallas)(params)
    np.testing.assert_allclose(float(lp), float(lr), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-3)


def test_pallas_route_training_grads_wide_hidden():
    """H > 448 (the 512-hidden full-band stages) trains through the
    kernel's split-dW backward; gradients still match the scan path."""
    sm = SequenceModel(
        input_size=20, output_size=12, hidden_size=512, num_layers=2,
        bidirectional=False, sequence_model="LSTM",
        output_activate_function="ReLU",
    )
    assert sm._pallas_eligible(128, 9, training=True) or (
        jax.default_backend() == "cpu"
    )
    params = sm.init(jax.random.PRNGKey(0), orthogonal_init=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 20, 9))
    tgt = jax.random.normal(jax.random.PRNGKey(2), (8, 12, 9))

    def loss_scan(p):
        return jnp.mean(jnp.square(sm(p, x) - tgt))

    def loss_pallas(p):
        o = sm._pallas_forward(p, x, training=True, interpret=True)
        return jnp.mean(jnp.square(o - tgt))

    lr, gr = jax.value_and_grad(loss_scan)(params)
    lp, gp = jax.value_and_grad(loss_pallas)(params)
    np.testing.assert_allclose(float(lp), float(lr), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gr)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-3
        )


def test_eligibility_gates():
    sm, params, x = _setup()
    # CPU backend -> never eligible (these tests run on the CPU mesh)
    assert not sm._pallas_eligible(128, 100)
    # small batches / prelu / 1-layer / bidirectional are gated off
    sm2 = SequenceModel(20, 12, 16, 2, False, "LSTM", "PReLU")
    assert sm2._act == "prelu"

def test_pallas_route_three_layer_lstm():
    """fullband_baseline's shape class (3-layer LSTM + fc head): the
    N-layer kernel (fwd + VJP) matches the scan path."""
    sm = SequenceModel(
        input_size=20, output_size=12, hidden_size=16, num_layers=3,
        bidirectional=False, sequence_model="LSTM",
        output_activate_function="ReLU",
    )
    params = sm.init(jax.random.PRNGKey(0), orthogonal_init=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 20, 17))
    ref = sm(params, x)
    out = sm._pallas_forward(params, x, training=False, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    tgt = jax.random.normal(jax.random.PRNGKey(2), (8, 12, 17))

    def loss_scan(p):
        return jnp.mean(jnp.square(sm(p, x) - tgt))

    def loss_pallas(p):
        o = sm._pallas_forward(p, x, training=True, interpret=True)
        return jnp.mean(jnp.square(o - tgt))

    lr, gr = jax.value_and_grad(loss_scan)(params)
    lp, gp = jax.value_and_grad(loss_pallas)(params)
    np.testing.assert_allclose(float(lp), float(lr), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-3)


def test_pallas_route_three_layer_gru_chunked():
    """3-layer GRU through the time-chunked VJP (forced small chunk)."""
    from fullsubnet_tpu.ops.subband_lstm import fused_subband_lstm_train
    from fullsubnet_tpu.nn import rnn

    sm = SequenceModel(
        input_size=20, output_size=12, hidden_size=16, num_layers=3,
        bidirectional=False, sequence_model="GRU",
        output_activate_function=None,
    )
    params = sm.init(jax.random.PRNGKey(0), orthogonal_init=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (24, 130, 20))  # [T, N, F]
    tgt = jax.random.normal(jax.random.PRNGKey(2), (24, 130, 12))

    def loss_kernel(p):
        o = fused_subband_lstm_train(
            x, *[layer[0] for layer in p["rnn"]], p["fc"],
            row_tile=128, interpret=True, time_chunk=8,
        )
        return jnp.mean(jnp.square(o - tgt))

    def loss_scan(p):
        o = rnn.rnn_forward(p["rnn"], jnp.swapaxes(x, 0, 1), "GRU")
        o = o @ p["fc"]["weight"].T + p["fc"]["bias"]
        return jnp.mean(jnp.square(jnp.swapaxes(o, 0, 1) - tgt))

    lr, gr = jax.value_and_grad(loss_scan)(params)
    lp, gp = jax.value_and_grad(loss_kernel)(params)
    np.testing.assert_allclose(float(lp), float(lr), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-3)
