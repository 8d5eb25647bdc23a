"""LSTM/GRU scan-cell numerics vs torch.nn.LSTM/GRU with copied weights."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from fullsubnet_tpu.nn import (
    lstm_init,
    gru_init,
    lstm_forward,
    gru_forward,
    rnn_init_state,
)
from fullsubnet_tpu.nn.sequence_model import SequenceModel


def _copy_torch_rnn_weights(trnn, num_layers, bidirectional):
    """torch RNN -> our params pytree (list of layers of list of directions)."""
    params = []
    dirs = 2 if bidirectional else 1
    for layer in range(num_layers):
        directions = []
        for d in range(dirs):
            sfx = f"_l{layer}" + ("_reverse" if d else "")
            directions.append(
                {
                    "w_ih": jnp.asarray(getattr(trnn, f"weight_ih{sfx}").detach().numpy()),
                    "w_hh": jnp.asarray(getattr(trnn, f"weight_hh{sfx}").detach().numpy()),
                    "b_ih": jnp.asarray(getattr(trnn, f"bias_ih{sfx}").detach().numpy()),
                    "b_hh": jnp.asarray(getattr(trnn, f"bias_hh{sfx}").detach().numpy()),
                }
            )
        params.append(directions)
    return params


def test_lstm_matches_torch():
    torch.manual_seed(0)
    B, T, I, H, L = 3, 25, 16, 32, 2
    trnn = torch.nn.LSTM(I, H, L, batch_first=True)
    x = torch.randn(B, T, I)
    with torch.no_grad():
        ref, _ = trnn(x)
    params = _copy_torch_rnn_weights(trnn, L, False)
    ours = lstm_forward(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-5, rtol=1e-4)


def test_bilstm_matches_torch():
    torch.manual_seed(1)
    B, T, I, H, L = 2, 15, 8, 12, 2
    trnn = torch.nn.LSTM(I, H, L, batch_first=True, bidirectional=True)
    x = torch.randn(B, T, I)
    with torch.no_grad():
        ref, _ = trnn(x)
    params = _copy_torch_rnn_weights(trnn, L, True)
    ours = lstm_forward(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-5, rtol=1e-4)


def test_gru_matches_torch():
    torch.manual_seed(2)
    B, T, I, H, L = 3, 20, 10, 24, 2
    trnn = torch.nn.GRU(I, H, L, batch_first=True)
    x = torch.randn(B, T, I)
    with torch.no_grad():
        ref, _ = trnn(x)
    params = _copy_torch_rnn_weights(trnn, L, False)
    ours = gru_forward(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-5, rtol=1e-4)


def test_bigru_matches_torch():
    torch.manual_seed(3)
    B, T, I, H, L = 2, 12, 6, 10, 1
    trnn = torch.nn.GRU(I, H, L, batch_first=True, bidirectional=True)
    x = torch.randn(B, T, I)
    with torch.no_grad():
        ref, _ = trnn(x)
    params = _copy_torch_rnn_weights(trnn, L, True)
    ours = gru_forward(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-5, rtol=1e-4)


def test_init_shapes():
    key = jax.random.PRNGKey(0)
    p = lstm_init(key, 32, 384, num_layers=2)
    assert len(p) == 2 and len(p[0]) == 1
    assert p[0][0]["w_ih"].shape == (4 * 384, 32)
    assert p[1][0]["w_ih"].shape == (4 * 384, 384)
    p = gru_init(key, 16, 8, num_layers=1, bidirectional=True)
    assert len(p[0]) == 2
    assert p[0][1]["w_ih"].shape == (3 * 8, 16)


def test_sequence_model_matches_reference_composition():
    """SequenceModel == torch LSTM + Linear + activation with same weights."""
    torch.manual_seed(4)
    B, F_in, T, H, out = 2, 257, 30, 64, 2
    trnn = torch.nn.LSTM(F_in, H, 2, batch_first=True)
    tfc = torch.nn.Linear(H, out)
    x = torch.randn(B, F_in, T)
    with torch.no_grad():
        o, _ = trnn(x.permute(0, 2, 1))
        ref = torch.relu(tfc(o)).permute(0, 2, 1)

    sm = SequenceModel(F_in, out, H, 2, False, "LSTM", "ReLU")
    params = {
        "rnn": _copy_torch_rnn_weights(trnn, 2, False),
        "fc": {
            "weight": jnp.asarray(tfc.weight.detach().numpy()),
            "bias": jnp.asarray(tfc.bias.detach().numpy()),
        },
    }
    ours = sm(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-5, rtol=1e-4)


def test_sequence_model_init_and_activations():
    key = jax.random.PRNGKey(0)
    for act in ("Tanh", "ReLU", "ReLU6", "LeakyReLU", "PReLU", None, False):
        sm = SequenceModel(16, 4, 8, 1, False, "GRU", act)
        params = sm.init(key)
        out = sm(params, jnp.ones((2, 16, 5)))
        assert out.shape == (2, 4, 5)


def test_streaming_step_matches_batch_forward():
    """Frame-by-frame step() must reproduce the full-sequence forward."""
    key = jax.random.PRNGKey(1)
    B, F_in, T = 3, 12, 17
    for cell in ("LSTM", "GRU"):
        sm = SequenceModel(F_in, 2, 10, 2, False, cell, "Tanh")
        params = sm.init(key)
        x = jax.random.normal(jax.random.PRNGKey(2), (B, F_in, T))
        full = sm(params, x)

        state = sm.init_state(params, B)
        outs = []
        for t in range(T):
            state, y = sm.step(params, state, x[:, :, t])
            outs.append(y)
        stream = jnp.stack(outs, axis=-1)  # [B, out, T]
        np.testing.assert_allclose(
            np.asarray(stream), np.asarray(full), atol=1e-5, rtol=1e-4
        )


def test_rnn_init_state_shapes():
    p = lstm_init(jax.random.PRNGKey(0), 8, 16, 2)
    st = rnn_init_state(p, 5, "LSTM")
    assert len(st) == 2 and st[0][0].shape == (5, 16)
    p = gru_init(jax.random.PRNGKey(0), 8, 16, 1)
    st = rnn_init_state(p, 4, "GRU")
    assert st[0].shape == (4, 16)
