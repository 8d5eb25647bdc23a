from fullsubnet_tpu.nn.rnn import (
    lstm_init,
    gru_init,
    lstm_forward,
    gru_forward,
    rnn_forward,
    lstm_step,
    gru_step,
    rnn_init_state,
)
from fullsubnet_tpu.nn.sequence_model import SequenceModel
from fullsubnet_tpu.nn.init import (
    orthogonal,
    xavier_normal,
    normal,
    rnn_weight_init,
    linear_init,
)
