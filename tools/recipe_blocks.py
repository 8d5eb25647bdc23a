"""Single source for the per-family ``[model]`` recipe blocks the
certification tools share (train_quality, train_soak, onchip_verify).

Each block mirrors the SHIPPED recipe TOML for that family
(recipes/dns_interspeech_2020/*/train*.toml) — exactly the ctor kwargs
tools/parity_gate.py's builders construct with. ``{norm_type}`` is a
format slot so a tool can run a family under a different config-reachable
norm (e.g. train_quality's fullsubnet_cum run).

A hyperparameter fix applied here reaches every tool; before this module
the same 18-line improved block lived verbatim in three tools and could
silently desynchronize.
"""

from __future__ import annotations

import tomllib

FLAGSHIP_MODEL = """
[model]
path = "fullsubnet.model.Model"
[model.args]
sb_num_neighbors = 15
fb_num_neighbors = 0
num_freqs = 257
look_ahead = 2
sequence_model = "LSTM"
fb_output_activate_function = "ReLU"
sb_output_activate_function = false
fb_model_hidden_size = 512
sb_model_hidden_size = 384
weight_init = false
norm_type = "{norm_type}"
num_groups_in_drop_band = 2
"""

FULLBAND_MODEL = """
[model]
path = "fullband_baseline.model.Model"
[model.args]
num_freqs = 257
look_ahead = 2
sequence_model = "LSTM"
output_activate_function = false
hidden_size = 512
weight_init = false
norm_type = "{norm_type}"
"""

FAST_MODEL = """
[model]
path = "fast_fullsubnet.model.Model"
[model.args]
look_ahead = 2
shrink_size = 2
sequence_model = "LSTM"
encoder_input_size = 257
num_mels = 64
bottleneck_hidden_size = 384
bottleneck_num_layers = 2
noisy_input_num_neighbors = 5
encoder_output_num_neighbors = 0
norm_type = "{norm_type}"
"""

IMPROVED_MODEL = """
[model]
path = "improved_fullsubnet.model.Model"
[model.args]
n_fft = 512
hop_length = 128
win_length = 512
fdrc = 0.5
num_freqs = 257
freq_cutoffs = [20, 80]
sb_num_center_freqs = [1, 4, 8]
sb_num_neighbor_freqs = [15, 15, 15]
fb_num_center_freqs = [1, 4, 8]
fb_num_neighbor_freqs = [15, 15, 15]
fb_hidden_size = 512
sb_hidden_size = 384
sequence_model = "LSTM"
fb_output_activate_function = false
sb_output_activate_function = false
norm_type = "{norm_type}"
"""

MODEL_BLOCKS = {
    "fullsubnet": FLAGSHIP_MODEL,
    "fullband_baseline": FULLBAND_MODEL,
    "fast_fullsubnet": FAST_MODEL,
    "improved_fullsubnet": IMPROVED_MODEL,
}


def model_block(family: str, norm_type: str = "offline_laplace_norm") -> str:
    return MODEL_BLOCKS[family].format(norm_type=norm_type)


def model_args(family: str, norm_type: str = "offline_laplace_norm") -> dict:
    """The block's ``[model.args]`` as ctor kwargs (dict consumers)."""
    return tomllib.loads(model_block(family, norm_type))["model"]["args"]
