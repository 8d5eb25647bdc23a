"""FullSubNet — the flagship full-band + sub-band fusion model.

Functional twin of the reference
(``recipes/dns_interspeech_2020/fullsubnet/model.py:9-136``), designed
TPU-first:

* The full-band stage is a stacked LSTM over the F-dim magnitude (one
  [B·T, F]x[F, 4H] MXU matmul per layer outside the scan).
* The sub-band stage runs ONE shared LSTM **batched over all frequencies**:
  the reference's reshape ``[B, F, 32, T] -> [B·F, 32, T]`` becomes the
  leading batch axis of the scan, so every step is a
  [B·F, 32+H] x [·, 4H]-shaped GEMM — large, static, MXU-friendly.
* ``freq_unfold`` is a static gather; ``drop_band`` (training-time
  frequency subsampling, groups=2) is static indexing — both jit-safe.
* Look-ahead pad of 2 frames = the reference's 32 ms algorithmic latency.

~5.6 M params with the paper hyperparameters (F=257, h_fb=512, h_sb=384,
sb neighbors=15, fb neighbors=0).
"""

import jax
import jax.numpy as jnp

from fullsubnet_tpu.acoustics.feature import drop_band, freq_unfold
from fullsubnet_tpu.acoustics.norm import norm_wrapper
from fullsubnet_tpu.nn.sequence_model import SequenceModel


class FullSubNet:
    def __init__(
        self,
        num_freqs: int = 257,
        look_ahead: int = 2,
        sequence_model: str = "LSTM",
        fb_num_neighbors: int = 0,
        sb_num_neighbors: int = 15,
        fb_output_activate_function: str | None = "ReLU",
        sb_output_activate_function: str | None = None,
        fb_model_hidden_size: int = 512,
        sb_model_hidden_size: int = 384,
        norm_type: str = "offline_laplace_norm",
        num_groups_in_drop_band: int = 2,
    ):
        assert sequence_model in ("GRU", "LSTM"), (
            "FullSubNet only supports GRU and LSTM."
        )
        self.num_freqs = num_freqs
        self.look_ahead = look_ahead
        self.fb_num_neighbors = fb_num_neighbors
        self.sb_num_neighbors = sb_num_neighbors
        self.num_groups_in_drop_band = num_groups_in_drop_band
        self.norm = norm_wrapper(norm_type)

        self.fb_model = SequenceModel(
            input_size=num_freqs,
            output_size=num_freqs,
            hidden_size=fb_model_hidden_size,
            num_layers=2,
            bidirectional=False,
            sequence_model=sequence_model,
            output_activate_function=fb_output_activate_function,
        )
        self.sb_model = SequenceModel(
            input_size=(sb_num_neighbors * 2 + 1) + (fb_num_neighbors * 2 + 1),
            output_size=2,
            hidden_size=sb_model_hidden_size,
            num_layers=2,
            bidirectional=False,
            sequence_model=sequence_model,
            output_activate_function=sb_output_activate_function,
        )

    def init(self, key, dtype=jnp.float32, weight_init=True) -> dict:
        kf, ks = jax.random.split(key)
        return {
            "fb_model": self.fb_model.init(kf, dtype, orthogonal_init=weight_init),
            "sb_model": self.sb_model.init(ks, dtype, orthogonal_init=weight_init),
        }

    def __call__(
        self, params: dict, noisy_mag: jax.Array, dropping_band: bool = True
    ) -> jax.Array:
        """noisy_mag [B, 1, F, T] -> cRM [B, 2, F', T].

        F' = F unless drop_band applies (training batches with B > 1 and
        ``dropping_band``), in which case F' = F // num_groups — matching
        the reference's train-time behavior (``fullsubnet/model.py:114-119``).
        """
        assert noisy_mag.ndim == 4
        x = jnp.pad(noisy_mag, ((0, 0), (0, 0), (0, 0), (0, self.look_ahead)))
        batch_size, num_channels, num_freqs, num_frames = x.shape
        assert num_channels == 1, "FullSubNet takes the mag feature as input."

        # Full-band stage
        fb_input = self.norm(x).reshape(batch_size, num_freqs, num_frames)
        fb_output = self.fb_model(params["fb_model"], fb_input)
        fb_output = fb_output.reshape(batch_size, 1, num_freqs, num_frames)

        # Unfold: [B, F, fb_unit, T] and [B, F, sb_unit, T]
        fb_unfolded = freq_unfold(fb_output, self.fb_num_neighbors)
        fb_unfolded = fb_unfolded.reshape(
            batch_size, num_freqs, self.fb_num_neighbors * 2 + 1, num_frames
        )
        noisy_unfolded = freq_unfold(x, self.sb_num_neighbors)
        noisy_unfolded = noisy_unfolded.reshape(
            batch_size, num_freqs, self.sb_num_neighbors * 2 + 1, num_frames
        )

        sb_input = jnp.concatenate([noisy_unfolded, fb_unfolded], axis=2)
        sb_input = self.norm(sb_input)

        if batch_size > 1 and dropping_band and self.num_groups_in_drop_band > 1:
            sb_input = drop_band(
                jnp.transpose(sb_input, (0, 2, 1, 3)),
                num_groups=self.num_groups_in_drop_band,
            )
            num_freqs = sb_input.shape[2]
            sb_input = jnp.transpose(sb_input, (0, 2, 1, 3))

        sb_unit = (self.sb_num_neighbors * 2 + 1) + (self.fb_num_neighbors * 2 + 1)
        sb_input = sb_input.reshape(batch_size * num_freqs, sb_unit, num_frames)

        # One shared sub-band LSTM batched over all frequencies.
        sb_mask = self.sb_model(params["sb_model"], sb_input)  # [B*F, 2, T]
        sb_mask = sb_mask.reshape(batch_size, num_freqs, 2, num_frames)
        sb_mask = jnp.transpose(sb_mask, (0, 2, 1, 3))  # [B, 2, F, T]

        return sb_mask[:, :, :, self.look_ahead :]
