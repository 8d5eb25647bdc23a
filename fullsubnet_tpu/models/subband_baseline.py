"""Sub-band baseline: one shared LSTM over per-frequency neighborhood units.

The paper's third baseline (1.3 M params, SURVEY §6 table) — each
frequency is enhanced independently from its (2N+1)-bin unit with NO
full-band stream. The reference repo publishes its numbers but ships no
recipe; the ``sub_band_crm_mask`` inference strategy
(``recipes/.../inferencer.py:88-128``) is its serving path: the model
consumes [F, F_s, T] units directly and emits [F, 2, T].

Completes the paper's model family (full-band, sub-band, FullSubNet,
Fast/Improved). Same TPU design as FullSubNet's sub-band stage:
frequencies ride the scan's batch axis.
"""

import jax
import jax.numpy as jnp

from fullsubnet_tpu.acoustics.feature import drop_band, freq_unfold
from fullsubnet_tpu.acoustics.norm import norm_wrapper
from fullsubnet_tpu.nn.sequence_model import SequenceModel


class SubBandBaseline:
    def __init__(
        self,
        num_neighbors: int = 15,
        look_ahead: int = 2,
        sequence_model: str = "LSTM",
        hidden_size: int = 384,
        num_layers: int = 2,
        output_activate_function=None,
        norm_type: str = "offline_laplace_norm",
        num_groups_in_drop_band: int = 2,
    ):
        self.num_neighbors = num_neighbors
        self.look_ahead = look_ahead
        self.num_groups_in_drop_band = num_groups_in_drop_band
        self.norm = norm_wrapper(norm_type)
        self.sb_model = SequenceModel(
            input_size=num_neighbors * 2 + 1,
            output_size=2,
            hidden_size=hidden_size,
            num_layers=num_layers,
            bidirectional=False,
            sequence_model=sequence_model,
            output_activate_function=output_activate_function,
        )

    def init(self, key, dtype=jnp.float32, weight_init=True) -> dict:
        return {"sb_model": self.sb_model.init(key, dtype, orthogonal_init=weight_init)}

    def __call__(
        self, params: dict, x: jax.Array, dropping_band: bool = True,
        training: bool = False,
    ) -> jax.Array:
        """Two input forms:

        * [B, 1, F, T] noisy magnitude -> cRM [B, 2, F', T] (training /
          full_band_crm_mask serving; unfolds internally).
        * [F, F_s, T] pre-unfolded units -> [F, 2, T] (the
          ``sub_band_crm_mask`` strategy's contract).
        """
        if x.ndim == 3:  # pre-unfolded units [F, F_s, T], single utterance
            units = self.norm(x[None])[0]  # same stats as training (B=1)
            return self.sb_model(params["sb_model"], units, training=training)  # [F, 2, T]

        assert x.ndim == 4 and x.shape[1] == 1
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, self.look_ahead)))
        b, _, f, t = x.shape
        units = freq_unfold(x, self.num_neighbors)  # [B, F, 1, 2N+1, T]
        units = units.reshape(b, f, 2 * self.num_neighbors + 1, t)
        units = self.norm(units)

        # batch > groups: drop_band's asserted domain (tiny batches
        # simply skip dropping — see docs/parity.md)
        if (
            b > self.num_groups_in_drop_band
            and dropping_band
            and self.num_groups_in_drop_band > 1
        ):
            units = drop_band(
                jnp.transpose(units, (0, 2, 1, 3)), self.num_groups_in_drop_band
            )
            f = units.shape[2]
            units = jnp.transpose(units, (0, 2, 1, 3))

        flat = units.reshape(b * f, 2 * self.num_neighbors + 1, t)
        mask = self.sb_model(params["sb_model"], flat, training=training)  # [B·F, 2, T]
        mask = jnp.transpose(mask.reshape(b, f, 2, t), (0, 2, 1, 3))
        return mask[:, :, :, self.look_ahead :]
