"""Full-band cIRM baseline: 3-layer unidirectional LSTM over the magnitude
spectrum, emitting a 2F cRM.

Functional twin of the reference recipe model
(``recipes/dns_interspeech_2020/fullband_baseline/model.py:8-68``):
look-ahead pad -> feature norm -> stacked LSTM -> Linear 2F -> slice off
look-ahead. ~6.0 M params at F=257, h=512.
"""

import jax
import jax.numpy as jnp

from fullsubnet_tpu.acoustics.norm import norm_wrapper
from fullsubnet_tpu.nn.sequence_model import SequenceModel


class FullBandModel:
    def __init__(
        self,
        num_freqs: int,
        hidden_size: int,
        sequence_model: str = "LSTM",
        output_activate_function=None,
        look_ahead: int = 2,
        norm_type: str = "offline_laplace_norm",
        num_layers: int = 3,
    ):
        self.num_freqs = num_freqs
        self.look_ahead = look_ahead
        self.norm = norm_wrapper(norm_type)
        self.fullband_model = SequenceModel(
            input_size=num_freqs,
            output_size=num_freqs * 2,
            hidden_size=hidden_size,
            num_layers=num_layers,
            bidirectional=False,
            sequence_model=sequence_model,
            output_activate_function=output_activate_function,
        )

    def init(self, key, dtype=jnp.float32, weight_init=True) -> dict:
        return {
            "fullband_model": self.fullband_model.init(
                key, dtype, orthogonal_init=weight_init
            )
        }

    def __call__(
        self,
        params: dict,
        noisy_mag: jax.Array,
        training: bool = False,
        valid_frames: jax.Array | None = None,
    ) -> jax.Array:
        """noisy_mag [B, 1, F, T] -> cRM [B, 2, F, T].

        ``valid_frames``: optional (traced) count of real frames in a
        length-bucketed (zero-padded) input — a scalar or a [B] vector.
        The offline norm statistics use the TRUE frame count, so valid
        frames' outputs EXACTLY equal an unpadded run (causal norms are
        exact under zero-padded tails as-is); the caller zeroes padded
        input frames and discards outputs past ``valid_frames``. Same
        contract as ``FullSubNet.__call__`` — requires a unidirectional
        stack (``infer.inferencer.bucketed_capable``).
        """
        assert noisy_mag.ndim == 4
        x = jnp.pad(noisy_mag, ((0, 0), (0, 0), (0, 0), (0, self.look_ahead)))
        b, c, f, t = x.shape
        assert c == 1, "FullBandModel takes the mag feature as input."

        norm = self.norm
        if valid_frames is not None:
            from fullsubnet_tpu.acoustics.norm import masked_offline_norm

            vf = jnp.asarray(valid_frames).reshape(-1)
            # the model's own look-ahead zero-pad counts toward the
            # offline statistics, exactly as in an unpadded run
            valid_total = (vf + self.look_ahead).astype(jnp.float32)[
                :, None, None, None
            ]
            norm = masked_offline_norm(self.norm, valid_total) or self.norm

        x = norm(x).reshape(b, c * f, t)
        out = self.fullband_model(params["fullband_model"], x, training=training)
        out = out.reshape(b, 2, f, t)
        return out[:, :, :, self.look_ahead :]
