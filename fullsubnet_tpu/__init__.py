"""fullsubnet_tpu — a TPU-native speech-enhancement framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Audio-WestlakeU/FullSubNet (single-channel real-time speech enhancement via
complex Ideal Ratio Masks on STFT frames), built TPU-first:

- ``fullsubnet_tpu.acoustics`` — jit-able DSP ops (STFT/iSTFT, cIRM masks,
  streaming normalizations, filterbanks).
- ``fullsubnet_tpu.nn``        — sequence blocks (scan-based LSTM/GRU with
  MXU-friendly batched gate matmuls), causal convs, feature norms.
- ``fullsubnet_tpu.models``    — the FullSubNet model family as functional
  param-pytree models.
- ``fullsubnet_tpu.parallel``  — mesh construction + sharding rules (pjit DP,
  sub-band parallelism).
- ``fullsubnet_tpu.train`` / ``fullsubnet_tpu.infer`` — training and
  inference runtimes.
- ``fullsubnet_tpu.data``      — host-side DNS-2020 on-the-fly mixture
  synthesis pipeline.
"""

__version__ = "0.1.0"
