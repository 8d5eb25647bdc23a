"""Numeric constants shared across the framework.

Mirrors the semantics of the reference constants
(``audio_zen/constant.py:6-10``) so numerical parity tests line up.
"""

import numpy as np

NEG_INF = float(np.finfo(np.float32).min)
PI = float(np.pi)
SOUND_SPEED = 343  # m/s
EPSILON = float(np.finfo(np.float32).eps)
MAX_INT16 = int(np.iinfo(np.int16).max)
