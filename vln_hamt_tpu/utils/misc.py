"""Small shared utilities (finetune_src/utils/misc.py parity)."""

from __future__ import annotations

import random

import numpy as np


def set_seed(seed: int) -> None:
    """Host-side seeding (utils/misc.py:5-10). Device randomness is
    controlled by explicit jax PRNG keys, not global seeds."""
    random.seed(seed)
    np.random.seed(seed)


def length_mask(lengths, size: int) -> np.ndarray:
    """(B,) lengths -> (B, size) bool validity mask (utils/misc.py:12-17,
    inverted: True = valid)."""
    lengths = np.asarray(lengths)
    return np.arange(size)[None, :] < lengths[:, None]
