"""Small shared utilities (finetune_src/utils/misc.py parity)."""

from __future__ import annotations

import random

import numpy as np


def set_seed(seed: int) -> None:
    """Host-side seeding (utils/misc.py:5-10). Device randomness is
    controlled by explicit jax PRNG keys, not global seeds."""
    random.seed(seed)
    np.random.seed(seed)


def apply_rng_impl(impl: str) -> None:
    """Set jax's default PRNG implementation (cfg.train.rng_impl).

    "threefry2x32" is jax's default: mask bits are a pure function of
    the key, identical across separately-compiled programs, shardings
    and process counts — the property the replay-parity invariant
    (agents/rollout.py fold_in keys) and the 2-process==1-process
    bit-parity tests are built on. "rbg" generates the bits with the
    TPU's hardware RngBitGenerator instead: the dropout DISTRIBUTION is
    unchanged but the bit-stream differs and is not stable across
    shardings/backends/XLA versions. On v5e, threefry mask generation
    costs ~1/3 of the HAMT train step (BASELINE.md: zero-dropout
    diagnosis); rbg buys +40% IL / +30% 'sample' episodes/s.

    Must be called before any PRNG key is created (raw keys are shaped
    by the impl: (2,) threefry vs (4,) rbg).
    """
    if impl in ("threefry2x32", "threefry"):
        return  # jax default; don't touch global config
    if impl not in ("rbg", "unsafe_rbg"):
        raise ValueError(f"unknown rng_impl {impl!r}")
    import jax

    jax.config.update("jax_default_prng_impl", impl)


def length_mask(lengths, size: int) -> np.ndarray:
    """(B,) lengths -> (B, size) bool validity mask (utils/misc.py:12-17,
    inverted: True = valid)."""
    lengths = np.asarray(lengths)
    return np.arange(size)[None, :] < lengths[:, None]
