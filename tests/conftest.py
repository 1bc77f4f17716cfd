"""Test configuration: hermetic CPU JAX with 8 virtual devices.

Must run before jax is imported anywhere (pytest imports conftest first).
Multi-chip sharding logic is exercised on the virtual CPU mesh; the real
TPU is only used by bench.py / __graft_entry__.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize force-registers the TPU platform and overrides
# JAX_PLATFORMS; jax.config after import wins over both.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def world():
    from vln_hamt_tpu.data.fixtures import make_synthetic_world

    return make_synthetic_world(num_scans=2, nodes_per_scan=20, num_items=24, seed=0)


@pytest.fixture(scope="session")
def tiny_world():
    """Smaller feature dim for fast model tests."""
    from vln_hamt_tpu.data.fixtures import make_synthetic_world

    return make_synthetic_world(
        num_scans=1, nodes_per_scan=12, num_items=8, feat_dim=32, seed=1
    )
