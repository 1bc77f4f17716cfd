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
# Persistent compilation cache: CPU jit compiles of the episode scans
# cost 1-4 min EACH; re-runs of an unchanged program (cache keys hash
# the HLO) hit the disk cache instead. Shared with the mp workers.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np
import pytest

# ---------------------------------------------------------------------
# Test tiers (VERDICT r4 #7). Whole-module assignment; explicit
# @pytest.mark.fast / .core on individual tests elsewhere also works.
#   fast: < 1 min total — pure-python / numpy / tiny-jit tests
#   core: < ~15 min — adds model forwards + torch-parity suites
#   full: everything (the mp / agent / CLI monsters), no -m filter
_FAST_MODULES = {
    "test_env.py", "test_data.py", "test_metrics.py", "test_native.py",
    "test_optim.py", "test_xprof.py", "test_image_transform.py",
}
_HEAVY_MODULES = {  # excluded from core: multi-minute jit/mp/CLI suites
    "test_agent.py", "test_variant_agents.py", "test_image_pretrain.py",
    "test_parallel.py", "test_multiprocess.py", "test_cli.py",
    "test_ops_vision.py", "test_pretrain.py", "test_packed_il.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        if fname in _FAST_MODULES:
            item.add_marker(pytest.mark.fast)
        if fname not in _HEAVY_MODULES:
            item.add_marker(pytest.mark.core)


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
