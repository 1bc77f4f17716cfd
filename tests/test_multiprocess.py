"""Multi-PROCESS (multi-host) execution: 2-process jax.distributed CPU
cluster vs a single-process oracle on the same 4-device mesh.

The in-process tests (test_parallel.py, dryrun_multichip) validate the
sharded programs on one process with 8 virtual devices; this file
validates the part they cannot: the cross-process runtime — Gloo
collectives standing in for ICI/DCN, ``jax.distributed.initialize``
rendezvous (the reference's file:// NCCL rendezvous,
``finetune_src/utils/distributed.py:56-61``), cross-process gradient
all-reduce inside the jitted update, and the host-object collective
wrappers (``host_allgather``/``reduce_dict_mean`` replacing the pickled
ByteTensor all_gather, distributed.py:90-130).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run(nprocs: int, devices_per_proc: int, tmp_path,
         scenario: str = "r2r") -> dict:
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_proc}")
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu via jax.config
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = str(tmp_path / f"mp_{scenario}_{nprocs}.json")
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(port), str(i), str(nprocs), out,
             scenario],
            env=env, cwd=_REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(nprocs)
    ]
    logs = []
    for p in procs:
        # three jitted update programs + eval compile per worker; a
        # loaded CI box can push a single worker past 30 min
        stdout, _ = p.communicate(timeout=3600)
        logs.append(stdout.decode(errors="replace"))
        assert p.returncode == 0, "\n".join(logs)
    with open(out) as f:
        return json.load(f)


@pytest.mark.slow
def test_two_process_training_matches_single(tmp_path):
    dist = _run(nprocs=2, devices_per_proc=2, tmp_path=tmp_path)
    assert dist["process_count"] == 2
    # host-object collectives saw both processes
    assert dist["gathered"] == [0, 1]
    assert dist["reduced"] == pytest.approx(0.5)
    # cross-process-TP checkpoint: gather-before-pickle + mesh re-place
    assert dist["ckpt_roundtrip"] is True

    oracle = _run(nprocs=1, devices_per_proc=4, tmp_path=tmp_path)
    assert oracle["process_count"] == 1

    # same mesh shape, same global batches: the distributed run is the
    # same program with shards owned by different processes — losses
    # (teacher ×2, fused sample ×2, MERGED sample ×2) and greedy
    # trajectories must match
    np.testing.assert_allclose(dist["losses"], oracle["losses"],
                               rtol=2e-5, atol=1e-6)
    assert dist["traj"] == oracle["traj"]


@pytest.mark.slow
def test_two_process_reverie_matches_single(tmp_path):
    """The object-grounded path under jax.process_count() > 1: dual-CE
    merged updates and eval predObjIds must match the single-process
    oracle (round-2 verdict #9)."""
    dist = _run(nprocs=2, devices_per_proc=2, tmp_path=tmp_path,
                scenario="reverie")
    assert dist["process_count"] == 2
    oracle = _run(nprocs=1, devices_per_proc=4, tmp_path=tmp_path,
                  scenario="reverie")
    np.testing.assert_allclose(dist["losses"], oracle["losses"],
                               rtol=2e-5, atol=1e-6)
    assert dist["traj"] == oracle["traj"]
    assert dist["obj_preds"] == oracle["obj_preds"]


@pytest.mark.slow
def test_two_process_sharded_feed_matches_single(tmp_path):
    """Per-host SHARDED feeding (each process's env holds only its own
    global-batch rows; make_array_from_process_local_data stitches the
    global arrays): teacher + merged-sample losses and device-eval
    trajectories must reproduce the single-process full-batch oracle
    exactly — host env work scales with processes without changing the
    math (the reference's per-rank DDP feeding, cvdn/main.py:42-49)."""
    dist = _run(nprocs=2, devices_per_proc=2, tmp_path=tmp_path,
                scenario="sharded")
    assert dist["process_count"] == 2
    oracle = _run(nprocs=1, devices_per_proc=4, tmp_path=tmp_path,
                  scenario="sharded")
    np.testing.assert_allclose(dist["losses"], oracle["losses"],
                               rtol=2e-5, atol=1e-6)
    assert dist["traj"] == oracle["traj"]


@pytest.mark.slow
def test_two_process_sharded_uneven_eval(tmp_path):
    """UNEQUAL per-host eval shards (5 vs 3 items) under sharded
    feeding: processes wrap after DIFFERENT device-eval batch counts,
    so eval_split_device must keep EVERY process in the global
    collective loop until all shards have wrapped (round-3 ADVICE #1 —
    the last rank holds the len%n_proc remainder under --sharded_feed,
    env/r2r_env.py:75-80). Without the all-process loop guard this
    test DEADLOCKS (the worker timeout fails it); predictions must
    still match the single-process full-split oracle exactly."""
    dist = _run(nprocs=2, devices_per_proc=2, tmp_path=tmp_path,
                scenario="sharded_uneven")
    assert dist["process_count"] == 2
    oracle = _run(nprocs=1, devices_per_proc=4, tmp_path=tmp_path,
                  scenario="sharded_uneven")
    np.testing.assert_allclose(dist["losses"], oracle["losses"],
                               rtol=2e-5, atol=1e-6)
    assert dist["traj"] == oracle["traj"]


@pytest.mark.slow
def test_two_process_sharded_reverie_matches_single(tmp_path):
    """Sharded feeding on the object-grounded task: per-host REVERIE
    env shards (object tables, dual-CE merged updates) and per-host
    device eval with predObjId decode must reproduce the full-batch
    single-process oracle exactly."""
    dist = _run(nprocs=2, devices_per_proc=2, tmp_path=tmp_path,
                scenario="sharded_reverie")
    assert dist["process_count"] == 2
    oracle = _run(nprocs=1, devices_per_proc=4, tmp_path=tmp_path,
                  scenario="sharded_reverie")
    np.testing.assert_allclose(dist["losses"], oracle["losses"],
                               rtol=2e-5, atol=1e-6)
    assert dist["traj"] == oracle["traj"]
    assert dist["obj_preds"] == oracle["obj_preds"]


@pytest.mark.slow
def test_two_process_pretrain_sharded_matches_single(tmp_path):
    """Pretrain sharded feeding (PretrainTrainer host_sharded=True):
    per-rank batchers assemble batch/n rows each; losses and the
    full-split validation must match a single-process oracle that
    concatenates the same per-rank draws (the reference's per-rank DDP
    loaders, main_r2r.py:40-92)."""
    dist = _run_worker("pretrain_mp_worker.py", nprocs=2,
                       devices_per_proc=2, tmp_path=tmp_path)
    assert dist["process_count"] == 2
    oracle = _run_worker("pretrain_mp_worker.py", nprocs=1,
                         devices_per_proc=4, tmp_path=tmp_path)
    assert [t for t, _ in dist["losses"]] == [t for t, _ in oracle["losses"]]
    np.testing.assert_allclose([l for _, l in dist["losses"]],
                               [l for _, l in oracle["losses"]],
                               rtol=2e-5, atol=1e-6)
    for task in oracle["val"]:
        for k in oracle["val"][task]:
            np.testing.assert_allclose(dist["val"][task][k],
                                       oracle["val"][task][k],
                                       rtol=2e-5, atol=1e-6,
                                       err_msg=(task, k))


def _run_worker(worker: str, nprocs: int, devices_per_proc: int,
                tmp_path) -> dict:
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_proc}")
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = str(tmp_path / f"{worker}_{nprocs}.json")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_REPO, "tests", worker),
             str(port), str(i), str(nprocs), out],
            env=env, cwd=_REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(nprocs)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=3600)
        logs.append(stdout.decode(errors="replace"))
        assert p.returncode == 0, "\n".join(logs)
    with open(out) as f:
        return json.load(f)


def _run_finetune_cli(nprocs: int, devices_per_proc: int, tmp_path) -> dict:
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_proc}")
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = str(tmp_path / f"ft_{nprocs}.json")
    worker = os.path.join(_REPO, "tests", "finetune_mp_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(i), str(nprocs), out,
             str(tmp_path / f"ft_run_{nprocs}_{i}")],
            env=env, cwd=_REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(nprocs)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=3600)
        logs.append(stdout.decode(errors="replace"))
        assert p.returncode == 0, "\n".join(logs)
    with open(out) as f:
        return json.load(f)


@pytest.mark.slow
def test_two_process_finetune_cli_matches_single(tmp_path):
    """The ACTUAL production entry point (run/finetune.py main) across
    2 processes: identical-seed env replicas, --data_shards mesh, merged
    'sample' updates, device greedy eval + metrics — all must reproduce
    the single-process oracle (round-2 verdict #3; the reference's
    per-rank DDP feeding, cvdn/main.py:42-49)."""
    dist = _run_finetune_cli(nprocs=2, devices_per_proc=1,
                             tmp_path=tmp_path)
    assert dist["process_count"] == 2
    oracle = _run_finetune_cli(nprocs=1, devices_per_proc=2,
                               tmp_path=tmp_path)
    np.testing.assert_allclose(dist["losses"], oracle["losses"],
                               rtol=2e-5, atol=1e-6)
    assert dist["best"]["iter"] == oracle["best"]["iter"]
    np.testing.assert_allclose(dist["best"]["score"], oracle["best"]["score"],
                               rtol=1e-6)
