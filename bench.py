"""Benchmark: IL training throughput of the full-size R2R HAMT on TPU.

North-star proxy (BASELINE.md): episodes/sec/chip through the training
step. The reference trains R2R at batch 8 on one CUDA GPU
(``finetune_src/scripts/run_r2r.sh``) with per-step Python/GPU
interleaving; here a whole teacher-forced episode batch is ONE jitted
scan (forward + backward + optimizer update).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` compares against ESTIMATED_REFERENCE_EPS — an estimate
of the reference pipeline's IL episodes/sec on a single V100 (batch 8,
~0.4 s/iteration judged from its per-step forward count at this model
size; the repo publishes no measured number, see BASELINE.md). Replace
with a measured value when available.
"""

from __future__ import annotations

import json
import os
import time

ESTIMATED_REFERENCE_EPS = 20.0  # episodes/sec, 1x V100, IL batch 8 (estimate)
# the reference's 'sample' iteration runs TWO transformer sweeps per
# episode (teacher-forced ML pass + sampled rollout, r2r/agent_cmt.py
# rollout + ml loss) — same 2x-FLOPs argument as our merged update, so
# the per-episode estimate is half the IL figure
ESTIMATED_REFERENCE_SAMPLE_EPS = 10.0

BATCH_SIZE = int(os.environ.get("BENCH_BS", 64))
WARMUP_STEPS = 2
MEASURE_STEPS = int(os.environ.get("BENCH_STEPS", 8))
# the reference's actual training default is feedback='sample'
# (scripts/run_r2r.sh): IL pass + device RL rollout + replay update per
# iteration. Measured alongside the IL number; BENCH_SAMPLE=0 skips it.
SAMPLE_STEPS = int(os.environ.get("BENCH_SAMPLE_STEPS", 4))
MEASURE_SAMPLE = os.environ.get("BENCH_SAMPLE", "1") == "1"


def main() -> None:
    import jax
    import numpy as np

    # persistent compile cache: the full-size train step costs ~10 min
    # to compile through the remote TPU tunnel; cache it across runs
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from vln_hamt_tpu.agents.agent import HAMTAgent
    from vln_hamt_tpu.configs import get_preset
    from vln_hamt_tpu.data.fixtures import make_synthetic_world
    from vln_hamt_tpu.env import ObsSpec, R2RNavEnv

    # bf16 compute + per-step remat: the fp32 no-remat scan stores
    # O(T * B * L * 4D) activations and OOMs a single 16GB chip.
    # BENCH_REMAT=0 trades memory for a faster compile (ok at bs<=32 in
    # bf16 on 16GB).
    remat = os.environ.get("BENCH_REMAT", "1") == "1"
    # BENCH_PALLAS_ATTN=1 routes attention through the fused pallas
    # kernel (ops/attention.py), incl. in-kernel dropout for training.
    pallas_attn = os.environ.get("BENCH_PALLAS_ATTN", "0") == "1"
    cfg = get_preset("r2r").replace(
        train={"batch_size": BATCH_SIZE},
        model={"dtype": "bfloat16", "remat": remat,
               "use_pallas_attention": pallas_attn},
    )

    world = make_synthetic_world(
        num_scans=2, nodes_per_scan=36, num_items=2 * BATCH_SIZE,
        feat_dim=cfg.model.image_feat_size, seed=0,
    )
    max_deg = max(g.max_degree for g in world.graphs.values())
    cfg = cfg.replace(env={"max_candidates": max_deg})
    spec = ObsSpec(max_candidates=max_deg,
                   image_feat_size=cfg.env.image_feat_size)
    env = R2RNavEnv(
        world.graphs, world.feat_db, world.instr_data, spec,
        batch_size=BATCH_SIZE, max_instr_len=cfg.env.max_instr_len,
        max_action_len=cfg.env.max_action_len, seed=0,
        reuse_episode_buffers=True,
    )
    agent = HAMTAgent(cfg, env, seed=0)
    # BENCH_FEAT_TABLE=0 reverts to shipping (B,T,V,D) features per
    # iteration instead of device-resident table + (B,T) index gather
    if os.environ.get("BENCH_FEAT_TABLE", "1") == "1":
        agent.enable_feature_table()
    # BENCH_MERGED=0 falls back to the fused two-scan 'sample' update
    # (IL scan + rollout scan) instead of the merged single 2B-lane scan
    agent.merged_sample_update = os.environ.get("BENCH_MERGED", "1") == "1"

    for _ in range(WARMUP_STEPS):
        agent.train_iteration("teacher")

    t0 = time.perf_counter()
    out = None
    for _ in range(MEASURE_STEPS):
        # async: the device works on step k while the host assembles k+1
        out = agent.train_iteration("teacher", sync=False)
    final_loss = float(out["loss"])  # sync once at the end
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss)

    steps_per_sec = MEASURE_STEPS / dt
    eps_per_sec = steps_per_sec * BATCH_SIZE

    record = {
        "metric": "r2r_il_train_episodes_per_sec_per_chip",
        "value": round(eps_per_sec, 2),
        "unit": "episodes/s",
        "vs_baseline": round(eps_per_sec / ESTIMATED_REFERENCE_EPS, 3),
    }

    if MEASURE_SAMPLE and agent._nav_tables is not None:
        out = agent.train_iteration("sample", sync=False)  # warmup/compile
        float(out["loss"])
        t0 = time.perf_counter()
        for _ in range(SAMPLE_STEPS):
            out = agent.train_iteration("sample", sync=False)
        sample_loss = float(out["loss"])
        dt = time.perf_counter() - t0
        assert np.isfinite(sample_loss)
        sample_eps = SAMPLE_STEPS / dt * BATCH_SIZE
        record["sample_eps_per_sec"] = round(sample_eps, 2)
        record["sample_vs_baseline"] = round(
            sample_eps / ESTIMATED_REFERENCE_SAMPLE_EPS, 3)

    print(json.dumps(record))


if __name__ == "__main__":
    main()
