"""Benchmark: IL training throughput of the full-size R2R HAMT on TPU.

North-star proxy (BASELINE.md): episodes/sec/chip through the training
step. The reference trains R2R at batch 8 on one CUDA GPU
(``finetune_src/scripts/run_r2r.sh``) with per-step Python/GPU
interleaving; here a whole teacher-forced episode batch is ONE jitted
scan (forward + backward + optimizer update).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
``mfu`` (compiled FLOPs/step / measured step time / chip bf16 peak) and
the 'sample' feedback numbers. Each program runs at its measured-
optimal batch (IL 128, sample 64 — BASELINE.md batch-scaling envelope)
with hardware-RNG dropout (BASELINE.md dropout-RNG section).

``vs_baseline`` compares against ESTIMATED_REFERENCE_EPS — an estimate
of the reference pipeline's IL episodes/sec on a single V100 (batch 8,
~0.4 s/iteration judged from its per-step forward count at this model
size; the repo publishes no measured number, see BASELINE.md). Replace
with a measured value when available.

If the TPU backend is unreachable (the tunnel outage mode that produced
BENCH_r03's rc=1), this still prints ONE parseable JSON line with an
``error`` field and exits 0, so outage vs regression is
machine-distinguishable in the round artifacts.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ESTIMATED_REFERENCE_EPS = 20.0  # episodes/sec, 1x V100, IL batch 8 (estimate)
# the reference's 'sample' iteration runs TWO transformer sweeps per
# episode (teacher-forced ML pass + sampled rollout, r2r/agent_cmt.py
# rollout + ml loss) — same 2x-FLOPs argument as our merged update, so
# the per-episode estimate is half the IL figure
ESTIMATED_REFERENCE_SAMPLE_EPS = 10.0

# Each program is measured at its measured-optimal batch (BASELINE.md
# batch-scaling envelope): IL peaks at 128, the merged 'sample' update
# at 64. BENCH_BS overrides BOTH (single-batch mode, the pre-round-4
# behavior); BENCH_IL_BS / BENCH_SAMPLE_BS override individually.
_BS_BOTH = os.environ.get("BENCH_BS")
IL_BATCH = int(os.environ.get("BENCH_IL_BS", _BS_BOTH or 128))
SAMPLE_BATCH = int(os.environ.get("BENCH_SAMPLE_BS", _BS_BOTH or 64))
WARMUP_STEPS = 2
MEASURE_STEPS = int(os.environ.get("BENCH_STEPS", 8))
# the reference's actual training default is feedback='sample'
# (scripts/run_r2r.sh): IL pass + device RL rollout + replay update per
# iteration. Measured alongside the IL number; BENCH_SAMPLE=0 skips it.
SAMPLE_STEPS = int(os.environ.get("BENCH_SAMPLE_STEPS", 4))
MEASURE_SAMPLE = os.environ.get("BENCH_SAMPLE", "1") == "1"

# peak table + analytic flops live in vln_hamt_tpu.utils.flops (shared
# with the fine-tune CLI's throughput logging)


def _probe_backend(timeout_s: int = 90) -> str:
    """Probe TPU reachability in a SUBPROCESS (immune to C-level hangs).

    Returns "" when healthy, else a short error string. BENCH_r03 failed
    with an in-process RuntimeError traceback (and the tunnel was also
    observed to *hang* at judging time), hence subprocess + timeout.
    """
    code = "import jax; print(jax.devices()[0].device_kind)"
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return f"tpu_backend_unavailable: probe timed out after {timeout_s}s"
    if r.returncode != 0:
        tail = (r.stderr or "").strip().splitlines()
        return "tpu_backend_unavailable: " + (tail[-1] if tail else "rc!=0")
    return ""


def _compiled_flops(lowered) -> float:
    """FLOPs/step from XLA's cost analysis of the compiled executable.

    CAVEAT: XLA's HloCostAnalysis counts a While body ONCE — the
    episode ``lax.scan`` (T iterations) is therefore undercounted by
    ~T x. Exact for non-loop programs (verified against a plain matmul
    on this backend). Kept as a secondary diagnostic; the headline
    ``mfu`` uses the analytic matmul count below.
    """
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):  # older jax returns [dict]
        cost = cost[0]
    return float(cost.get("flops", 0.0))


def main() -> None:
    if os.environ.get("BENCH_SKIP_PROBE", "0") != "1":
        err = _probe_backend()
        if err:
            print(json.dumps({
                "metric": "r2r_il_train_episodes_per_sec_per_chip",
                "value": 0.0, "unit": "episodes/s", "vs_baseline": 0.0,
                "error": err,
            }))
            return

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
    # Hardware RngBitGenerator dropout (the production --rng_impl rbg
    # knob, utils/misc.py:apply_rng_impl) is the bench default:
    # zero-dropout diagnosis showed threefry mask generation costs ~1/3
    # of the step (97.3 -> 143.6 eps/s ceiling); rbg recovers most of
    # it (135.97 eps/s, BASELINE.md). Same dropout distribution,
    # different bit-stream; NOT sharding-invariant (threefry stays the
    # default where 2-process == 1-process bit-parity matters).
    # BENCH_RBG=0 reverts to threefry.
    rng_impl = "rbg" if os.environ.get("BENCH_RBG", "1") == "1" else \
        "threefry2x32"
    if rng_impl != "threefry2x32":
        jax.config.update("jax_default_prng_impl", rng_impl)

    from vln_hamt_tpu.agents.agent import HAMTAgent
    from vln_hamt_tpu.configs import get_preset
    from vln_hamt_tpu.data.fixtures import make_synthetic_world
    from vln_hamt_tpu.env import ObsSpec, R2RNavEnv
    from vln_hamt_tpu.utils.flops import analytic_update_flops, chip_peak_flops

    peak_flops = chip_peak_flops(jax.devices()[0])

    # bf16 compute + per-step remat: the fp32 no-remat scan stores
    # O(T * B * L * 4D) activations and OOMs a single 16GB chip.
    # BENCH_REMAT=0 trades memory for a faster compile (ok at bs<=32 in
    # bf16 on 16GB).
    remat = os.environ.get("BENCH_REMAT", "1") == "1"
    # BENCH_REMAT_POLICY=dots saves matmul outputs across the scan-step
    # remat boundary (recompute only elementwise/attention work) — see
    # ModelConfig.remat_policy. Measured a net LOSS on v5e-16GB (OOM at
    # IL 128; 127.3 vs 136.0 eps/s at 64 — BASELINE.md): full stays
    # the default, the knob is for bigger-HBM parts.
    remat_policy = os.environ.get("BENCH_REMAT_POLICY", "full")
    # BENCH_PALLAS_ATTN=1 routes attention through the fused pallas
    # kernel (ops/attention.py), incl. in-kernel dropout for training.
    pallas_attn = os.environ.get("BENCH_PALLAS_ATTN", "0") == "1"
    cfg = get_preset("r2r").replace(
        train={"batch_size": IL_BATCH},
        model={"dtype": "bfloat16", "remat": remat,
               "remat_policy": remat_policy,
               "use_pallas_attention": pallas_attn},
    )
    # BENCH_ZERO_DROPOUT=1: rate-0 dropout short-circuits in flax (no
    # threefry bits generated) — isolates the RNG + mask cost of
    # training dropout in the step time. Diagnostic only; changes the
    # estimator, never a production setting.
    if os.environ.get("BENCH_ZERO_DROPOUT", "0") == "1":
        cfg = cfg.replace(model={
            "hidden_dropout_prob": 0.0, "attention_probs_dropout_prob": 0.0,
            "pred_head_dropout_prob": 0.0, "feat_dropout": 0.0,
            "critic_dropout": 0.0})

    def build_agent(batch_size: int) -> HAMTAgent:
        nonlocal cfg
        cfg = cfg.replace(train={"batch_size": batch_size})
        world = make_synthetic_world(
            num_scans=2, nodes_per_scan=36, num_items=2 * batch_size,
            feat_dim=cfg.model.image_feat_size, seed=0,
        )
        max_deg = max(g.max_degree for g in world.graphs.values())
        cfg = cfg.replace(env={"max_candidates": max_deg})
        spec = ObsSpec(max_candidates=max_deg,
                       image_feat_size=cfg.env.image_feat_size)
        env = R2RNavEnv(
            world.graphs, world.feat_db, world.instr_data, spec,
            batch_size=batch_size, max_instr_len=cfg.env.max_instr_len,
            max_action_len=cfg.env.max_action_len, seed=0,
            reuse_episode_buffers=True,
        )
        agent = HAMTAgent(cfg, env, seed=0)
        # BENCH_FEAT_TABLE=0 reverts to shipping (B,T,V,D) features per
        # iteration instead of device-resident table + (B,T) index gather
        if os.environ.get("BENCH_FEAT_TABLE", "1") == "1":
            agent.enable_feature_table()
        # BENCH_MERGED=0 falls back to the fused two-scan 'sample'
        # update (IL scan + rollout scan) instead of the merged single
        # 2B-lane scan
        agent.merged_sample_update = (
            os.environ.get("BENCH_MERGED", "1") == "1")
        return agent

    def measure_il(agent, profile_dir: str = ""):
        """Measured IL steps/sec (async dispatch, one trailing sync)."""
        for _ in range(WARMUP_STEPS):
            agent.train_iteration("teacher")
        # BENCH_PROFILE=<dir>: capture a jax.profiler trace of the
        # measured IL steps (xplane artifacts for the MFU gap analysis)
        if profile_dir:
            jax.profiler.start_trace(profile_dir)
        t0 = time.perf_counter()
        out = None
        for _ in range(MEASURE_STEPS):
            # async: device works on step k while the host assembles k+1
            out = agent.train_iteration("teacher", sync=False)
        final_loss = float(out["loss"])  # sync once at the end
        dt = time.perf_counter() - t0
        if profile_dir:
            jax.profiler.stop_trace()
        assert np.isfinite(final_loss)
        return MEASURE_STEPS / dt

    def measure_sample(agent, profile_dir: str = ""):
        out = agent.train_iteration("sample", sync=False)  # warm/compile
        float(out["loss"])
        if profile_dir:
            jax.profiler.start_trace(profile_dir)
        t0 = time.perf_counter()
        for _ in range(SAMPLE_STEPS):
            out = agent.train_iteration("sample", sync=False)
        sample_loss = float(out["loss"])
        dt = time.perf_counter() - t0
        if profile_dir:
            jax.profiler.stop_trace()
        assert np.isfinite(sample_loss)
        return SAMPLE_STEPS / dt

    agent = build_agent(IL_BATCH)
    profile_dir = os.environ.get("BENCH_PROFILE", "")
    steps_per_sec = measure_il(agent, profile_dir)
    eps_per_sec = steps_per_sec * IL_BATCH

    record = {
        "metric": "r2r_il_train_episodes_per_sec_per_chip",
        "value": round(eps_per_sec, 2),
        "unit": "episodes/s",
        "vs_baseline": round(eps_per_sec / ESTIMATED_REFERENCE_EPS, 3),
        # the reference publishes NO throughput numbers; the divisor is
        # the BASELINE.md estimate (20 IL / 10 sample eps/s on 1x V100)
        "baseline_estimated": True,
        "batch_size": IL_BATCH,
        "rng_impl": rng_impl,
    }

    # ---- MFU: analytic matmul FLOPs/step (fwd+bwd; remat recompute
    # excluded) / measured wall step time / chip bf16 peak. XLA's
    # compiled cost analysis is recorded too but counts the episode
    # scan's While body only once (see _compiled_flops) — diagnostic
    # only.
    n_ob = cfg.env.max_candidates + 1 + 36
    il_flops = analytic_update_flops(cfg, IL_BATCH, n_ob)
    record["flops_per_step"] = il_flops
    record["mfu"] = round(il_flops * steps_per_sec / peak_flops, 4)
    record["peak_flops"] = peak_flops
    # BENCH_DUMP_HLO=<prefix>: write the compiled module text (gzipped)
    # for utils/xprof.py --hlo categorization of the profile traces
    hlo_prefix = os.environ.get("BENCH_DUMP_HLO", "")

    def dump_hlo(lowered, name):
        import gzip

        path = f"{hlo_prefix}_{name}.hlo.txt.gz"
        with gzip.open(path, "wt") as f:
            f.write(lowered.compile().as_text())
        return path

    try:
        ep = agent._ep_to_device(agent.env.teacher_episode())
        il_lowered = agent._il_update.lower(
            agent.state.params, agent.state.cparams,
            agent.state.opt_state, agent.state.copt_state, ep,
            jax.random.PRNGKey(0), cfg.train.teacher_weight,
            agent._feat_table)
        record["flops_per_step_xla_noscan"] = _compiled_flops(il_lowered)
        if hlo_prefix:
            dump_hlo(il_lowered, "il")
    except Exception as e:  # never let the measurement kill the bench
        record["mfu_error"] = f"{type(e).__name__}: {e}"[:200]

    # ---- packed IL (BENCH_PACKED_IL=0 skips): several teacher episodes
    # ride each scan slot back to back (agents/packing.py), so the
    # static-T scan stops paying for episode padding. Same per-episode
    # estimator (tests/test_packed_il.py); episodes/s counts episodes
    # actually trained, not slots.
    if (os.environ.get("BENCH_PACKED_IL", "1") == "1"
            and agent._feat_table is not None):
        agent.enable_packed_il()
        out = agent.train_iteration("teacher", sync=False)  # warm/compile
        float(out["loss"])
        # BENCH_PROFILE_PACKED=<dir>: trace the measured packed steps
        packed_prof = os.environ.get("BENCH_PROFILE_PACKED", "")
        if packed_prof:
            jax.profiler.start_trace(packed_prof)
        c0 = agent._packer.episodes_consumed
        t0 = time.perf_counter()
        for _ in range(MEASURE_STEPS):
            out = agent.train_iteration("teacher", sync=False)
        packed_loss = float(out["loss"])  # sync
        dt = time.perf_counter() - t0
        if packed_prof:
            jax.profiler.stop_trace()
        assert np.isfinite(packed_loss)
        n_eps = agent._packer.episodes_consumed - c0
        record["il_packed_eps_per_sec"] = round(n_eps / dt, 2)
        record["il_packed_eps_per_update"] = round(n_eps / MEASURE_STEPS, 1)
        if hlo_prefix:
            try:
                import jax.numpy as jnp

                pack = jax.tree.map(jnp.asarray, agent._packer.next_pack())
                st = agent.state
                dump_hlo(agent._packed_il_update.lower(
                    st.params, st.cparams, st.opt_state, st.copt_state,
                    pack, jax.random.PRNGKey(0), cfg.train.teacher_weight,
                    agent._feat_table), "packed")
            except Exception as e:
                record["packed_hlo_dump_error"] = \
                    f"{type(e).__name__}: {e}"[:200]
        agent.packed_il = False  # later rng-companion reuse stays unpacked

    if MEASURE_SAMPLE and SAMPLE_BATCH != IL_BATCH:
        # the 'sample' envelope peaks at a different batch (its scan
        # already runs 2B lanes); rebuild at SAMPLE_BATCH and let the
        # old agent's buffers free first
        del agent
        agent = build_agent(SAMPLE_BATCH)
        record["sample_batch_size"] = SAMPLE_BATCH

    if MEASURE_SAMPLE and agent._nav_tables is not None:
        # BENCH_PROFILE_SAMPLE=<dir>: trace the measured 'sample' steps
        # (the second production envelope, VERDICT r4 #5)
        sample_sps = measure_sample(
            agent, os.environ.get("BENCH_PROFILE_SAMPLE", ""))
        sample_eps = sample_sps * SAMPLE_BATCH
        record["sample_eps_per_sec"] = round(sample_eps, 2)
        record["sample_vs_baseline"] = round(
            sample_eps / ESTIMATED_REFERENCE_SAMPLE_EPS, 3)
        # the merged update runs IL + RL as 2B lanes through the SAME
        # per-step transformer (PARITY.md #18) -> ~2x the IL flops
        s_flops = analytic_update_flops(cfg, 2 * SAMPLE_BATCH, n_ob)
        record["sample_flops_per_step"] = s_flops
        record["sample_mfu"] = round(
            s_flops * sample_sps / peak_flops, 4)
        if hlo_prefix and agent.merged_sample_update:
            try:
                il_ep = agent._ep_to_device(agent.env.teacher_episode())
                agent._ensure_device_rollout_fn()
                ins, tkeys = agent._device_rollout_args()
                rins = {k: ins[k] for k in ("txt_ids", "txt_mask",
                                            "start_node", "start_view",
                                            "offs")}
                rins["task_inputs"] = {k: ins[k] for k in tkeys}
                st = agent.state
                dump_hlo(agent._merged_sample_update.lower(
                    st.params, st.cparams, st.opt_state, st.copt_state,
                    il_ep, cfg.train.ml_weight, rins,
                    jax.random.PRNGKey(0), agent._feat_table,
                    agent._nav_tables), "sample")
            except Exception as e:
                record["hlo_dump_error"] = f"{type(e).__name__}: {e}"[:200]

    # ---- companion run under the CONFIG-DEFAULT threefry dropout RNG
    # (rbg is the bench/production throughput knob but threefry is what
    # exact-reproducibility runs use — VERDICT r4 Weak #2 asked for
    # both in the round artifact; compiles are cached so this is cheap).
    # BENCH_BOTH_RNG=0 skips.
    if (rng_impl == "rbg"
            and os.environ.get("BENCH_BOTH_RNG", "1") == "1"):
        jax.config.update("jax_default_prng_impl", "threefry2x32")
        del agent
        agent = build_agent(IL_BATCH)
        record["il_eps_threefry"] = round(measure_il(agent) * IL_BATCH, 2)
        if MEASURE_SAMPLE:
            if SAMPLE_BATCH != IL_BATCH:
                del agent
                agent = build_agent(SAMPLE_BATCH)
            if agent._nav_tables is not None:
                record["sample_eps_threefry"] = round(
                    measure_sample(agent) * SAMPLE_BATCH, 2)

    print(json.dumps(record))


if __name__ == "__main__":
    main()
