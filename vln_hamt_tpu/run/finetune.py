"""Fine-tuning orchestration: dataset building, train loop, validation.

Parity target: ``finetune_src/r2r/main.py`` (+ reverie/cvdn twins) —
env construction per split with rank-sharded validation, the
``log_every`` train/validate cadence, model selection by task metric
(SPL+SR for R2R family, SPL+RGSPL for REVERIE, GP for CVDN;
main.py:204-210, reverie/main_navref.py:197-203, cvdn/main.py:196-201),
best/latest checkpointing, and submission-file dumps.

Runs hermetically with ``--synthetic`` (fixture worlds) or against real
Matterport data dirs when provided.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from ..agents import CVDNAgent, HAMTAgent, R2RBackAgent, ReverieAgent
from ..configs import HAMTConfig, get_preset
from ..data.fixtures import (
    add_synthetic_objects,
    make_synthetic_cvdn_items,
    make_synthetic_r2rback_items,
    make_synthetic_world,
)
from ..data.instructions import construct_instrs
from ..data.nav_graph import load_nav_graphs
from ..env import CVDNNavEnv, ObsSpec, R2RBackNavEnv, R2RNavEnv, ReverieNavEnv
from ..parallel.mesh import host_allgather
from ..utils.logging import MetricsLogger, write_record
from ..utils.misc import apply_rng_impl


def selection_score(dataset: str, metrics: Dict[str, float]) -> float:
    """Model-selection metric per task (main.py:204-210 & twins)."""
    if dataset == "reverie":
        return metrics.get("spl", 0.0) + metrics.get("rgspl", 0.0)
    if dataset == "cvdn":
        return metrics.get("gp", 0.0)
    return metrics.get("spl", 0.0) + metrics.get("sr", 0.0)


_ENV_CLS = {
    "r2r": R2RNavEnv,
    "r2r_last": R2RNavEnv,
    "r4r": R2RNavEnv,
    "rxr": R2RNavEnv,
    "r2r_back": R2RBackNavEnv,
    "reverie": ReverieNavEnv,
    "cvdn": CVDNNavEnv,
}

_AGENT_CLS = {
    "r2r": HAMTAgent,
    "r2r_last": HAMTAgent,
    "r4r": HAMTAgent,
    "rxr": HAMTAgent,
    "r2r_back": R2RBackAgent,
    "reverie": ReverieAgent,
    "cvdn": CVDNAgent,
}


def build_synthetic_dataset(cfg: HAMTConfig, seed: int = 0,
                            test_split: bool = False, aug: bool = False):
    """Fixture-backed envs for hermetic runs (no Matterport data).

    ``aug=True`` builds a synthetic aug env over the train items
    (differently seeded episode stream), so the GT/aug interval
    alternation (main.py:146-161) is exercisable hermetically.
    """
    dataset = cfg.env.dataset
    world = make_synthetic_world(
        num_scans=2, nodes_per_scan=24, num_items=48,
        feat_dim=cfg.env.image_feat_size, seed=seed,
    )
    max_deg = max(g.max_degree for g in world.graphs.values())
    cfg = cfg.replace(env={"max_candidates": max_deg})
    spec = ObsSpec(max_candidates=max_deg,
                   image_feat_size=cfg.env.image_feat_size,
                   ob_type=cfg.env.ob_type)

    env_kwargs = {}
    if dataset == "r2r_back":
        items = make_synthetic_r2rback_items(world)
    elif dataset == "cvdn":
        items = make_synthetic_cvdn_items(world)
        env_kwargs["use_player_path"] = cfg.env.use_player_path
    elif dataset == "reverie":
        obj_db, obj2vp = add_synthetic_objects(
            world, obj_feat_size=cfg.model.obj_feat_size)
        items = world.instr_data
        env_kwargs.update(obj_db=obj_db, obj2viewpoint=obj2vp,
                          max_objects=cfg.env.max_objects,
                          obj_feat_size=cfg.model.obj_feat_size,
                          multi_endpoints=cfg.env.multi_endpoints)
    else:
        items = world.instr_data

    n_train = int(len(items) * 0.75)
    env_cls = _ENV_CLS[dataset]

    def make_env(data, name, seed_shift=0):
        return env_cls(
            world.graphs, world.feat_db, data, spec,
            batch_size=cfg.train.batch_size,
            max_instr_len=cfg.env.max_instr_len,
            max_action_len=cfg.env.max_action_len,
            seed=cfg.train.seed + seed_shift, name=name,
            reuse_episode_buffers=(name in ("train", "aug")),
            **env_kwargs,
        )

    train_env = make_env(items[:n_train], "train")
    if aug:
        train_env = (train_env,
                     make_env(items[:n_train], "aug", seed_shift=1))
    val_envs = {"val_unseen": make_env(items[n_train:], "val_unseen")}
    if test_split:
        # GT-less test items: path truncated to the start viewpoint,
        # mirroring the official test annotations (r2r/main.py:66-69)
        test_items = [{**it, "path": it["path"][:1]}
                      for it in items[n_train:]]
        val_envs["test"] = make_env(test_items, "test")
    return cfg, train_env, val_envs


def build_real_dataset(cfg: HAMTConfig, args, valid_only: bool = False) -> Tuple:
    """Matterport-backed envs (main.py:26-83).

    ``valid_only`` builds only the evaluation envs — the reference's
    ``valid()`` never touches the train split (r2r/main.py:225-269), so
    a checkpoint can be evaluated with only val/test annotation files
    present.
    """
    from ..data.feature_db import (HDF5FeatureDB, load_obj2viewpoint,
                                   load_object_db)

    dataset = cfg.env.dataset
    feat_db = HDF5FeatureDB(args.img_ft_file, cfg.env.image_feat_size)
    # annotation-file variant selection (vlnbert_init.py:4-11: xlmr for
    # rxr / --tokenizer xlm; the vocab size identifies the text trunk)
    tokenizer = "xlm" if cfg.model.vocab_size > 100_000 else "bert"
    splits = {} if valid_only else {"train": ["train"]}
    splits.update({"val_train_seen": ["val_train_seen"],
                   "val_seen": ["val_seen"]})
    # R4R's val_unseen is too large to evaluate during training; the
    # reference substitutes a sampled subset (r2r/main.py:59-63)
    if dataset == "r4r" and not getattr(args, "test", False):
        splits["val_unseen_sampled"] = ["val_unseen_sampled"]
    else:
        splits["val_unseen"] = ["val_unseen"]
    if getattr(args, "submit", False):
        # leaderboard test splits, GT-less (main.py:64-69)
        for sp in (("test",) if dataset != "rxr"
                   else ("test_challenge_public", "test_standard_public")):
            splits[sp] = [sp]
    if args.aug and not valid_only:
        # separate aug env; training alternates GT/aug batches
        # (main.py:150-161)
        splits["aug"] = [args.aug]

    instr = {}
    for name, sp in splits.items():
        try:
            instr[name] = construct_instrs(
                args.anno_dir, dataset, sp,
                max_instr_len=cfg.env.max_instr_len, tokenizer=tokenizer)
        except FileNotFoundError:
            if name == "train":
                raise
            print(f"split {name}: annotation file missing, skipped")
    scans = sorted({x["scan"] for items in instr.values() for x in items})
    graphs = load_nav_graphs(args.connectivity_dir, scans)
    max_deg = max(g.max_degree for g in graphs.values())
    cfg = cfg.replace(env={"max_candidates": max_deg})
    spec = ObsSpec(max_candidates=max_deg,
                   image_feat_size=cfg.env.image_feat_size,
                   ob_type=cfg.env.ob_type)
    env_cls = _ENV_CLS[dataset]

    # task-specific env wiring (reverie/main_navref.py:26-80,
    # cvdn/main.py:43-60)
    env_kwargs: Dict[str, object] = {}
    if dataset == "reverie":
        obj_db = (load_object_db(args.obj_ft_file, cfg.model.obj_feat_size)
                  if getattr(args, "obj_ft_file", None) else {})
        env_kwargs.update(
            obj_db=obj_db,
            obj2viewpoint=load_obj2viewpoint(args.anno_dir),
            max_objects=cfg.env.max_objects,
            obj_feat_size=cfg.model.obj_feat_size,
        )
    elif dataset == "cvdn":
        env_kwargs["use_player_path"] = cfg.env.use_player_path

    import jax

    n_proc, rank = jax.process_count(), jax.process_index()
    # two multi-host data layouts:
    # - identical replicas (default): every process seeds identically,
    #   assembles the SAME global batch (tests/mp_worker.py), and
    #   evaluates the FULL val splits (predictions dedupe by instr_id).
    #   Val envs must NOT be rank-sharded here: a per-rank shard would
    #   feed incoherent global arrays (each host's devices hold only its
    #   block of the data axis, but the host decodes all rows against
    #   its own shard).
    # - sharded feeding (--sharded_feed): each process's envs hold only
    #   its 1/n_proc shard at batch/n_proc, and the agent stitches the
    #   global batch via make_array_from_process_local_data
    #   (agent.enable_host_sharded_feed) — the reference's per-rank DDP
    #   feeding (cvdn/main.py:42-49), host env work scales with
    #   processes.
    sharded = bool(getattr(args, "sharded_feed", False)) and n_proc > 1
    if sharded:
        assert cfg.train.batch_size % n_proc == 0, (
            f"--sharded_feed needs batch {cfg.train.batch_size} "
            f"divisible by {n_proc} processes")
    local_bs = cfg.train.batch_size // n_proc if sharded \
        else cfg.train.batch_size
    # valid_only builds a MESH-LESS agent: each process then evaluates
    # its own val shard independently on its own devices (coherent
    # without global arrays) — the reference's rank-sharded validation
    # (r2r/env.py:96-104)
    shard_val = sharded or (valid_only and n_proc > 1)

    def make_env(data, name):
        kwargs = dict(env_kwargs)
        if dataset == "reverie":
            # endpoint resampling trains only (main_navref.py:44,76);
            # start resampling is an aug-env-only augmentation (:56)
            kwargs["multi_endpoints"] = (cfg.env.multi_endpoints
                                         and name in ("train", "aug"))
            kwargs["multi_startpoints"] = name == "aug"
        is_train = name in ("train", "aug")
        return env_cls(
            graphs, feat_db, data, spec,
            batch_size=local_bs,
            max_instr_len=cfg.env.max_instr_len,
            max_action_len=cfg.env.max_action_len,
            seed=cfg.train.seed,
            name=name,
            sel_data_idxs=(rank, n_proc)
            if (sharded or (shard_val and not is_train)) else None,
            reuse_episode_buffers=is_train,
            **kwargs,
        )

    train_env = None
    if not valid_only:
        train_env = make_env(instr["train"], "train")
        if args.aug:
            train_env = (train_env, make_env(instr["aug"], "aug"))
    val_envs = {
        name: make_env(items, name)
        for name, items in instr.items()
        if name not in ("train", "aug")
    }
    return cfg, train_env, val_envs


def _merge_preds(preds: List[dict]) -> List[dict]:
    """Cross-process prediction merge, deduped by instr_id: disjoint
    per-host shards (sharded feeding) pass through; identical replicas
    (every host evaluated the full split) collapse to one copy."""
    merged = {}
    for p in (q for shard in host_allgather(preds) for q in shard):
        merged.setdefault(p["instr_id"], p)
    return list(merged.values())


def _apply_weight_init(agent, init_pretrain: Optional[str],
                       init_ref_ckpt: Optional[str],
                       record_file: Optional[str] = None) -> None:
    """Route the two checkpoint-initialization pathways into the agent
    (vlnbert_init.py:20-31): a run/pretrain.py pickle (trunk + SAP->
    action-head graft) or a released reference torch checkpoint."""
    assert not (init_pretrain and init_ref_ckpt), (
        "--init_pretrain and --init_ref_ckpt are mutually exclusive")
    skipped = None
    if init_pretrain:
        skipped = agent.init_from_pretrain(init_pretrain)
        src = init_pretrain
    elif init_ref_ckpt:
        skipped = agent.init_from_reference(init_ref_ckpt)
        src = init_ref_ckpt
    if skipped is not None:
        msg = (f"initialized weights from {src}"
               + (f" (skipped {len(skipped)} mismatched leaves: "
                  f"{', '.join(skipped[:8])}"
                  + ("..." if len(skipped) > 8 else "") + ")"
                  if skipped else ""))
        print(msg)
        if record_file:
            write_record(record_file, msg)


def train(
    cfg: HAMTConfig,
    train_env,
    val_envs: Dict[str, object],
    output_dir: str,
    iters: Optional[int] = None,
    log_every: Optional[int] = None,
    eval_first: bool = False,
    resume_file: Optional[str] = None,
    no_cand_backtrack: bool = False,
    merged_sample: bool = True,
    init_pretrain: Optional[str] = None,
    init_ref_ckpt: Optional[str] = None,
    sharded_feed: bool = False,
    orbax_ckpt: bool = False,
    packed_il: bool = False,
) -> Dict[str, float]:
    """The main train/validate loop (main.py:86-222)."""
    os.makedirs(output_dir, exist_ok=True)
    logger = MetricsLogger(output_dir)
    record_file = os.path.join(output_dir, "train.txt")
    dataset = cfg.env.dataset
    # (train_env, aug_env) tuple -> alternate GT/aug batches
    # (main.py:150-161)
    aug_env = None
    if isinstance(train_env, tuple):
        train_env, aug_env = train_env
    agent = _AGENT_CLS[dataset](cfg, train_env, seed=cfg.train.seed)
    # production default: merged single-scan 'sample' update (IL lanes
    # inside the rollout scan — fastest measured path, BASELINE.md);
    # --no_merged_sample falls back to the fused two-scan update, which
    # is bit-comparable to the host rollout (PARITY.md #18)
    agent.merged_sample_update = merged_sample
    # weight initialization from a pretraining / released reference
    # checkpoint (the reference's --bert_ckpt_file recipe,
    # vlnbert_init.py:20-31; every scripts/run_*.sh passes one) —
    # BEFORE enable_mesh/resume so values land pre-sharding and a
    # --resume_file still wins
    _apply_weight_init(agent, init_pretrain, init_ref_ckpt, record_file)
    if cfg.train.feat_table:
        # device-resident feature table: episodes/policy steps ship node
        # indices, the device gathers features (REVERIE additionally
        # gathers from a node-aligned object table)
        agent.enable_feature_table(train_env)
        for e in ([aug_env] if aug_env is not None else []) + list(val_envs.values()):
            e.feat_offsets = train_env.feat_offsets
    # mesh-parallel training (replaces the reference's DDP wrap,
    # agent_cmt.py:54-56): shard params/batches over a
    # (num_data_shards, model_shards) mesh; enable BEFORE loading so
    # restored values land on the mesh
    if cfg.train.num_data_shards * cfg.train.model_shards > 1:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(num_data=cfg.train.num_data_shards,
                         num_model=cfg.train.model_shards)
        agent.enable_mesh(mesh)
    import jax

    if sharded_feed and jax.process_count() > 1:
        # per-host sharded feeding: this process's envs hold only its
        # shard; the agent stitches the global batch
        agent.enable_host_sharded_feed()
    if packed_il:
        # pack several teacher episodes per scan slot (agents/packing.py)
        # — the static-T scan stops paying for episode padding; same
        # estimator per episode (tests/test_packed_il.py)
        if cfg.train.feedback != "teacher":
            raise ValueError("--packed_il applies to teacher feedback "
                             "only (an interactive 'sample' rollout has "
                             "policy-dependent lengths)")
        if sharded_feed and jax.process_count() > 1:
            raise ValueError("--packed_il with --sharded_feed is "
                             "unsupported (packs are assembled per "
                             "process over the full batch)")
        if not cfg.train.feat_table:
            raise ValueError("--packed_il requires the feature table")
        agent.enable_packed_il()
    if resume_file:
        agent.load(resume_file, resume_optimizer=cfg.train.resume_optimizer)
    # config dump (reference save_training_meta, utils/save.py:12-20)
    with open(os.path.join(output_dir, "training_config.json"), "w") as f:
        f.write(cfg.to_json())

    if eval_first:  # sanity eval before training (main.py:112-128)
        for name, env in val_envs.items():
            preds = agent.eval_split_fast(env)
            metrics, _ = env.eval_metrics(_merge_preds(preds))
            write_record(record_file, f"eval_first {name}: {metrics}")

    iters = iters or cfg.train.iters
    log_every = log_every or cfg.train.log_every
    best = {"score": -np.inf, "iter": 0}

    def save_ckpt(stem: str) -> None:
        # --orbax_ckpt: durable directory checkpoints committed on a
        # background thread (IO overlaps the next train interval);
        # default: the reference-style single-file pickle
        if orbax_ckpt:
            agent.save_orbax(stem, async_=True)
        else:
            agent.save(stem + ".pkl")

    # per-interval throughput + MFU (the reference logs ex/s,
    # main_r2r.py:283-301; MFU = analytic matmul FLOPs / wall time /
    # chip bf16 peak, utils/flops.py)
    from ..utils.flops import analytic_update_flops, chip_peak_flops

    n_ob = cfg.env.max_candidates + 1 + 36
    n_obj = cfg.env.max_objects if cfg.model.obj_feat_size > 0 else 0
    lanes_per_iter = cfg.train.batch_size * (
        2 if cfg.train.feedback == "sample" else 1)
    flops_per_iter = analytic_update_flops(
        cfg, lanes_per_iter, n_ob, n_obj=n_obj)
    peak = chip_peak_flops(jax.devices()[0]) * len(jax.devices())

    step = 0
    while step < iters:
        interval = min(log_every, iters - step)
        losses = []
        eps_in_interval = 0
        with logger.timer("train") as train_t:
            for j in range(interval):
                # async: device works while the host assembles the next
                # episode; sync only at the logging boundary
                if aug_env is not None:
                    agent.env = train_env if j % 2 == 0 else aug_env
                out = agent.train_iteration(sync=False)
                # packed IL trains a variable episode count per update
                eps_in_interval += out.get("episodes",
                                           cfg.train.batch_size)
                losses.append(out["loss"])
            losses = [float(np.asarray(l)) for l in losses]
        step += interval
        dt = train_t.last
        logger.log(step, {"loss": float(np.mean(losses)),
                          "eps_per_sec": eps_in_interval / dt,
                          "mfu": interval * flops_per_iter / dt / peak,
                          **{k: float(np.mean(v[-interval:]))
                             for k, v in agent.logs.items() if v}})

        for name, env in val_envs.items():
            with logger.timer(f"eval_{name}"):
                preds = agent.eval_split_fast(env, no_cand_backtrack)
                merged = _merge_preds(preds)
                metrics, _ = env.eval_metrics(merged)
            logger.log(step, metrics, prefix=f"{name}/")
            write_record(record_file, f"iter {step} {name}: " + ", ".join(
                f"{k}={v:.2f}" for k, v in metrics.items()))
            if name in ("val_unseen", "val_unseen_sampled"):
                score = selection_score(dataset, metrics)
                if score > best["score"]:
                    best = {"score": score, "iter": step, **metrics}
                    save_ckpt(os.path.join(output_dir, "best_val_unseen"))
        save_ckpt(os.path.join(output_dir, "latest"))
        logger.log_timers(step)
    agent.wait_for_checkpoints()  # commit any in-flight async saves
    return best


def valid(cfg: HAMTConfig, ckpt: Optional[str], val_envs: Dict[str, object],
          output_dir: str, submit: bool = False,
          no_cand_backtrack: bool = False,
          init_pretrain: Optional[str] = None,
          init_ref_ckpt: Optional[str] = None) -> Dict[str, Dict[str, float]]:
    """Stand-alone evaluation of a checkpoint (main.py:225-269):
    greedy eval per split, metrics for GT splits, ``submit_{split}.json``
    dumps, and a valid.txt record file."""
    os.makedirs(output_dir, exist_ok=True)
    record_file = os.path.join(output_dir, "valid.txt")
    dataset = cfg.env.dataset
    agent = _AGENT_CLS[dataset](cfg, None, seed=cfg.train.seed)
    _apply_weight_init(agent, init_pretrain, init_ref_ckpt, record_file)
    if ckpt:
        step = agent.load(ckpt)
        write_record(record_file, f"loaded {ckpt} at iter {step}")
    if cfg.train.feat_table and val_envs:
        first = next(iter(val_envs.values()))
        agent.env = first
        agent.enable_feature_table(first)  # all envs share the graphs
        for env in val_envs.values():
            env.feat_offsets = first.feat_offsets
    results = {}
    for name, env in val_envs.items():
        agent.env = env
        preds = agent.eval_split_fast(env, no_cand_backtrack)
        merged = _merge_preds(preds)
        if "test" not in name:  # test splits have no GT (main.py:258-262)
            metrics, _ = env.eval_metrics(merged)
            results[name] = metrics
            write_record(record_file, f"{name}: " + ", ".join(
                f"{k}={v:.2f}" for k, v in metrics.items()))
        if submit:
            path = os.path.join(output_dir, f"submit_{name}.json")
            with open(path, "w") as f:
                json.dump(
                    [{"instr_id": p["instr_id"],
                      "trajectory": [[vp, h, e] for vp, h, e in p["trajectory"]],
                      # task extras ride along like the reference's raw
                      # get_results dumps (reverie predObjId, r2rback
                      # midstop; main_navref.py:252-256)
                      **{k: p[k] for k in ("predObjId", "midstop")
                         if k in p}}
                     for p in merged], f, sort_keys=True, indent=2)
    return results


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="HAMT-TPU fine-tuning")
    p.add_argument("--task", default="r2r", choices=sorted(_ENV_CLS))
    p.add_argument("--output_dir", default="runs/finetune")
    p.add_argument("--iters", type=int, default=None)
    p.add_argument("--log_every", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--feedback", default=None, choices=["teacher", "sample"])
    p.add_argument("--synthetic", action="store_true",
                   help="run on hermetic fixture worlds")
    p.add_argument("--tiny", action="store_true",
                   help="small model + short episodes (smoke tests/demos)")
    p.add_argument("--anno_dir", default=None)
    p.add_argument("--connectivity_dir", default=None)
    p.add_argument("--img_ft_file", default=None)
    p.add_argument("--obj_ft_file", default=None,
                   help="REVERIE object-feature HDF5 "
                        "(reverie/parser.py --obj_ft_file)")
    p.add_argument("--aug", default=None,
                   help="augmented-instruction annotation file "
                        "(prevalent_aug); training then alternates "
                        "GT/aug batches (main.py:146-161). With "
                        "--synthetic any value builds a fixture aug "
                        "env (hermetic alternation smoke).")
    p.add_argument("--resume_file", default=None)
    p.add_argument("--init_pretrain", default=None,
                   help="run/pretrain.py checkpoint to initialize the "
                        "trunk from (SAP head grafts onto the action "
                        "head; the reference's --bert_ckpt_file recipe, "
                        "vlnbert_init.py:20-31)")
    p.add_argument("--init_ref_ckpt", default=None,
                   help="released reference torch checkpoint (agent "
                        "save or pretrain ModelSaver state dict) to "
                        "initialize weights from")
    p.add_argument("--eval_first", action="store_true")
    p.add_argument("--valid_only", action="store_true",
                   help="skip training; evaluate --resume_file on the "
                        "val/test splits (reference valid(), "
                        "main.py:225-269)")
    p.add_argument("--submit", action="store_true",
                   help="dump submit_{split}.json predictions and "
                        "include the leaderboard test split")
    p.add_argument("--test", action="store_true",
                   help="use the full val_unseen for R4R instead of "
                        "val_unseen_sampled (r2r/main.py:59-63)")
    p.add_argument("--no_cand_backtrack", action="store_true",
                   help="mask already-visited candidates during greedy "
                        "eval (reference parser.py flag)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (JAX_PLATFORMS is "
                        "overridden by the axon sitecustomize, so the "
                        "env var alone cannot; used by dry runs that "
                        "must not touch the real TPU)")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint the episode scan (O(1) activations)")
    p.add_argument("--remat_policy", default=None, choices=["full", "dots"],
                   help="remat granularity (with --remat): 'full' "
                        "recomputes the whole step backward-side; 'dots' "
                        "saves matmul outputs and recomputes only "
                        "elementwise/attention work (faster, more memory; "
                        "numerically identical)")
    p.add_argument("--no_feat_table", action="store_true",
                   help="ship per-episode features instead of the "
                        "device-resident feature table")
    p.add_argument("--no_merged_sample", action="store_true",
                   help="'sample' feedback as the fused two-scan update "
                        "(bit-comparable to the host rollout) instead of "
                        "the merged single-scan one (PARITY.md #18)")
    p.add_argument("--rng_impl", default=None,
                   choices=["threefry2x32", "rbg"],
                   help="dropout PRNG implementation. 'rbg' uses the "
                        "TPU hardware RngBitGenerator for mask bits: "
                        "+40%% IL / +30%% 'sample' episodes/s on v5e "
                        "(BASELINE.md), same dropout distribution, "
                        "different bit-stream. Exact-bit "
                        "reproducibility across shardings/process "
                        "counts needs the threefry default; 'sample' "
                        "with rbg requires the fused/merged "
                        "single-program updates (the defaults).")
    p.add_argument("--orbax_ckpt", action="store_true",
                   help="write orbax directory checkpoints (async, "
                        "multi-host-native) instead of pickles; "
                        "--resume_file auto-detects the format")
    p.add_argument("--sharded_feed", action="store_true",
                   help="multi-process runs: each process's envs hold "
                        "only its 1/n shard at batch/n and the agent "
                        "stitches the global batch "
                        "(make_array_from_process_local_data) — host "
                        "env work scales with processes (the "
                        "reference's per-rank DDP feeding, "
                        "cvdn/main.py:42-49). Default: identical-seed "
                        "env replicas on every process.")
    p.add_argument("--packed_il", action="store_true",
                   help="pack several teacher episodes into each scan "
                        "slot (agents/packing.py) so the static-T "
                        "episode scan stops paying for padding — "
                        "~T/mean_len more episodes per update at R2R "
                        "lengths, same per-episode estimator "
                        "(tests/test_packed_il.py). Teacher feedback + "
                        "feature-table transport only. REVERIE packs "
                        "ride the dual act+obj CE "
                        "(agents/reverie.py:build_packed_ref_il_forward).")
    p.add_argument("--data_shards", type=int, default=None,
                   help="data-parallel mesh axis (batch sharded over "
                        "devices; replaces the reference's DDP ranks)")
    p.add_argument("--model_shards", type=int, default=None,
                   help="tensor-parallel mesh axis (TP rules from "
                        "parallel/mesh.py)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    # multi-host runtime init (no-op single-process; replaces the
    # reference's init_distributed NCCL rendezvous, main.py:275-277)
    from ..parallel.mesh import init_distributed

    init_distributed()
    cfg = get_preset(args.task)
    overrides = {}
    for key in ("batch_size", "lr", "feedback"):
        if getattr(args, key) is not None:
            overrides[key] = getattr(args, key)
    overrides["seed"] = args.seed
    if args.no_feat_table:
        overrides["feat_table"] = False
    if args.data_shards is not None:
        overrides["num_data_shards"] = args.data_shards
    if args.model_shards is not None:
        overrides["model_shards"] = args.model_shards
    if args.rng_impl is not None:
        overrides["rng_impl"] = args.rng_impl
    cfg = cfg.replace(train=overrides)
    # before any PRNG key exists (key shape depends on the impl)
    apply_rng_impl(cfg.train.rng_impl)
    if args.bf16:
        cfg = cfg.replace(model={"dtype": "bfloat16"})
    if args.remat:
        cfg = cfg.replace(model={"remat": True})
    if args.remat_policy is not None:
        cfg = cfg.replace(model={"remat_policy": args.remat_policy})
    if args.tiny:
        cfg = cfg.replace(
            model={"hidden_size": 64, "num_attention_heads": 4,
                   "intermediate_size": 128, "num_l_layers": 2,
                   "num_x_layers": 1, "num_h_pano_layers": 1,
                   # match run/pretrain.py --tiny so tiny pretrain
                   # checkpoints graft without shape skips
                   "image_feat_size": 32, "max_position_embeddings": 128,
                   "max_action_steps": 32,
                   **({"obj_feat_size": 32}
                      if cfg.model.obj_feat_size > 0 else {})},
            env={"max_action_len": 8, "max_instr_len": 32,
                 "image_feat_size": 32},
            # explicit CLI flags win over the tiny defaults
            train={"batch_size": args.batch_size or 4,
                   "lr": args.lr if args.lr is not None else 1e-3},
        )

    if args.synthetic:
        cfg, train_env, val_envs = build_synthetic_dataset(
            cfg, args.seed, test_split=args.submit,
            aug=bool(args.aug) and not args.valid_only)
    else:
        assert args.anno_dir and args.connectivity_dir and args.img_ft_file, (
            "real-data runs need --anno_dir --connectivity_dir --img_ft_file "
            "(or pass --synthetic)"
        )
        cfg, train_env, val_envs = build_real_dataset(
            cfg, args, valid_only=args.valid_only)

    if args.valid_only:
        results = valid(cfg, args.resume_file, val_envs, args.output_dir,
                        submit=args.submit,
                        no_cand_backtrack=args.no_cand_backtrack,
                        init_pretrain=args.init_pretrain,
                        init_ref_ckpt=args.init_ref_ckpt)
        print(json.dumps({"valid": results}, default=float))
        return

    # leaderboard test splits are evaluated only in valid_only mode
    train_val_envs = {k: v for k, v in val_envs.items() if "test" not in k}
    best = train(cfg, train_env, train_val_envs, args.output_dir,
                 iters=args.iters, log_every=args.log_every,
                 eval_first=args.eval_first, resume_file=args.resume_file,
                 no_cand_backtrack=args.no_cand_backtrack,
                 merged_sample=not args.no_merged_sample,
                 init_pretrain=args.init_pretrain,
                 init_ref_ckpt=args.init_ref_ckpt,
                 sharded_feed=args.sharded_feed,
                 orbax_ckpt=args.orbax_ckpt,
                 packed_il=args.packed_il)
    print(json.dumps({"best": best}, default=float))


if __name__ == "__main__":
    main()
