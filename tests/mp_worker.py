"""Multi-process worker for test_multiprocess.py.

Runs a tiny HAMT fine-tune over a real ``jax.distributed`` CPU cluster
(Gloo collectives) — the multi-HOST execution path that the in-process
8-virtual-device tests cannot reach. This is the TPU-native equivalent
of the reference's NCCL process group + DDP training
(``finetune_src/utils/distributed.py:13-71``, ``r2r/agent_cmt.py:54-56``):
every process assembles the identical global batch from its own env
replica (deterministic seed), ``shard_batch`` scatters the local shards,
and GSPMD compiles the cross-process gradient all-reduce into the
jitted update.

Invocation (by the test, never by pytest collection):
    python tests/mp_worker.py <port> <process_id> <num_processes> <out.json> \
        [scenario]

``scenario``: ``r2r`` (default — teacher + fused + MERGED sample
updates, greedy eval), ``reverie`` (object-grounded merged update +
eval with predObjIds), or ``sharded`` (per-host SHARDED feeding:
each process's env holds only its own global-batch rows and the agent
stitches them with ``make_array_from_process_local_data`` — the
scalable multi-host layout; the worker derives each host's item stream
from a full-data oracle env so the distributed run must reproduce the
single-process oracle exactly).

With ``num_processes=1`` it runs single-process on the same total device
count — the parity oracle: the distributed run must reproduce its
losses and trajectories exactly (same mesh shape, same math, the only
difference is which process owns which shard).
"""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache (shared with conftest): the sharded/uneven
# scenarios compile the SAME programs — under load the uneven variant
# alone took 36 min without it (round-4 VERDICT Weak #5)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def main() -> None:
    port, pid, nprocs, out_path = sys.argv[1:5]
    scenario = sys.argv[5] if len(sys.argv) > 5 else "r2r"
    pid, nprocs = int(pid), int(nprocs)
    if nprocs > 1:
        from vln_hamt_tpu.parallel.mesh import init_distributed

        init_distributed(f"localhost:{port}", num_processes=nprocs,
                         process_id=pid)
        assert jax.process_count() == nprocs

    import numpy as np

    from vln_hamt_tpu.agents.agent import HAMTAgent
    from vln_hamt_tpu.agents.reverie import ReverieAgent
    from vln_hamt_tpu.configs import HAMTConfig
    from vln_hamt_tpu.data.fixtures import (
        add_synthetic_objects,
        make_synthetic_world,
    )
    from vln_hamt_tpu.env import ObsSpec, R2RNavEnv, ReverieNavEnv
    from vln_hamt_tpu.parallel.mesh import (
        host_allgather,
        is_default_process,
        make_mesh,
        reduce_dict_mean,
    )

    assert jax.device_count() == 4, jax.devices()

    world = make_synthetic_world(num_scans=1, nodes_per_scan=12,
                                 num_items=8, feat_dim=32, seed=1)
    feat_dim = world.feat_db.feat_dim
    max_deg = max(g.max_degree for g in world.graphs.values())
    cfg = HAMTConfig().replace(
        model={
            "hidden_size": 64,
            "num_attention_heads": 4,
            "intermediate_size": 128,
            "num_l_layers": 2,
            "num_x_layers": 2,
            "num_h_pano_layers": 1,
            "image_feat_size": feat_dim,
            "max_action_steps": 20,
            "max_position_embeddings": 64,
            "feat_dropout": 0.1,
            **({"obj_feat_size": 24} if "reverie" in scenario else {}),
        },
        env={
            "max_action_len": 8,
            "max_instr_len": 48,
            "max_candidates": max_deg,
            "image_feat_size": feat_dim,
        },
        train={"batch_size": 4, "lr": 1e-3, "ml_weight": 1.0},
    )
    spec = ObsSpec(max_candidates=max_deg, image_feat_size=feat_dim)
    env_kwargs = dict(
        batch_size=cfg.train.batch_size,
        max_instr_len=cfg.env.max_instr_len,
        max_action_len=cfg.env.max_action_len, seed=0,
    )
    eval_env = None
    if scenario == "reverie":
        obj_db, obj2vp = add_synthetic_objects(world, obj_feat_size=24,
                                               seed=1)
        env = ReverieNavEnv(
            world.graphs, world.feat_db, world.instr_data, spec,
            obj_db=obj_db, obj2viewpoint=obj2vp, max_objects=4,
            obj_feat_size=24, **env_kwargs)
        agent = ReverieAgent(cfg, env, seed=0)
    elif scenario in ("sharded", "sharded_reverie", "sharded_uneven"):
        # per-host sharded feeding, optionally on the object-grounded
        # task (dual-CE merged update, object tables, predObjId decode)
        env_cls_, agent_cls, extra = R2RNavEnv, HAMTAgent, {}
        if scenario == "sharded_reverie":
            obj_db, obj2vp = add_synthetic_objects(world, obj_feat_size=24,
                                                   seed=1)
            env_cls_, agent_cls = ReverieNavEnv, ReverieAgent
            extra = dict(obj_db=obj_db, obj2viewpoint=obj2vp,
                         max_objects=4, obj_feat_size=24)
        if jax.process_count() > 1:
            # this host's TRAIN item stream = its own global-batch rows
            # of the oracle env's exact minibatch sequence (same data +
            # seed ⇒ the distributed run matches loss-for-loss)
            b_g = cfg.train.batch_size
            b_l = b_g // nprocs
            # teacher ×2 = 2 minibatches; each merged 'sample'
            # iteration consumes TWO (IL teacher episode + rollout
            # reset — the reference's two per-iteration resets) ⇒ 6.
            # sharded_uneven tests the EVAL loop-count invariant, not
            # training — one iteration of each suffices there (⇒ 3)
            n_stream_batches = 3 if scenario == "sharded_uneven" else 6
            stream = env_cls_(world.graphs, world.feat_db,
                              world.instr_data, spec,
                              **env_kwargs, **extra)
            seq = []
            for _ in range(n_stream_batches):
                stream._next_minibatch()
                seq.extend(stream.batch[pid * b_l:(pid + 1) * b_l])
            env = env_cls_(world.graphs, world.feat_db, world.instr_data,
                           spec, **{**env_kwargs, "batch_size": b_l},
                           **extra)
            env.data, env.ix = seq, 0
            if scenario == "sharded_uneven":
                # UNEQUAL disjoint eval shards (5 vs 3 items): the
                # processes wrap after DIFFERENT batch counts
                # (ceil(5/2)+1=3 vs ceil(3/2)+1=2 device-eval
                # iterations), exercising eval_split_device's
                # all-process loop guard — every process must keep
                # issuing the global collectives until ALL shards have
                # wrapped, else the early finisher deadlocks the rest
                # (the last rank holds the len%n_proc remainder under
                # --sharded_feed, env/r2r_env.py:75-80; round-3 ADVICE
                # #1). Without the guard this test HANGS.
                lo, hi = (0, 5) if pid == 0 else (5, 8)
            else:
                # equal disjoint eval shards: [pid*4, (pid+1)*4)
                lo, hi = pid * 4, (pid + 1) * 4
            eval_env = env_cls_(world.graphs, world.feat_db,
                                world.instr_data[lo:hi],
                                spec, **{**env_kwargs, "batch_size": b_l},
                                **extra)
        else:  # oracle: the full global batch on one process
            env = env_cls_(world.graphs, world.feat_db, world.instr_data,
                           spec, **env_kwargs, **extra)
        agent = agent_cls(cfg, env, seed=0)
    else:
        env = R2RNavEnv(world.graphs, world.feat_db, world.instr_data,
                        spec, **env_kwargs)
        agent = HAMTAgent(cfg, env, seed=0)
    agent.enable_feature_table()
    # data sharded ACROSS processes, tensor-parallel WITHIN each
    # process (make_mesh lays devices out process-major)
    agent.enable_mesh(make_mesh(num_data=2, num_model=2))
    if scenario.startswith("sharded") and jax.process_count() > 1:
        agent.enable_host_sharded_feed()
        eval_env.feat_offsets = env.feat_offsets

    losses = []
    if scenario == "reverie":
        # the production default: dual-CE merged single-scan update
        agent.merged_sample_update = True
        for _ in range(2):
            losses.append(float(agent.train_iteration("sample")["loss"]))
    elif scenario.startswith("sharded"):
        n_iters = 1 if scenario == "sharded_uneven" else 2
        for _ in range(n_iters):
            losses.append(float(agent.train_iteration("teacher")["loss"]))
        agent.merged_sample_update = True
        for _ in range(n_iters):
            losses.append(float(agent.train_iteration("sample")["loss"]))
    else:
        for _ in range(2):
            losses.append(float(agent.train_iteration("teacher")["loss"]))
        agent.merged_sample_update = False
        for _ in range(2):
            # fused sample update: IL + device rollout with grads + A2C
            losses.append(float(agent.train_iteration("sample")["loss"]))
        agent.merged_sample_update = True
        for _ in range(2):
            # merged single-scan update (the production CLI default)
            losses.append(float(agent.train_iteration("sample")["loss"]))

    if scenario.startswith("sharded"):
        # each host evaluates its own disjoint shard with the
        # device-scan evaluator; merge across processes
        preds = [p for shard in host_allgather(
            agent.eval_split_device(eval_env or env)) for p in shard]
    else:
        preds = agent.eval_split(env)
    traj = {p["instr_id"]: [x[0] for x in p["trajectory"]] for p in preds}
    obj_preds = ({p["instr_id"]: p.get("predObjId") for p in preds}
                 if "reverie" in scenario else None)

    # host-side collective wrappers (the reference's pickled all_gather
    # / reduce_dict surface)
    gathered = sorted(int(g["pid"]) for g in host_allgather({"pid": pid}))
    reduced = reduce_dict_mean({"x": float(pid)})["x"]

    ckpt_roundtrip = None
    if scenario == "r2r":
        # cross-process-TP checkpointing: model-axis shards span
        # processes here, so save must all-gather before pickling
        # (rank-0 write) and load must re-place on the mesh
        import os

        ckpt = out_path + ".ckpt"
        agent.save(ckpt)
        if nprocs > 1:  # the write is rank-0 gated
            assert os.path.exists(ckpt) == is_default_process()
        if nprocs > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("ckpt_written")
        # EVERY process loads (placing onto a multi-host mesh is a
        # collective device_put); the checkpoint file is on shared tmp
        step = agent.load(ckpt)
        ckpt_roundtrip = int(step) == int(agent.state.step)

    if is_default_process():
        with open(out_path, "w") as f:
            json.dump({
                "losses": losses,
                "traj": traj,
                "obj_preds": obj_preds,
                "gathered": gathered,
                "reduced": reduced,
                "ckpt_roundtrip": ckpt_roundtrip,
                "process_count": jax.process_count(),
            }, f)
    print(f"worker {pid}/{nprocs} done", flush=True)


if __name__ == "__main__":
    main()
