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
    python tests/mp_worker.py <port> <process_id> <num_processes> <out.json>

With ``num_processes=1`` it runs single-process on the same total device
count — the parity oracle: the distributed run must reproduce its
losses and trajectories exactly (same mesh shape, same math, the only
difference is which process owns which shard).
"""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    port, pid, nprocs, out_path = sys.argv[1:5]
    pid, nprocs = int(pid), int(nprocs)
    if nprocs > 1:
        from vln_hamt_tpu.parallel.mesh import init_distributed

        init_distributed(f"localhost:{port}", num_processes=nprocs,
                         process_id=pid)
        assert jax.process_count() == nprocs

    import numpy as np

    from vln_hamt_tpu.agents.agent import HAMTAgent
    from vln_hamt_tpu.configs import HAMTConfig
    from vln_hamt_tpu.data.fixtures import make_synthetic_world
    from vln_hamt_tpu.env import ObsSpec, R2RNavEnv
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
    env = R2RNavEnv(
        world.graphs, world.feat_db, world.instr_data, spec,
        batch_size=cfg.train.batch_size,
        max_instr_len=cfg.env.max_instr_len,
        max_action_len=cfg.env.max_action_len, seed=0,
    )
    agent = HAMTAgent(cfg, env, seed=0)
    agent.enable_feature_table()
    # data sharded ACROSS processes, tensor-parallel WITHIN each
    # process (make_mesh lays devices out process-major)
    agent.enable_mesh(make_mesh(num_data=2, num_model=2))

    losses = []
    for _ in range(2):
        losses.append(float(agent.train_iteration("teacher")["loss"]))
    for _ in range(2):
        # fused sample update: IL + device rollout with grads + A2C
        losses.append(float(agent.train_iteration("sample")["loss"]))

    preds = agent.eval_split(env)
    traj = {p["instr_id"]: [x[0] for x in p["trajectory"]] for p in preds}

    # host-side collective wrappers (the reference's pickled all_gather
    # / reduce_dict surface)
    gathered = sorted(int(g["pid"]) for g in host_allgather({"pid": pid}))
    reduced = reduce_dict_mean({"x": float(pid)})["x"]

    if is_default_process():
        with open(out_path, "w") as f:
            json.dump({
                "losses": losses,
                "traj": traj,
                "gathered": gathered,
                "reduced": reduced,
                "process_count": jax.process_count(),
            }, f)
    print(f"worker {pid}/{nprocs} done", flush=True)


if __name__ == "__main__":
    main()
