"""Multi-process worker for the pretrain sharded-feed test.

Runs the proxy-task PretrainTrainer with ``host_sharded=True`` over a
real ``jax.distributed`` CPU cluster: each process's batcher (seeded
per rank) assembles only batch/n_proc examples and the trainer
stitches the global batch with ``make_array_from_process_local_data``
— the reference's per-rank DDP loaders (``main_r2r.py:40-92``).

The single-process oracle assembles the SAME global batches by
concatenating the two per-rank batchers' draws (ITM in-batch negative
indices offset into the concatenated rows exactly as the sharded
trainer offsets them), so losses must match.

Invocation (by test_multiprocess.py, never by pytest collection):
    python tests/pretrain_mp_worker.py <port> <pid> <nprocs> <out.json>
"""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache shared with conftest (test-tier speedup)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def main() -> None:
    port, pid, nprocs, out_path = sys.argv[1:5]
    pid, nprocs = int(pid), int(nprocs)
    if nprocs > 1:
        from vln_hamt_tpu.parallel.mesh import init_distributed

        init_distributed(f"localhost:{port}", num_processes=nprocs,
                         process_id=pid)
        assert jax.process_count() == nprocs

    import numpy as np

    from vln_hamt_tpu.configs import ModelConfig
    from vln_hamt_tpu.data.fixtures import make_synthetic_world
    from vln_hamt_tpu.parallel.mesh import is_default_process, make_mesh
    from vln_hamt_tpu.pretrain import (
        PretrainBatcher,
        PretrainTrainer,
        TrajectoryDataset,
        make_synthetic_trajectories,
    )

    assert jax.device_count() == 4, jax.devices()

    world = make_synthetic_world(num_scans=1, nodes_per_scan=12,
                                 num_items=10, feat_dim=48, seed=2)
    recs = make_synthetic_trajectories(world)
    ds = TrajectoryDataset(recs, world.graphs, world.feat_db,
                           image_feat_size=32, image_prob_size=16,
                           max_txt_len=32, max_hist_len=6)
    tiny = ModelConfig(hidden_size=64, num_attention_heads=4,
                       intermediate_size=128, num_l_layers=2,
                       num_x_layers=2, num_h_pano_layers=1,
                       image_feat_size=32, image_prob_size=16,
                       max_position_embeddings=64, max_action_steps=16)
    mesh = make_mesh(num_data=2, num_model=2)
    b_g, b_l = 4, 2

    def mk_batcher(seed):
        return PretrainBatcher(ds, seed=seed, vocab_mask_range=(1000, 2000))

    if nprocs > 1:
        batcher = mk_batcher(pid)  # per-rank example streams
    else:
        class ConcatBatcher:
            """Oracle: global batches = concat of the per-rank draws."""

            def __init__(self):
                self.subs = [mk_batcher(0), mk_batcher(1)]
                self.ds = self.subs[0].ds  # trainer reads shape metadata

            def batch(self, task, bs):
                assert bs == b_g
                parts = [s.batch(task, b_l) for s in self.subs]
                out = {}
                for k in parts[0]:
                    if k == "itm_neg_idxs":
                        # local in-batch rows -> concatenated rows (the
                        # sharded trainer's _row0 offset)
                        out[k] = np.concatenate(
                            [parts[0][k], parts[1][k] + b_l])
                    elif k == "itm_shuffled_pos":  # (K2, B, T)
                        out[k] = np.concatenate(
                            [parts[0][k], parts[1][k]], axis=1)
                    else:
                        out[k] = np.concatenate([parts[0][k], parts[1][k]])
                return out

        batcher = ConcatBatcher()

    # three tasks keep the CPU compile budget sane while covering the
    # sharded-feed hazards: traj- and step-granularity examples, the
    # in-batch ITM negative row offset, and the (K2, B, T) axis-1 stitch
    trainer = PretrainTrainer(
        tiny, batcher, tasks=("mlm", "sap", "itm"),
        batch_size=b_g, lr=1e-3, warmup_steps=5,
        total_steps=100, mix_ratio=(1, 1, 1), seed=0,
        mesh=mesh, host_sharded=(nprocs > 1),
    )
    losses = []
    for _ in range(6):
        task, loss, _ = trainer.train_step(sync=False)
        losses.append((task, float(loss)))

    # identical-replica full-split validation (deterministic refs/rng
    # on every process) — must also match the oracle exactly
    val = trainer.validate(mk_batcher(99), tasks=("mlm", "sap", "itm"))

    if is_default_process():
        with open(out_path, "w") as f:
            json.dump({"losses": losses, "val": val,
                       "process_count": jax.process_count()}, f)
    print(f"pretrain worker {pid}/{nprocs} done", flush=True)


if __name__ == "__main__":
    main()
