"""Proxy-task pretraining orchestration.

Parity target: ``pretrain_src/main_r2r.py`` — config + model build,
mixed-task training with periodic per-task validation and checkpoints.
Runs hermetically with ``--synthetic`` or against reference-format
trajectory JSONL + HDF5 features.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
from typing import Optional

from ..configs import ModelConfig, get_preset
from ..data.fixtures import make_synthetic_world
from ..data.nav_graph import load_nav_graphs
from ..pretrain import (
    PretrainBatcher,
    PretrainTrainer,
    TrajectoryDataset,
    make_synthetic_trajectories,
)
from ..pretrain.trajectory_data import load_trajectory_jsonl
from ..utils.logging import MetricsLogger

# pretrain_r2r.json task mix (config/pretrain_r2r.json:45-60)
DEFAULT_TASKS = ("mlm", "mrc", "itm", "sap", "sar", "sprel")
DEFAULT_MIX = (5, 1, 1, 1, 2, 2)
# pretrain_rxr.json: xlmr text / CLIP 512-d feats (no prob tail, so no
# MRC), candidate-first observations, 250-token instructions (:7,31-55)
RXR_TASKS = ("mlm", "sap", "sar", "sprel", "itm")
RXR_MIX = (5, 1, 1, 1, 2)


def parse_val_specs(entries):
    """``--val_traj_files`` entries: plain paths (one stream named
    'val') or ``name=path`` pairs (repeat a name to add files) — the
    reference validates val_seen AND val_unseen every valid_steps with
    per-setname metrics (main_r2r.py:155-198, 303-308)."""
    out = {}
    for e in entries:
        name, _, path = e.rpartition("=")
        out.setdefault(name or "val", []).append(path)
    return out


def build_synthetic(args, mcfg: ModelConfig):
    """Hermetic world; the val remainder splits into seen/unseen
    streams mirroring the reference's dual validation sets."""
    world = make_synthetic_world(
        num_scans=2, nodes_per_scan=20, num_items=64,
        feat_dim=mcfg.image_feat_size + mcfg.image_prob_size, seed=args.seed,
    )
    recs = make_synthetic_trajectories(world)
    n_train = int(len(recs) * 0.85)
    mk = lambda rs: TrajectoryDataset(
        rs, world.graphs, world.feat_db,
        image_feat_size=mcfg.image_feat_size,
        image_prob_size=mcfg.image_prob_size,
        max_txt_len=args.max_txt_len, max_hist_len=args.max_hist_len,
        ob_cand_pano_view=getattr(args, "ob_cand_pano_view", False) or False,
        ob_cand_extra=getattr(args, "ob_cand_extra", 4),
    )
    val = recs[n_train:]
    half = max(len(val) // 2, 1)
    return mk(recs[:n_train]), {"seen": mk(val[:half]),
                                "unseen": mk(val[half:] or val[:half])}


def build_real(args, mcfg: ModelConfig):
    from ..data.feature_db import HDF5FeatureDB

    feat_db = HDF5FeatureDB(args.img_ft_file,
                            mcfg.image_feat_size + mcfg.image_prob_size)
    recs = load_trajectory_jsonl(args.train_traj_files)
    val_specs = parse_val_specs(args.val_traj_files)
    val_recs = {name: load_trajectory_jsonl(files)
                for name, files in val_specs.items()}
    scans = sorted({r.scan for rs in ([recs] + list(val_recs.values()))
                    for r in rs})
    graphs = load_nav_graphs(args.connectivity_dir, scans)
    mk = lambda rs: TrajectoryDataset(
        rs, graphs, feat_db,
        image_feat_size=mcfg.image_feat_size,
        image_prob_size=mcfg.image_prob_size,
        max_txt_len=args.max_txt_len, max_hist_len=args.max_hist_len,
        ob_cand_pano_view=getattr(args, "ob_cand_pano_view", False) or False,
        ob_cand_extra=getattr(args, "ob_cand_extra", 4),
    )
    return mk(recs), {name: mk(rs) for name, rs in val_recs.items()}


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="HAMT-TPU proxy-task pretraining")
    p.add_argument("--output_dir", default="runs/pretrain")
    p.add_argument("--num_steps", type=int, default=200_000)
    p.add_argument("--warmup_steps", type=int, default=10_000)
    p.add_argument("--valid_steps", type=int, default=5_000)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--lr", type=float, default=5e-5)
    p.add_argument("--grad_accum", type=int, default=1)
    p.add_argument("--preset", default="r2r", choices=["r2r", "rxr"],
                   help="config preset: 'rxr' = pretrain_rxr.json "
                        "(xlmr vocab / 512-d CLIP feats / cand-first "
                        "observations / 250-token instructions / no "
                        "MRC) — unset task/txt-len/layout flags take "
                        "the preset's values")
    p.add_argument("--max_txt_len", type=int, default=None,
                   help="default 80 (r2r) / 250 (rxr preset)")
    p.add_argument("--max_hist_len", type=int, default=25)
    p.add_argument("--tasks", nargs="+", default=None)
    p.add_argument("--mix_ratio", nargs="+", type=float, default=None)
    p.add_argument("--ob_cand_pano_view", action="store_true",
                   default=None,
                   help="candidate-first observation layout for SAP/SAR "
                        "(r2r_data.py:222-261; default on under "
                        "--preset rxr, pretrain_rxr.json:31)")
    p.add_argument("--ob_cand_extra", type=int, default=4,
                   help="static padding slots beyond 37 ob tokens for "
                        "duplicate-view candidates in the cand layout")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--no_feat_table", action="store_true",
                   help="ship materialized feature batches instead of "
                        "the resident table + int32 rows")
    p.add_argument("--tiny", action="store_true",
                   help="small model (smoke tests/demos)")
    p.add_argument("--train_traj_files", nargs="+", default=None)
    p.add_argument("--val_traj_files", nargs="+", default=None,
                   help="validation stream(s): plain paths (one stream "
                        "'val') or name=path pairs, e.g. "
                        "'seen=val_seen.jsonl unseen=val_unseen.jsonl' "
                        "— every stream is validated per task each "
                        "--valid_steps with val_{name}/ metric keys "
                        "(main_r2r.py:303-308 setname suffixes)")
    p.add_argument("--img_ft_file", default=None)
    p.add_argument("--connectivity_dir", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--data_shards", type=int, default=1,
                   help="mesh 'data' axis (batch sharding)")
    p.add_argument("--model_shards", type=int, default=1,
                   help="mesh 'model' axis (tensor parallel)")
    p.add_argument("--sharded_feed", action="store_true",
                   help="multi-process runs: each process's batcher "
                        "assembles only batch/n_proc examples (seeded "
                        "per rank) and the trainer stitches the global "
                        "batch — the reference's per-rank DDP loaders "
                        "(main_r2r.py:40-92); host batch-assembly work "
                        "scales with processes")
    p.add_argument("--optim", default="adamw",
                   choices=["adamw", "adam", "radam", "ralamb",
                            "lookahead", "rangerlars"],
                   help="pretrain_src/optim zoo name")
    p.add_argument("--bert_init", default=None,
                   help="HF BERT/XLM-R weights to initialize the trunk "
                        "(torch state-dict .pt file or HF model dir; "
                        "main_r2r.py:131-144)")
    p.add_argument("--bert_type", default="bert", choices=["bert", "xlmr"])
    p.add_argument("--init_ckpt", default=None,
                   help="prior pretrain checkpoint to initialize weights "
                        "from (step resets; reference --checkpoint)")
    p.add_argument("--rng_impl", default="threefry2x32",
                   choices=["threefry2x32", "rbg"],
                   help="dropout PRNG: 'rbg' = TPU hardware "
                        "RngBitGenerator mask bits (faster; same "
                        "distribution, different bit-stream; not "
                        "sharding-invariant — see "
                        "utils/misc.py:apply_rng_impl)")
    p.add_argument("--resume", default=None,
                   help="trainer checkpoint to resume training from "
                        "(weights + step)")
    return p.parse_args(argv)


def load_bert_partial(path: str, mcfg: ModelConfig, bert_type: str = "bert"):
    """HF weights -> partial HAMT trunk tree (main_r2r.py:131-144:
    BERT init with XLM type-embedding duplication)."""
    import numpy as np

    from ..models.convert import (
        convert_hf_bert_state_dict,
        convert_hf_xlmr_state_dict,
    )

    if os.path.isdir(path):
        from transformers import AutoModel

        sd = AutoModel.from_pretrained(path).state_dict()
    else:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: np.asarray(v) for k, v in sd.items()}
    if bert_type == "xlmr":
        return convert_hf_xlmr_state_dict(
            sd, num_l_layers=mcfg.num_l_layers,
            max_position_embeddings=mcfg.max_position_embeddings)
    return convert_hf_bert_state_dict(sd, num_l_layers=mcfg.num_l_layers)


def main(argv=None):
    args = parse_args(argv)
    import dataclasses

    from ..utils.misc import apply_rng_impl

    apply_rng_impl(args.rng_impl)
    rxr = args.preset == "rxr"
    if args.tasks is None:
        args.tasks = list(RXR_TASKS if rxr else DEFAULT_TASKS)
    if args.mix_ratio is None:
        args.mix_ratio = list(RXR_MIX if rxr else DEFAULT_MIX)
    if args.max_txt_len is None:
        args.max_txt_len = 250 if rxr else 80
    if args.ob_cand_pano_view is None:
        args.ob_cand_pano_view = rxr
    mcfg = get_preset(args.preset).model
    if args.bf16:
        mcfg = dataclasses.replace(mcfg, dtype="bfloat16")
    if args.tiny:
        mcfg = dataclasses.replace(
            mcfg, hidden_size=64, num_attention_heads=4,
            intermediate_size=128, num_l_layers=2, num_x_layers=1,
            num_h_pano_layers=1, image_feat_size=32, image_prob_size=16,
            # must cover max_txt_len: OOB position lookups are NaN-fill
            # (the rxr preset defaults 250-token instructions)
            max_position_embeddings=max(128, args.max_txt_len + 2),
            max_action_steps=32,
        )
    if args.max_txt_len > mcfg.max_position_embeddings:
        raise ValueError(
            f"max_txt_len {args.max_txt_len} exceeds the model's "
            f"max_position_embeddings {mcfg.max_position_embeddings} — "
            f"position lookups would go out of range")

    if args.synthetic:
        train_ds, val_dss = build_synthetic(args, mcfg)
    else:
        assert args.train_traj_files and args.img_ft_file and args.connectivity_dir
        train_ds, val_dss = build_real(args, mcfg)

    feat_table = None
    if not args.no_feat_table:
        # index-mode feature transport: one resident (N, 36, D+P) table
        # in HBM (bf16 with --bf16 — MRC's prob-tail softmax labels are
        # then bf16-approximate); batches ship int32 rows instead of
        # ~50 MB of features (model.py:expand_index_batch)
        from ..data.feature_db import build_feature_table

        table, offsets = build_feature_table(train_ds.graphs,
                                             train_ds.feat_db)
        if args.bf16:
            import jax.numpy as jnp

            table = jnp.asarray(table, jnp.bfloat16)
        feat_table = table
        train_ds.set_feat_offsets(offsets)
        for ds in val_dss.values():
            ds.set_feat_offsets(offsets)

    import jax as _jax

    # per-rank batcher seeds under sharded feeding: each process draws
    # DIFFERENT training examples (DDP sample diversity); the val
    # batcher stays same-seeded (identical-replica validation)
    rank_off = (_jax.process_index()
                if (args.sharded_feed and _jax.process_count() > 1) else 0)
    batcher = PretrainBatcher(train_ds, seed=args.seed + 1000 * rank_off)
    val_batchers = {name: PretrainBatcher(ds, seed=args.seed + 1)
                    for name, ds in val_dss.items()}
    mesh = None
    if args.data_shards * args.model_shards > 1:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(num_data=args.data_shards,
                         num_model=args.model_shards)
    trainer = PretrainTrainer(
        mcfg, batcher, tasks=args.tasks, mix_ratio=args.mix_ratio,
        batch_size=args.batch_size, lr=args.lr,
        warmup_steps=args.warmup_steps, total_steps=args.num_steps,
        grad_accum=args.grad_accum, seed=args.seed, mesh=mesh,
        optim=args.optim, feat_table=feat_table,
        host_sharded=args.sharded_feed,
    )
    # initialization pathways (main_r2r.py:131-148): HF BERT/XLM-R
    # trunk init, a prior checkpoint, or resume
    if args.bert_init:
        from ..models.convert import merge_params

        partial = load_bert_partial(args.bert_init, mcfg, args.bert_type)
        trainer.set_params(merge_params(trainer.params, {"hamt": partial}))
    if args.init_ckpt:
        import flax.serialization as fser

        with open(args.init_ckpt, "rb") as f:
            blob = pickle.load(f)
        trainer.set_params(
            fser.from_state_dict(trainer.params, blob["params"]))
    start_step = trainer.resume(args.resume) if args.resume else 0
    logger = MetricsLogger(args.output_dir)

    # async step dispatch; sync (and measure ex/s like the reference,
    # main_r2r.py:283-301) only at log points
    import time

    t_last, n_since = time.perf_counter(), 0
    for step in range(start_step, args.num_steps):
        task, loss, aux = trainer.train_step(sync=False)
        n_since += 1
        if (step + 1) % max(args.valid_steps // 10, 1) == 0:
            import numpy as _np

            loss = float(loss)  # sync point
            now = time.perf_counter()
            ex_s = n_since * args.batch_size / (now - t_last)
            t_last, n_since = now, 0
            logger.log(step + 1, {f"{task}/loss": loss,
                                  "ex_per_sec": round(ex_s, 2), **{
                f"{task}/{k}": float(_np.asarray(v))
                for k, v in aux.items()}})
        if (step + 1) % args.valid_steps == 0 or step + 1 == args.num_steps:
            # every named stream, like the reference's seen+unseen pass
            # (main_r2r.py:303-308)
            flat = {}
            for name, vb in val_batchers.items():
                val = trainer.validate(vb)
                flat.update({f"val_{name}/{t}/{k}": v
                             for t, stats in val.items()
                             for k, v in stats.items()})
            logger.log(step + 1, flat)
            trainer.save(os.path.join(args.output_dir,
                                      f"model_step_{step + 1}.pkl"))
    print(json.dumps({"final_step": trainer.state.step}))


if __name__ == "__main__":
    main()
