"""End-to-end image pretraining orchestration (ViT in the loop).

Parity target: ``pretrain_src/main_r2r_image.py:91-262`` — the variant
where panorama FEATURES are replaced by a trainable ViT over raw
panorama pixels (LMDB store), trained at small batch with gradient
accumulation and the rangerlars optimizer
(``config/pretrain_r2r_e2e.json:14-24``). The reference file is broken
in-tree (SURVEY §2.4); behavior is reconstructed from the image_*
modules' intent.

Runs hermetically with ``--synthetic`` (synthetic panoramas + fixture
trajectories) or against a real LMDB/npy pano store + trajectory JSONL.
"""

from __future__ import annotations

import argparse
import json
import os

from ..configs import ModelConfig, get_preset
from ..pretrain import PretrainTrainer
from ..pretrain.image_data import (
    DEFAULT_IMAGE_SIZE,
    ImagePretrainBatcher,
    LMDBPanoImageStore,
    NpyDirPanoImageStore,
    SyntheticPanoImageStore,
)
from ..pretrain.image_model import init_image_pretrain_params
from ..utils.logging import MetricsLogger
from ..vision.vit import ViTConfig
from .pretrain import DEFAULT_MIX, DEFAULT_TASKS, build_real, build_synthetic


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="HAMT-TPU end-to-end image pretraining")
    p.add_argument("--output_dir", default="runs/image_pretrain")
    p.add_argument("--num_steps", type=int, default=200_000)
    p.add_argument("--warmup_steps", type=int, default=10_000)
    p.add_argument("--valid_steps", type=int, default=5_000)
    # the reference e2e config trains at batch 1 (pretrain_r2r_e2e.json)
    # with gradient accumulation
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--grad_accum", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--optim", default="rangerlars",
                   choices=["adamw", "adam", "radam", "ralamb",
                            "lookahead", "rangerlars"],
                   help="e2e default rangerlars (pretrain_r2r_e2e.json:14)")
    p.add_argument("--max_txt_len", type=int, default=80)
    p.add_argument("--max_hist_len", type=int, default=25)
    p.add_argument("--tasks", nargs="+", default=list(DEFAULT_TASKS))
    p.add_argument("--mix_ratio", nargs="+", type=float,
                   default=list(DEFAULT_MIX))
    p.add_argument("--image_size", type=int, nargs=2,
                   default=list(DEFAULT_IMAGE_SIZE),
                   help="STORE record size (the reference LMDB is "
                        "248x330, image_data.py:20-22); the ViT input "
                        "size is --vit_image_size via the transform")
    p.add_argument("--vit_image_size", type=int, default=224,
                   help="ViT input resolution the transform produces")
    p.add_argument("--transform", default="timm", choices=["timm", "none"],
                   help="'timm': the reference pipeline between store "
                        "and ViT (image_data.py:70-80) — train stream "
                        "RandomResizedCrop+flip, val stream bicubic "
                        "resize+center-crop at crop_pct 0.9, mean/std "
                        "0.5; 'none': raw store-size pixels straight "
                        "into the ViT (hermetic smoke tests)")
    p.add_argument("--hflip", type=float, default=0.5,
                   help="train-stream horizontal-flip prob (timm "
                        "create_transform default)")
    p.add_argument("--re_prob", type=float, default=0.0,
                   help="train-stream random-erasing prob "
                        "(image_data.py:39 default 0.0)")
    p.add_argument("--re_mode", default="const", choices=["const", "rand"],
                   help="random-erasing fill mode (image_data.py:38)")
    p.add_argument("--auto_augment", default=None,
                   help="NOT implemented (reference default None, "
                        "image_data.py:37); a non-None value raises — "
                        "see PARITY.md")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="small model + small images (smoke tests/demos)")
    p.add_argument("--lmdb_path", default=None,
                   help="reference-format pano LMDB (image_data.py:20-22)")
    p.add_argument("--npy_dir", default=None,
                   help="{scan}_{vp}.npy panorama directory store")
    p.add_argument("--aug_traj_files", nargs="+", default=None,
                   help="augmented trajectory stream, mixed with GT "
                        "(the reference's r2raug_* dataloaders)")
    p.add_argument("--train_traj_files", nargs="+", default=None)
    p.add_argument("--val_traj_files", nargs="+", default=None)
    p.add_argument("--img_ft_file", default=None,
                   help="feature HDF5 for the MRC soft labels "
                        "(ViT class probs, r2r_tasks.py:155-226)")
    p.add_argument("--connectivity_dir", default=None)
    p.add_argument("--vit_ckpt", default=None,
                   help="pretrained ViT-B/16 init (torch/timm .pth or "
                        ".npz); the reference starts e2e training from "
                        "timm weights")
    p.add_argument("--init_ckpt", default=None,
                   help="prior pretrain checkpoint (weights only)")
    p.add_argument("--resume", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--data_shards", type=int, default=1)
    p.add_argument("--sharded_feed", action="store_true",
                   help="multi-process runs: per-rank batchers at "
                        "batch/n_proc, stitched into the global batch "
                        "(run/pretrain.py --sharded_feed twin)")
    p.add_argument("--model_shards", type=int, default=1)
    p.add_argument("--rng_impl", default="threefry2x32",
                   choices=["threefry2x32", "rbg"],
                   help="dropout PRNG (see utils/misc.py:apply_rng_impl)")
    p.add_argument("--device_bench", type=int, default=0,
                   help="measure N ViT-in-the-loop update iterations "
                        "per task with the batch resident in HBM — the "
                        "compute-bound ex/s of the e2e image-pretrain "
                        "step (the featurizer --device_bench "
                        "methodology), then exit")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import dataclasses

    import jax

    from ..utils.misc import apply_rng_impl

    apply_rng_impl(args.rng_impl)
    mcfg = get_preset("r2r").model
    # the ViT sees --vit_image_size crops (the transform's output);
    # --image_size is the raw store record size (reference 248x330)
    vit_hw = ((args.vit_image_size,) * 2 if args.transform == "timm"
              else tuple(args.image_size))
    vit_kwargs = dict(img_size=vit_hw,
                      dtype="bfloat16" if args.bf16 else "float32")
    if args.bf16:
        mcfg = dataclasses.replace(mcfg, dtype="bfloat16")
    if args.tiny:
        mcfg = dataclasses.replace(
            mcfg, hidden_size=64, num_attention_heads=4,
            intermediate_size=128, num_l_layers=2, num_x_layers=1,
            num_h_pano_layers=1, image_feat_size=48, image_prob_size=16,
            # must cover max_txt_len (OOB position lookups NaN-fill)
            max_position_embeddings=max(128, args.max_txt_len + 2),
            max_action_steps=32,
        )
        args.transform = "none"
        args.image_size = (32, 32)
        vit_kwargs.update(img_size=(32, 32), patch_size=16,
                          hidden_size=48, num_layers=2, num_heads=4,
                          num_classes=16)
    else:
        # ViT feature dim must equal the trunk's image_feat_size; the
        # MRC head classifies over the ViT's own class logits
        vit_kwargs.update(hidden_size=mcfg.image_feat_size,
                          num_classes=mcfg.image_prob_size)
    vit_cfg = ViTConfig(**vit_kwargs)

    if args.synthetic:
        train_ds, val_dss = build_synthetic(args, mcfg)
        store = SyntheticPanoImageStore(tuple(args.image_size))
    else:
        assert args.train_traj_files and args.img_ft_file and args.connectivity_dir
        assert args.lmdb_path or args.npy_dir, "need a panorama store"
        train_ds, val_dss = build_real(args, mcfg)
        store = (LMDBPanoImageStore(args.lmdb_path, tuple(args.image_size))
                 if args.lmdb_path
                 else NpyDirPanoImageStore(args.npy_dir,
                                           tuple(args.image_size)))

    import jax as _jax

    rank_off = (_jax.process_index()
                if (args.sharded_feed and _jax.process_count() > 1) else 0)
    train_tf = val_tf = None
    if args.transform == "timm":
        from ..vision.transforms import ImageTransform

        # train stream = timm is_training pipeline, val stream =
        # deterministic resize+crop (image_data.py:70-80 + the
        # is_training flags at main_r2r_image.py:149,162)
        train_tf = ImageTransform(
            out_size=args.vit_image_size, train=True, hflip=args.hflip,
            re_prob=args.re_prob, re_mode=args.re_mode,
            auto_augment=args.auto_augment,
            seed=args.seed + 7000 + 1000 * rank_off)
        val_tf = ImageTransform(out_size=args.vit_image_size, train=False)
    batcher = ImagePretrainBatcher(train_ds, store, transform=train_tf,
                                   seed=args.seed + 1000 * rank_off)
    # dual val streams (main_r2r_image.py builds val + val2 databases,
    # :151-176) — one batcher per named stream
    val_batchers = {name: ImagePretrainBatcher(ds, store, transform=val_tf,
                                               seed=args.seed + 1)
                    for name, ds in val_dss.items()}
    aug_batcher = None
    if args.aug_traj_files:
        from ..pretrain.trajectory_data import (
            TrajectoryDataset,
            load_trajectory_jsonl,
        )

        aug_recs = load_trajectory_jsonl(args.aug_traj_files)
        aug_ds = TrajectoryDataset(
            aug_recs, train_ds.graphs, train_ds.feat_db,
            image_feat_size=mcfg.image_feat_size,
            image_prob_size=mcfg.image_prob_size,
            max_txt_len=args.max_txt_len, max_hist_len=args.max_hist_len)
        aug_batcher = ImagePretrainBatcher(aug_ds, store, transform=train_tf,
                                           seed=args.seed + 2)

    model, params = init_image_pretrain_params(
        mcfg, vit_cfg, jax.random.PRNGKey(args.seed),
        max_hist_len=train_ds.max_hist_len, instr_len=train_ds.max_txt_len)
    if args.vit_ckpt:
        from ..models.convert import load_vit_checkpoint, merge_params
        from ..vision.vit import ViT

        vit_params = load_vit_checkpoint(args.vit_ckpt, ViT(vit_cfg))
        params = merge_params(params, {"vit": vit_params})

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
        optim=args.optim, model=model, params=params,
        aug_batcher=aug_batcher, host_sharded=args.sharded_feed,
    )
    if args.init_ckpt:
        import pickle

        import flax.serialization as fser

        with open(args.init_ckpt, "rb") as f:
            blob = pickle.load(f)
        trainer.set_params(
            fser.from_state_dict(trainer.params, blob["params"]))
    start_step = trainer.resume(args.resume) if args.resume else 0

    if args.device_bench:
        # compute-bound throughput of the ACTUAL e2e update (ViT over
        # raw pixels + trunk + heads + optimizer), batch resident in
        # HBM: isolates MXU time from the host/link image supply, the
        # measurement BASELINE.md previously only derived by arithmetic
        # from the featurizer row
        import time

        import jax.numpy as jnp

        rng = jax.random.PRNGKey(0)
        p_, o_ = trainer.state.params, trainer.state.opt_state
        results = {}
        for task in args.tasks:
            if task == "itm" and args.batch_size < 2:
                continue
            batch = jax.tree.map(jnp.asarray,
                                 batcher.batch(task, args.batch_size))
            jax.block_until_ready(batch)
            # compile + warm outside the timed loop
            p_, o_, loss, _ = trainer._update(p_, o_, batch, rng, task,
                                              trainer._feat_table)
            jax.block_until_ready(loss)
            t0 = time.perf_counter()
            for _ in range(args.device_bench):
                p_, o_, loss, _ = trainer._update(p_, o_, batch, rng,
                                                  task,
                                                  trainer._feat_table)
            jax.block_until_ready(loss)
            dt = time.perf_counter() - t0
            results[task] = round(
                args.device_bench * args.batch_size / dt, 3)
        print(json.dumps({"device_bench_iters": args.device_bench,
                          "batch_size": args.batch_size,
                          "ex_per_sec_compute_bound": results}))
        return

    logger = MetricsLogger(args.output_dir)
    # async step dispatch; sync (and measure ex/s like the reference,
    # main_r2r_image.py throughput logging) only at log points
    import time

    import numpy as _np

    t_last, n_since = time.perf_counter(), 0
    for step in range(start_step, args.num_steps):
        task, loss, aux = trainer.train_step(sync=False)
        n_since += 1
        if (step + 1) % max(args.valid_steps // 10, 1) == 0:
            loss = float(loss)  # sync point
            now = time.perf_counter()
            ex_s = n_since * args.batch_size / (now - t_last)
            t_last, n_since = now, 0
            logger.log(step + 1, {f"{task}/loss": loss,
                                  "ex_per_sec": round(ex_s, 2), **{
                f"{task}/{k}": float(_np.asarray(v))
                for k, v in aux.items()}})
        if (step + 1) % args.valid_steps == 0 or step + 1 == args.num_steps:
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
