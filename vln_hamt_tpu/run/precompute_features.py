"""Panorama feature precomputation CLI.

Parity target: ``preprocess/precompute_img_features_vit.py`` — for every
(scan, viewpoint), produce a (36, 768 + 1000) ViT feature matrix in
gzip HDF5 keyed ``{scan}_{viewpoint}``. The reference fans out one GPU
process per worker, each owning a rendering MatterSim; here:

- view synthesis: the native equirect sampler (``navsim_sample_panorama``)
  on host threads, fed from a directory of equirectangular panoramas
  (``{scan}_{viewpoint}.jpg|png|npy``) — covering MatterSim's only
  rendering role (SURVEY §2.2);
- the reference image geometry END TO END: render 640x480 at VFOV 60
  (precompute_img_features_vit.py:37-39) then the timm eval transform
  — bicubic resize shorter-side -> floor(224/0.9)=248, center-crop
  224, normalize mean=std=0.5 (vision/transforms.py) — so features
  produced here are interchangeable with reference-extracted ones;
- inference: one jitted bf16 ViT on TPU over batched panoramas with
  async dispatch overlap.

``--synthetic N`` generates N synthetic viewpoints instead, for
benchmarking the device pipeline without Matterport data.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Tuple

import numpy as np


def load_viewpoint_ids(connectivity_dir: str):
    """scans.txt + connectivity enumeration (preprocess/utils.py:5-14)."""
    with open(os.path.join(connectivity_dir, "scans.txt")) as f:
        scans = [x.strip() for x in f if x.strip()]
    out = []
    for scan in scans:
        with open(os.path.join(connectivity_dir,
                               f"{scan}_connectivity.json")) as f:
            for item in json.load(f):
                if item["included"]:
                    out.append((scan, item["image_id"]))
    return out


def _load_equirect(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path)
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), dtype=np.uint8)


def equirect_view_source(pano_dir: str, viewpoint_ids, width: int,
                         height: int, vfov: float, workers: int = 4,
                         transform=None) -> Iterator[Tuple[str, str, np.ndarray]]:
    """Sample 36 views per viewpoint with the native sampler, using a
    thread pool so view synthesis (and the host-side timm transform)
    overlaps device inference."""
    from ..native import sample_panorama

    def job(sv):
        scan, vp = sv
        for ext in (".npy", ".jpg", ".png"):
            p = os.path.join(pano_dir, f"{scan}_{vp}{ext}")
            if os.path.exists(p):
                eq = _load_equirect(p)
                views = sample_panorama(eq, vfov, width, height)
                if transform is not None:
                    views = transform(views)
                return scan, vp, views
        raise FileNotFoundError(f"no panorama for {scan}_{vp} in {pano_dir}")

    with ThreadPoolExecutor(workers) as pool:
        yield from pool.map(job, viewpoint_ids)


def synthetic_view_source(n: int, width: int, height: int, transform=None):
    rng = np.random.default_rng(0)
    for i in range(n):
        views = rng.integers(0, 255, (36, height, width, 3), dtype=np.uint8)
        if transform is not None:
            views = transform(views)
        yield ("synthscan", f"vp{i:05d}", views)


def main(argv=None):
    p = argparse.ArgumentParser(description="36-view ViT feature extraction")
    p.add_argument("--output_file", required=True)
    p.add_argument("--connectivity_dir", default=None)
    p.add_argument("--pano_dir", default=None,
                   help="dir of equirect panoramas {scan}_{vp}.{npy,jpg,png}")
    p.add_argument("--synthetic", type=int, default=0,
                   help="featurize N synthetic viewpoints instead")
    p.add_argument("--image_size", type=int, nargs=2, default=(224, 224),
                   help="ViT input size (after the transform)")
    p.add_argument("--render_size", type=int, nargs=2, default=(480, 640),
                   help="(H, W) the 36 views are rendered at before the "
                        "transform — the reference renders 640x480 "
                        "(precompute_img_features_vit.py:37-38)")
    p.add_argument("--transform", default="timm", choices=["timm", "none"],
                   help="'timm': bicubic resize shorter->floor(224/0.9), "
                        "center-crop 224, mean/std 0.5 (the reference's "
                        "resolve_data_config pipeline); 'none': render "
                        "directly at --image_size and normalize with "
                        "ImageNet stats (pre-round-5 behavior, NOT "
                        "checkpoint-compatible)")
    p.add_argument("--crop_pct", type=float, default=0.9)
    p.add_argument("--vfov_deg", type=float, default=60.0)
    p.add_argument("--panos_per_batch", type=int, default=4)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--vit_ckpt", default=None,
                   help="pretrained ViT-B/16 checkpoint (torch/timm .pth "
                        "or .npz state dict); converted via "
                        "convert_vit_state_dict (the reference loads timm "
                        "pretrained weights, "
                        "precompute_img_features_vit.py:69-77)")
    p.add_argument("--device_bench", type=int, default=0,
                   help="measure N compute-bound iterations with the "
                        "batch resident on device (separates MXU time "
                        "from the host link; reports the co-located "
                        "throughput bound)")
    args = p.parse_args(argv)

    import jax

    from ..vision import PanoramaFeaturizer, init_vit_params, vit_base_patch16
    from ..vision.featurizer import IMAGENET_MEAN, IMAGENET_STD, hdf5_writer
    from ..vision.transforms import eval_transform

    h, w = args.image_size
    model = vit_base_patch16(img_size=(h, w),
                             dtype="bfloat16" if args.bf16 else "float32")
    if args.vit_ckpt:
        from ..models.convert import load_vit_checkpoint

        params = load_vit_checkpoint(args.vit_ckpt, model)
    else:
        params = init_vit_params(model, jax.random.PRNGKey(0))

    if args.transform == "timm":
        assert h == w, "--transform timm produces square crops"
        transform = lambda views: eval_transform(views, h, args.crop_pct)
        rh, rw = args.render_size
        norm = {}  # featurizer default: the reference's mean=std=0.5
    else:
        transform = None
        rh, rw = h, w
        norm = dict(mean=IMAGENET_MEAN, std=IMAGENET_STD)
    feat = PanoramaFeaturizer(model, params,
                              panos_per_batch=args.panos_per_batch, **norm)

    if args.synthetic:
        source = synthetic_view_source(args.synthetic, rw, rh, transform)
        total = args.synthetic
    else:
        assert args.connectivity_dir and args.pano_dir
        vps = load_viewpoint_ids(args.connectivity_dir)
        source = equirect_view_source(args.pano_dir, vps, rw, rh,
                                      np.deg2rad(args.vfov_deg),
                                      transform=transform)
        total = len(vps)

    # warm up the jitted ViT so the (minutes-long, one-time) XLA compile
    # does not pollute the throughput measurement
    warm = np.zeros((36 * args.panos_per_batch, h, w, 3), np.uint8)
    jax.block_until_ready(feat.featurize_images(warm))

    if args.device_bench:
        # compute-bound bound: input already resident in HBM, so the
        # loop measures pure ViT device time (what a co-located host
        # would sustain if image supply keeps up)
        dev_images = jax.device_put(
            np.random.default_rng(0).integers(
                0, 255, warm.shape, dtype=np.uint8))
        jax.block_until_ready(feat._featurize(feat.params, dev_images))
        t0 = time.perf_counter()
        for _ in range(args.device_bench):
            out = feat._featurize(feat.params, dev_images)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        ips = args.device_bench * warm.shape[0] / dt
        print(json.dumps({
            "device_bench_iters": args.device_bench,
            "images_per_sec_compute_bound": round(ips, 1),
            "viewpoints_per_sec_compute_bound": round(ips / 36, 2),
        }))

    writer = hdf5_writer(args.output_file)
    t0 = time.perf_counter()
    out = feat.extract(source, writer=writer)
    dt = time.perf_counter() - t0
    writer.close()
    print(json.dumps({
        "viewpoints": len(out),
        "seconds": round(dt, 2),
        "viewpoints_per_sec": round(len(out) / dt, 2),
        "views_per_sec": round(36 * len(out) / dt, 1),
    }))


if __name__ == "__main__":
    main()
