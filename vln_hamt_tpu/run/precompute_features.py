"""Panorama feature precomputation CLI.

Parity target: ``preprocess/precompute_img_features_vit.py`` — for every
(scan, viewpoint), produce a (36, 768 + 1000) ViT feature matrix in
gzip HDF5 keyed ``{scan}_{viewpoint}``. The reference fans out one GPU
process per worker, each owning a rendering MatterSim; here:

- view synthesis: the native equirect sampler (``navsim_sample_panorama``)
  on host threads, fed from a directory of equirectangular panoramas
  (``{scan}_{viewpoint}.jpg|png|npy``) — covering MatterSim's only
  rendering role (SURVEY §2.2);
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
                         height: int, vfov: float,
                         workers: int = 4) -> Iterator[Tuple[str, str, np.ndarray]]:
    """Sample 36 views per viewpoint with the native sampler, using a
    thread pool so view synthesis overlaps device inference."""
    from ..native import sample_panorama

    def job(sv):
        scan, vp = sv
        for ext in (".npy", ".jpg", ".png"):
            p = os.path.join(pano_dir, f"{scan}_{vp}{ext}")
            if os.path.exists(p):
                eq = _load_equirect(p)
                return scan, vp, sample_panorama(eq, vfov, width, height)
        raise FileNotFoundError(f"no panorama for {scan}_{vp} in {pano_dir}")

    with ThreadPoolExecutor(workers) as pool:
        yield from pool.map(job, viewpoint_ids)


def synthetic_view_source(n: int, width: int, height: int):
    rng = np.random.default_rng(0)
    for i in range(n):
        yield ("synthscan", f"vp{i:05d}",
               rng.integers(0, 255, (36, height, width, 3), dtype=np.uint8))


def main(argv=None):
    p = argparse.ArgumentParser(description="36-view ViT feature extraction")
    p.add_argument("--output_file", required=True)
    p.add_argument("--connectivity_dir", default=None)
    p.add_argument("--pano_dir", default=None,
                   help="dir of equirect panoramas {scan}_{vp}.{npy,jpg,png}")
    p.add_argument("--synthetic", type=int, default=0,
                   help="featurize N synthetic viewpoints instead")
    p.add_argument("--image_size", type=int, nargs=2, default=(224, 224))
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
    from ..vision.featurizer import hdf5_writer

    h, w = args.image_size
    model = vit_base_patch16(img_size=(h, w),
                             dtype="bfloat16" if args.bf16 else "float32")
    if args.vit_ckpt:
        from ..models.convert import load_vit_checkpoint

        params = load_vit_checkpoint(args.vit_ckpt, model)
    else:
        params = init_vit_params(model, jax.random.PRNGKey(0))
    feat = PanoramaFeaturizer(model, params,
                              panos_per_batch=args.panos_per_batch)

    if args.synthetic:
        source = synthetic_view_source(args.synthetic, w, h)
        total = args.synthetic
    else:
        assert args.connectivity_dir and args.pano_dir
        vps = load_viewpoint_ids(args.connectivity_dir)
        source = equirect_view_source(args.pano_dir, vps, w, h,
                                      np.deg2rad(args.vfov_deg))
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
