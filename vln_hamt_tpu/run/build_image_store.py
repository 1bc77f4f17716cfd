"""Raw panorama store builder for end-to-end pretraining.

Parity target: ``preprocess/build_image_lmdb.py`` — render and resize
the 36 views of every viewpoint to (248, 330) uint8 and store one
record per viewpoint. View synthesis uses the native equirect sampler;
the sink is LMDB when the package is available, else a ``.npy``
directory (both readable by ``pretrain.image_data`` stores).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from .precompute_features import _load_equirect, load_viewpoint_ids


def main(argv=None):
    p = argparse.ArgumentParser(description="build raw 36-view image store")
    p.add_argument("--connectivity_dir", required=True)
    p.add_argument("--pano_dir", required=True)
    p.add_argument("--output", required=True,
                   help=".lmdb path or directory for .npy records")
    p.add_argument("--height", type=int, default=248)
    p.add_argument("--width", type=int, default=330)
    p.add_argument("--vfov_deg", type=float, default=60.0)
    args = p.parse_args(argv)

    from ..native import sample_panorama

    vps = load_viewpoint_ids(args.connectivity_dir)
    use_lmdb = args.output.endswith(".lmdb")
    if use_lmdb:
        import lmdb

        env = lmdb.open(args.output, map_size=int(1e12))
    else:
        os.makedirs(args.output, exist_ok=True)

    t0 = time.perf_counter()
    for scan, vp in vps:
        for ext in (".npy", ".jpg", ".png"):
            path = os.path.join(args.pano_dir, f"{scan}_{vp}{ext}")
            if os.path.exists(path):
                break
        eq = _load_equirect(path)
        views = sample_panorama(eq, np.deg2rad(args.vfov_deg),
                                args.width, args.height)
        if use_lmdb:
            with env.begin(write=True) as txn:
                txn.put(f"{scan}_{vp}".encode("ascii"), views.tobytes())
        else:
            np.save(os.path.join(args.output, f"{scan}_{vp}.npy"), views)
    dt = time.perf_counter() - t0
    print(json.dumps({"viewpoints": len(vps), "seconds": round(dt, 2)}))


if __name__ == "__main__":
    main()
