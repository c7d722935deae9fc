"""Generate a synthetic scene on disk in the exact layout the COLMAP pipeline
expects (images/ + intri.yml/extri.yml + sparse/0/sparse.npz), so the full
ingest -> cache -> train -> demo path runs hermetically without real data.

Usage: python apps/make_synthetic_scene.py [outdir] [n_gaussians] [n_views] [H] [W]
"""
from __future__ import annotations

import os
import sys
from os.path import join

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import cv2

    outdir = sys.argv[1] if len(sys.argv) > 1 else "data/synthetic"
    n_gauss = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    n_views = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    H = int(sys.argv[4]) if len(sys.argv) > 4 else 240
    W = int(sys.argv[5]) if len(sys.argv) > 5 else 320

    from log_tpu.dataset.camera_utils import write_camera
    from log_tpu.dataset.synthetic import SyntheticDataset

    ds = SyntheticDataset(n_gaussians=n_gauss, n_views=n_views, H=H, W=W, seed=0)
    os.makedirs(join(outdir, "images", "cam"), exist_ok=True)
    cameras = {}
    for i, cam in enumerate(ds.cameras):
        name = f"cam/{i:04d}"
        img = (np.clip(ds.images[i], 0, 1)[:, :, ::-1] * 255).astype(np.uint8)
        cv2.imwrite(join(outdir, "images", name + ".jpg"), img)
        cameras[name] = {
            "K": cam["K"],
            "R": cam["R"],
            "T": cam["T"].reshape(3, 1),
            "H": H,
            "W": W,
            "dist": np.zeros((1, 5)),
        }
    write_camera(cameras, outdir)
    os.makedirs(join(outdir, "sparse", "0"), exist_ok=True)
    pc = ds.noisy_pointcloud()
    np.savez(
        join(outdir, "sparse", "0", "sparse.npz"),
        xyz=pc["xyz"],
        rgb=(pc["colors"] * 255).astype(np.uint8),
    )
    print(f"wrote synthetic scene to {outdir}: {n_views} views {H}x{W}, "
          f"{n_gauss} gaussians")


if __name__ == "__main__":
    main()
