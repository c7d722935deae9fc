"""Point-cloud projection smoke: render the raw sparse cloud as fixed-radius
Gaussians through the full rasterizer — verifies camera conventions end to end
(contract: /root/reference/apps/test_pointcloud.py, docs/preprocess.md:11-17).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from log_tpu.utils.command import update_global_variable
from log_tpu.utils.config import Config, load_object


def main():
    import cv2

    args, cfg = Config.load_args(usage="test pointcloud")
    cfg = update_global_variable(cfg, cfg)
    dataset = load_object(cfg.dataset.module, cfg.dataset.args)
    from log_tpu.model.base_gaussian import BaseGaussian
    from log_tpu.render.renderer import NaiveRendererAndLoss
    from log_tpu.utils.file import load_pointcloud

    xyz, rgb = load_pointcloud(cfg.PLYNAME, scale3d=cfg.get("scale3d", 1.0))
    radius = cfg.get("point_radius", 0.01)
    n = xyz.shape[0]
    model = BaseGaussian.create_from_record(
        {
            "xyz": xyz,
            "colors": rgb,
            "scaling": np.full((n, 3), radius, np.float32),
            "opacity": np.full((n,), 0.9, np.float32),
        },
        sh_degree=0,
    )
    renderer = NaiveRendererAndLoss(split="demo", background=(1.0, 1.0, 1.0))
    os.makedirs("debug", exist_ok=True)
    for i in range(min(5, len(dataset))):
        item = dataset[i]
        batch = {
            "camera": {k: np.asarray(v)[None] for k, v in item["camera"].items()}
        }
        out = renderer.vis(batch, model)
        vis = renderer.tensor_to_bgr(out["render"][0])
        if isinstance(item.get("image"), np.ndarray):
            gt = (item["image"][:, :, ::-1] * 255).astype(np.uint8)
            vis = np.hstack([vis, gt])
        cv2.imwrite(f"debug/pointcloud_{i:06d}.jpg", vis)
        print("wrote", f"debug/pointcloud_{i:06d}.jpg")


if __name__ == "__main__":
    main()
