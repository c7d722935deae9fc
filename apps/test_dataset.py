"""Dataset smoke: dump a few frames to debug/ (contract:
/root/reference/apps/test_dataset.py, docs/preprocess.md:7-9)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from log_tpu.utils.command import update_global_variable
from log_tpu.utils.config import Config, load_object


def main():
    import cv2

    args, cfg = Config.load_args(usage="test dataset")
    cfg = update_global_variable(cfg, cfg)
    dataset = load_object(cfg.dataset.module, cfg.dataset.args)
    os.makedirs("debug", exist_ok=True)
    print(f"dataset: {len(dataset)} items")
    for i in range(min(5, len(dataset))):
        item = dataset[i]
        img = item["image"]
        if isinstance(img, np.ndarray):
            out = (img[:, :, ::-1] * 255).astype(np.uint8)
            cv2.imwrite(f"debug/{i:06d}.jpg", out)
            print(i, item["imgname"], img.shape)
        else:
            print(i, item["imgname"], "(image not read)")


if __name__ == "__main__":
    main()
