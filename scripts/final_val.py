"""Protocol-correct final validation of a finished training run: load the
final checkpoint, restore the training-time model state (enable_sh — the
val split's config carries no model_state, same surface as the reference
where demo splits set it explicitly), and run Trainer.make_validation
(white background + least-squares view-correction gain + PSNR/SSIM), i.e.
the SAME protocol that produced the in-training val curve
(LoG/utils/trainer.py:298-364).

Usage: python scripts/final_val.py [cfg] [ckpt]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CFG = sys.argv[1] if len(sys.argv) > 1 else "config/synthetic_conv/train.yml"
CKPT = (sys.argv[2] if len(sys.argv) > 2
        else "output/r4_quality/log/model_tree_full.pth")


def main():
    from log_tpu.utils.command import load_statedict, update_global_variable
    from log_tpu.utils.config import Config, load_object
    from log_tpu.utils.trainer import Trainer

    cfg = Config.load(CFG)
    cfg = update_global_variable(cfg, cfg)
    cfg["split"] = "val"
    exp = os.path.join(os.path.dirname(CKPT), "final_val")
    cfg["exp"] = exp
    model = load_object(cfg.model.module, cfg.model.args)
    model.base_iter = cfg.get("base_iter", 100)
    model.load_state_dict(load_statedict(CKPT), split="val")
    model.set_state(enable_sh=True)
    renderer = load_object(cfg.train.render.module, cfg.train.render.args)
    trainer = Trainer(cfg, model, renderer, logdir=exp)
    trainer.make_validation(999999)


if __name__ == "__main__":
    main()
