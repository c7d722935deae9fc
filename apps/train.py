"""THE entry point: train / val / demo_* splits driven by YAML configs.

Contract: /root/reference/apps/train.py — same CLI
(`python apps/train.py --cfg X.yml split train key value ...`), same base_iter
heuristic, same demo warm-up + timed render loop + ffmpeg video, same
validate_for_metric gt/renders dump. Reference configs work unchanged (LoG.*
module paths are remapped to log_tpu.*).
"""
from __future__ import annotations

import os
import sys
import time
from os.path import join

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from log_tpu.utils.command import (
    copy_git_tracked_files,
    load_statedict,
    update_global_variable,
)
from log_tpu.utils.config import Config, load_object


def _batchify(item):
    batch = {"camera": {k: np.asarray(v)[None] for k, v in item["camera"].items()}}
    for key in ("index", "true_index"):
        if key in item:
            batch[key] = np.asarray([item[key]])
    for key in ("image", "mask", "mask_ignore"):
        if key in item and isinstance(item[key], np.ndarray):
            batch[key] = item[key][None]
    if "imgname" in item:
        batch["imgname"] = [item["imgname"]]
    return batch


def demo(cfg, model, device=None):
    import cv2

    dataset = load_object(cfg[cfg.split].dataset.module, cfg[cfg.split].dataset.args)
    if "render" in cfg[cfg.split]:
        renderer = load_object(
            cfg[cfg.split].render.module, cfg[cfg.split].render.args
        )
    else:
        renderer = load_object(cfg.train.render.module, cfg.train.render.args)
        renderer.split = "demo"
    model.eval()
    if "model_state" in cfg[cfg.split]:
        model.set_state(**cfg[cfg.split]["model_state"])
    if "render_state" in cfg[cfg.split]:
        renderer.set_state(**cfg[cfg.split]["render_state"])
    # inference-time row-layout optimization: enables the block-pruned
    # frame (log_tpu/model/block_render.py). Opt out per split with
    # `optimize_layout: False`.
    if cfg[cfg.split].get("optimize_layout", True) and hasattr(
        model, "optimize_render_layout"
    ):
        try:
            model.optimize_render_layout()
        except AssertionError:
            pass  # training state attached: keep the unpruned path
    # amortized weight cull is an EXPLICIT knob (default 1 = reference
    # per-frame semantics, LoG/model/level_of_gaussian.py:238-241): set
    # `check_render_every: K` on the demo split (or in its model_state) to
    # refresh the occlusion cull every K frames — staleness contract in
    # README "Inference performance knobs"
    cre = cfg[cfg.split].get("check_render_every", None)
    if cre is not None:
        model.set_state(check_render_every=int(cre))
    render_type = cfg.get("render_type", "rgb")
    if render_type in ("depth", "height"):
        renderer.render_depth = True

    # warm-up (compilation + caches), then timed loop
    for batch_idx in range(min(11, len(dataset))):
        batch = _batchify(dataset[batch_idx])
        renderer.vis(batch, model)

    total_time = 0.0
    outname = None
    for batch_idx in range(len(dataset)):
        item = dataset[batch_idx]
        batch = _batchify(item)
        if "model_state" in item:
            model.set_state(**item["model_state"])
        t0 = time.perf_counter()
        output = renderer.vis(batch, model)
        np.asarray(output["render"])  # block until device work completes
        total_time += (time.perf_counter() - t0) * 1000.0
        render = output["render"][0]
        if render_type == "depth":
            depth = output["depth"][0]
            dmin, dmax = cfg.get("depth_min", 0.01), cfg.get("depth_max", 10.0)
            vis = renderer.marigold_depth_vis((depth - dmin) / (dmax - dmin))
        elif render_type == "height":
            depth = output["height"][0]
            hmin, hmax = cfg.get("height_min", 0.01), cfg.get("height_max", 10.0)
            vis = renderer.marigold_depth_vis((depth - hmin) / (hmax - hmin))
        else:
            vis = renderer.tensor_to_bgr(render)
        outname = os.path.join(
            cfg.exp, cfg.split, render_type, f"{batch_idx:06d}.jpg"
        )
        os.makedirs(os.path.dirname(outname), exist_ok=True)
        cv2.imwrite(outname, vis)
        # rgba export (reference apps/train.py:75-81 writes rgba pngs when the
        # renderer emits a mask; ours always has compositing alpha, so gate on
        # a config flag instead of silently doubling demo IO)
        if "mask" in output and cfg.get("write_rgba", False):
            mask8 = (np.clip(output["mask"][0], 0, 1) * 255).astype(np.uint8)
            rgba = np.dstack([vis, mask8[:, :, None]])
            rgbaname = os.path.join(
                cfg.exp, cfg.split, "rgba", f"{batch_idx:06d}.png"
            )
            os.makedirs(os.path.dirname(rgbaname), exist_ok=True)
            cv2.imwrite(rgbaname, rgba)
    n = max(len(dataset), 1)
    print(
        "Average time: {:.2f} ms, fps: {:.1f}".format(
            total_time / n, 1000 / max(total_time / n, 1e-9)
        )
    )
    if outname is not None:
        renderer.make_video(
            os.path.dirname(outname), fps=cfg[cfg.split].get("fps", 30)
        )


def validate_for_metric(exp, dataset, model, renderer, device=None):
    import cv2

    model.eval()
    for scale in [8, 4, 2, 1]:
        if scale not in dataset.scales:
            continue
        dataset.set_state(scale=scale)
        outdir = join(exp, "test", f"scale_{scale}")
        os.makedirs(join(outdir, "gt"), exist_ok=True)
        os.makedirs(join(outdir, "renders"), exist_ok=True)
        total_time = 0.0
        for batch_idx in range(len(dataset)):
            item = dataset[batch_idx]
            batch = _batchify(item)
            t0 = time.perf_counter()
            output = renderer.vis(batch, model)
            np.asarray(output["render"])
            total_time += (time.perf_counter() - t0) * 1000.0
            if isinstance(item.get("image"), np.ndarray):
                gt = (item["image"][:, :, ::-1] * 255).astype(np.uint8)
                cv2.imwrite(join(outdir, "gt", "%04d.png" % batch_idx), gt)
            renders = output["render"][0].transpose(1, 2, 0)
            renders = (np.clip(renders[:, :, ::-1], 0.0, 1.0) * 255).astype(np.uint8)
            cv2.imwrite(join(outdir, "renders", "%04d.png" % batch_idx), renders)
        n = max(len(dataset), 1)
        print(
            "scale: {}, Average time: {:.2f} ms, fps: {:.1f}".format(
                scale, total_time / n, 1000 / max(total_time / n, 1e-9)
            )
        )


def main():
    args, cfg = Config.load_args(usage="run")
    cfg = update_global_variable(cfg, cfg)
    from log_tpu.utils.profiler import profile_if

    cfg["_profiler"] = bool(getattr(args, "profiler", False))
    exp = cfg.exp
    print("Write to {}".format(exp))
    os.makedirs(exp, exist_ok=True)
    if cfg.split == "train":
        with open(os.path.join(exp, "config.yaml"), "w") as f:
            print(cfg, file=f)
    from log_tpu.utils.trainer import Trainer, seed_everything

    seed_everything(666)
    model = load_object(cfg.model.module, cfg.model.args)
    if cfg.split == "train":
        outdir = copy_git_tracked_files("./", exp)
        dataset = load_object(cfg.train.dataset.module, cfg.train.dataset.args)
        if "base_iter" in cfg:
            base_iter = cfg.base_iter
        else:
            if len(dataset) < 1000:
                base_iter = (len(dataset) // 100 + 1) * 100
            else:
                base_iter = (len(dataset) // 1000 + 1) * 1000
        print("Base iteration: {}".format(base_iter))
        model.base_iter = base_iter
        renderer = load_object(cfg.train.render.module, cfg.train.render.args)
        trainer = Trainer(cfg, model, renderer, logdir=outdir)
        trainer.init(dataset)
        trainer.fit(dataset)
    elif cfg.split.startswith("demo") or cfg.split == "trainvis":
        if cfg.split == "trainvis":
            cfg.split = "train"
        if "ckptname" in cfg:
            model.load_state_dict(load_statedict(cfg.ckptname))
        with profile_if(cfg["_profiler"], join(exp, "jax_trace")):
            demo(cfg, model)
    elif cfg.split == "val":
        if "ckptname" in cfg:
            model.load_state_dict(load_statedict(cfg.ckptname))
        if "model_state" in cfg.val:
            model.set_state(**cfg.val["model_state"])
        dataset = load_object(cfg.val.dataset.module, cfg.val.dataset.args)
        renderer = load_object(cfg.train.render.module, cfg.train.render.args)
        renderer.split = "val"
        validate_for_metric(exp, dataset, model, renderer)


if __name__ == "__main__":
    main()
