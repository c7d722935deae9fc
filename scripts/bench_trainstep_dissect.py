"""Itemize the fused training step: attribute every ms at 1080p/100k.

The axon tunnel drops device-plane xplane events, so (as with the render
frame, scripts/bench_frame_dissect.py) the step is dissected by timing
CUMULATIVE PREFIXES of the real pipeline as separate executables on the
same inputs; consecutive differences attribute cost per stage:

  prep        flat-cut visibility (radius passes over capacity)
  compact     + slice compaction (variadic sort to the k bucket)
  fwd         + activate + tiled rasterize forward
  fwd_l1      + L1 loss (fwd + reduction)
  fwd_loss    + SSIM (the 0.8 L1 + 0.2 SSIM training loss, forward only)
  fwd_bwd_l1  value_and_grad of the L1-only loss      -> backward kernel
  fwd_bwd     value_and_grad of the full loss          -> + SSIM backward
  full        fused_prepare_train_step (adds counter scatter, sparse Adam,
              scaling clamp)

Timing protocol: warm twice, loop REPS, one scalar fetch at the end
(ARCHITECTURE.md — block_until_ready is a no-op through the tunnel).

Usage: python scripts/bench_trainstep_dissect.py [n_points]
Prints one JSON line; paste the table into BASELINE.md.
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
H, W = 1088, 1920
REPS = int(os.environ.get("DISSECT_REPS", "10"))


def main():
    import jax
    import jax.numpy as jnp

    from log_tpu.dataset.base import prepare_camera
    from log_tpu.model.gaussian import next_capacity
    from log_tpu.model.train_step import (
        StepConfig,
        _activate_and_rasterize,
        _compact_slices_gather,
        _compact_slices_sort,
        _prepare_core,
        fused_prepare_train_step,
    )
    from log_tpu.ops import pick_max_pairs
    from log_tpu.ops.ssim import ssim_loss
    from log_tpu.render.renderer import camera_device

    cap = next_capacity(N)
    ks = jax.random.split(jax.random.PRNGKey(0), 8)

    @jax.jit
    def gen_state():
        ext = 12.0
        xyz = jnp.stack([
            jax.random.uniform(ks[0], (cap,), minval=-ext, maxval=ext),
            jax.random.uniform(ks[1], (cap,), minval=-ext, maxval=ext),
            jax.random.uniform(ks[2], (cap,), minval=0.0, maxval=2.0),
        ], axis=1)
        scal = jnp.log(
            jax.random.uniform(ks[3], (cap, 3), minval=0.05, maxval=0.3)
        )
        q = jax.random.normal(ks[4], (cap, 4))
        rot = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        opac = jax.random.uniform(ks[5], (cap, 1), minval=0.3, maxval=0.9)
        params = {
            "xyz": xyz,
            "colors": jax.random.uniform(ks[6], (cap, 3)) * 2 - 1,
            "scaling": scal,
            "opacity": jnp.log(opac / (1 - opac)),
            "rotation": rot,
            "shs": jnp.zeros((cap, 3, 3)),
        }
        gt = (jax.random.uniform(ks[7], (3, H, W)) * 255).astype(jnp.uint8)
        return params, gt

    params, gt = gen_state()
    moments = {
        "exp_avg": {k: jnp.zeros_like(v) for k, v in params.items()},
        "exp_avg_sq": {k: jnp.zeros_like(v) for k, v in params.items()},
    }
    from log_tpu.model.counter import init_counter

    counter = {k: jnp.asarray(v) for k, v in init_counter(cap).items()}
    # is_leaf_opt/tree arrays: no-tree init stage (same as bench_trainstep)
    cap_tree = {
        "index_parent": jnp.full((cap,), -1, jnp.int32),
        "node_index": jnp.full((cap,), -1, jnp.int32),
        "depth": jnp.zeros((cap,), jnp.int32),
        "root_xyz": params["xyz"],
        "parent_xyz": params["xyz"],
        "parent_scaling": params["scaling"],
        "parent_rotation": params["rotation"],
    }

    def make_cam(theta):
        pos = np.array([16 * math.cos(theta), 16 * math.sin(theta), 12.0])
        fwd = -pos / np.linalg.norm(pos)
        right = np.cross(fwd, np.array([0, 0, 1.0]))
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        R = np.stack([right, up, fwd])
        T = (-R @ pos).reshape(3, 1)
        K = np.array([[1400.0, 0, W / 2], [0, 1400.0, H / 2], [0, 0, 1]])
        return camera_device(prepare_camera(
            {"K": K, "R": R, "T": T, "H": H, "W": W,
             "center": pos.reshape(3, 1)}, 1, 0.01, 1000.0))

    cams = [make_cam(2 * math.pi * i / 24) for i in range(24)]
    # optional 2nd arg: force the slice bucket (tree-stage regime: small
    # cut bucket against a large capacity; overflow truncation is fine
    # for timing)
    k_bucket = (int(sys.argv[2]) if len(sys.argv) > 2
                else next_capacity(N))
    cfg = StepConfig(
        image_height=H, image_width=W, k_leaf=k_bucket, k_node=0,
        sh_degree=0, mode="antialias", backend="tiled",
        max_pairs=pick_max_pairs(k_bucket),
    )
    prep_args = dict(
        min_resolution_pixel=jnp.float32(3.0), current_depth=jnp.int32(0),
        image_height=H, image_width=W, stage_has_tree=False, num_levels=1,
        mode="antialias", backend="tiled", max_pairs=1 << 19, check_scale=4,
    )

    # params/tree/gt are EXPLICIT arguments everywhere: closure-captured
    # device arrays become embedded constants, and at 10M-point scale the
    # remote-compile request exceeds the tunnel's body limit (HTTP 413)
    @jax.jit
    def prep(params, cap_tree, gt, cam):
        kl, kn, counts = _prepare_core(
            params, cap_tree, cam, jnp.int32(N), jnp.zeros((cap,), bool),
            **prep_args,
        )
        return jnp.sum(kl) + jnp.sum(kn)

    def compact_of(params, cap_tree, cam):
        kl, kn, counts = _prepare_core(
            params, cap_tree, cam, jnp.int32(N), jnp.zeros((cap,), bool),
            **prep_args,
        )
        opt = {k: params[k] for k in cfg.opt_keys if k in params}
        # same small-bucket selection as _train_step_core
        _compact = (_compact_slices_gather if cfg.k_leaf <= cap // 16
                    else _compact_slices_sort)
        return _compact(opt, kl, cfg.k_leaf)

    @jax.jit
    def compact(params, cap_tree, gt, cam):
        slices, index, lane_valid = compact_of(params, cap_tree, cam)
        return sum(jnp.sum(v[:, 0]) for v in slices.values()) + jnp.sum(index)

    def fwd_of(params, cap_tree, cam):
        slices, index, lane_valid = compact_of(params, cap_tree, cam)
        K = index.shape[0]
        out = _activate_and_rasterize(
            slices, jnp.zeros((K, 2), jnp.float32), cam,
            jnp.zeros(3, jnp.float32), lane_valid, cfg,
        )
        return out, slices, lane_valid

    @jax.jit
    def fwd(params, cap_tree, gt, cam):
        out, _, _ = fwd_of(params, cap_tree, cam)
        return jnp.sum(out["render"])

    def loss_of(params, cap_tree, gt, cam, with_ssim):
        gt_f32 = gt.astype(jnp.float32) * (1.0 / 255.0)
        out, slices, lane_valid = fwd_of(params, cap_tree, cam)
        render = out["render"]
        l1 = jnp.mean(jnp.abs(render - gt_f32))
        if with_ssim:
            return 0.8 * l1 + 0.2 * ssim_loss(render, gt_f32)
        return l1

    fwd_l1 = jax.jit(lambda p, t, g, cam: loss_of(p, t, g, cam, False))
    fwd_loss = jax.jit(lambda p, t, g, cam: loss_of(p, t, g, cam, True))

    def grad_loss_of(params, cap_tree, gt, cam, with_ssim):
        gt_f32 = gt.astype(jnp.float32) * (1.0 / 255.0)
        slices0, index, lane_valid = compact_of(params, cap_tree, cam)
        K = index.shape[0]

        def lf(slices_, offset_):
            out = _activate_and_rasterize(
                slices_, offset_, cam, jnp.zeros(3, jnp.float32),
                lane_valid, cfg,
            )
            render = out["render"]
            l1 = jnp.mean(jnp.abs(render - gt_f32))
            if with_ssim:
                return 0.8 * l1 + 0.2 * ssim_loss(render, gt_f32)
            return l1

        loss, grads = jax.value_and_grad(lf, argnums=(0, 1))(
            slices0, jnp.zeros((K, 2), jnp.float32)
        )
        return loss + sum(jnp.sum(g) for g in jax.tree.leaves(grads))

    fwd_bwd_l1 = jax.jit(lambda p, t, g, cam: grad_loss_of(p, t, g, cam, False))
    fwd_bwd = jax.jit(lambda p, t, g, cam: grad_loss_of(p, t, g, cam, True))

    lrs = {k: jnp.float32(1e-3)
           for k in ("xyz", "colors", "scaling", "opacity", "rotation", "shs")}
    corr = {
        "values": jnp.ones((1, 3)), "m1": jnp.zeros((1, 3)),
        "m2": jnp.zeros((1, 3)), "vmax": jnp.zeros((1, 3)),
        "steps": jnp.zeros((1,), jnp.int32),
    }
    ones = jnp.ones((1, 1, 1), jnp.float32)
    oned = jnp.ones((1, 1), jnp.float32)
    key = jax.random.PRNGKey(1)

    def full(cam, i, st):
        p, m, c, co, metrics, aux = fused_prepare_train_step(
            st[0], st[1], st[2], cap_tree, jnp.int32(N),
            jnp.zeros((cap,), bool), jnp.float32(3.0), jnp.int32(0),
            cam, gt, jnp.zeros(3), lrs, jnp.float32(i + 1), st[3],
            jnp.int32(0), ones, oned, key,
            stage_has_tree=False, num_levels=1, prep_backend="tiled",
            prep_max_pairs=1 << 19, check_scale=4, cfg=cfg,
        )
        return (p, m, c, co), metrics

    def time_fn(fn, label):
        float(fn(params, cap_tree, gt, cams[0]))
        float(fn(params, cap_tree, gt, cams[1]))
        t0 = time.perf_counter()
        acc = None
        for i in range(REPS):
            acc = fn(params, cap_tree, gt, cams[2 + i % 20])
        float(acc)
        dt = (time.perf_counter() - t0) / REPS * 1000
        print(f"# {label}: {dt:.1f} ms", file=sys.stderr, flush=True)
        return round(dt, 1)

    out = {"metric": "trainstep_dissect_1080p", "unit": "ms",
           "n_points": N, "k_bucket": k_bucket, "max_pairs": cfg.max_pairs,
           "reps": REPS}
    out["prep"] = time_fn(prep, "prep (flat cut over capacity)")
    out["compact"] = time_fn(compact, "prep+compact")
    out["fwd"] = time_fn(fwd, "prep+compact+render fwd")
    out["fwd_l1"] = time_fn(fwd_l1, "... + L1")
    out["fwd_loss"] = time_fn(fwd_loss, "... + L1+SSIM")
    out["fwd_bwd_l1"] = time_fn(fwd_bwd_l1, "value_and_grad(L1)")
    out["fwd_bwd"] = time_fn(fwd_bwd, "value_and_grad(L1+SSIM)")

    # full fused step (stateful: thread donated state)
    st = (params, moments, counter, corr)
    for i in range(2):
        st, metrics = full(cams[i], i, st)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for i in range(REPS):
        st, metrics = full(cams[2 + i % 20], 2 + i, st)
    float(metrics["loss"])
    out["full"] = round((time.perf_counter() - t0) / REPS * 1000, 1)
    print(f"# full fused step: {out['full']} ms", file=sys.stderr, flush=True)

    out["itemized"] = {
        "prep": out["prep"],
        "compact": round(out["compact"] - out["prep"], 1),
        "render_fwd": round(out["fwd"] - out["compact"], 1),
        "ssim_fwd": round(out["fwd_loss"] - out["fwd_l1"], 1),
        "render_bwd": round(out["fwd_bwd_l1"] - out["fwd_l1"], 1),
        "ssim_bwd_extra": round(
            (out["fwd_bwd"] - out["fwd_bwd_l1"])
            - (out["fwd_loss"] - out["fwd_l1"]), 1),
        "optimizer_tail": round(out["full"] - out["fwd_bwd"], 1),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
