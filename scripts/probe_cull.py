"""Dissect fused_root_cull: which of its stages eats the 48 ms.

Stages: (a) projection+frustum over R roots, (b) compaction sort,
(c) weights-mode tiled raster at 1/check_scale res, (d) the (cap,) take.

Usage: python scripts/probe_cull.py [n_roots]
"""
from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_ROOTS = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
H, W = 1088, 1920
REPS = int(os.environ.get("REPS", "10"))
CHECK_SCALE = int(os.environ.get("CHECK_SCALE", "4"))


def make_cam(theta, height=18.0, radius=22.0):
    pos = np.array([radius * math.cos(theta), radius * math.sin(theta), height])
    fwd = -pos / np.linalg.norm(pos)
    right = np.cross(fwd, np.array([0, 0, 1.0]))
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    R = np.stack([right, up, fwd])
    T = (-R @ pos).reshape(3, 1)
    K = np.array([[1400.0, 0, W / 2], [0, 1400.0, H / 2], [0, 0, 1]])
    return {"K": K, "R": R, "T": T, "H": H, "W": W, "center": pos.reshape(3, 1)}


def main():
    import jax
    import jax.numpy as jnp

    from log_tpu.dataset.base import prepare_camera
    from log_tpu.model.gaussian import next_capacity
    from log_tpu.model import train_step as ts
    from log_tpu.ops import gaussian_math as gm
    from log_tpu.ops.rasterize_tiled import rasterize_tiled
    from log_tpu.render.renderer import camera_device
    from log_tpu.utils.synth_tree import padded_model_device, tree_sizes

    _, _, n = tree_sizes(N_ROOTS)
    cap = next_capacity(n)
    params, tree_dev, is_leaf_opt = padded_model_device(
        jax.random.PRNGKey(0), N_ROOTS, cap, "root_major"
    )
    n_roots_bucket = min(next_capacity(N_ROOTS), cap)
    cap_sort = min(cap, -(-n // (1 << 18)) * (1 << 18))
    R = n_roots_bucket
    print(f"n={n} cap={cap} R={R} cap_sort={cap_sort}", flush=True)
    pcams = [
        camera_device(prepare_camera(make_cam(2 * math.pi * i / 32), 1, 0.01, 1000.0))
        for i in range(4)
    ]

    def timeit_cams(name, fn):
        out = fn(pcams[0])
        out = out[-1] if isinstance(out, tuple) else out
        float(jnp.sum(out.astype(jnp.float32) *
                      (1.0 + jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape) * 1e-7)))
        t0 = time.perf_counter()
        for i in range(REPS):
            out = fn(pcams[i % len(pcams)])
        out = out[-1] if isinstance(out, tuple) else out
        float(jnp.sum(out.astype(jnp.float32) *
                      (1.0 + jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape) * 1e-7)))
        dt = (time.perf_counter() - t0) / REPS * 1000
        print(f"{name}: {dt:.2f} ms", flush=True)
        return dt

    alive = jnp.arange(cap_sort) < jnp.int32(n)
    p_s = {k: v[:cap_sort] for k, v in params.items()}
    t_s = {
        k: (v[:cap_sort] if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == cap else v)
        for k, v in tree_dev.items()
    }

    @jax.jit
    def stage_proj(cam):
        x = p_s["xyz"][:R]
        px, py, pz, _ = gm.project_ndc_c(x[:, 0], x[:, 1], x[:, 2], cam["full_proj"])
        cand = (
            gm.frustum_flag_c(px, py, pz, padding=0.5)
            & (t_s["index_parent"][:R] == -1)
            & alive[:R]
        )
        return cand

    @jax.jit
    def stage_act(cam):
        x = p_s["xyz"][:R]
        px, py, pz, _ = gm.project_ndc_c(x[:, 0], x[:, 1], x[:, 2], cam["full_proj"])
        cand = (
            gm.frustum_flag_c(px, py, pz, padding=0.5)
            & (t_s["index_parent"][:R] == -1)
            & alive[:R]
        )
        rot = p_s["rotation"][:R]
        op = jax.nn.sigmoid(p_s["opacity"][:R, 0])
        sc = jnp.exp(p_s["scaling"][:R])
        rn = rot / jnp.maximum(jnp.linalg.norm(rot, axis=-1, keepdims=True), 1e-12)
        return cand, op, sc, rn

    @jax.jit
    def stage_compact(cam):
        cand, op, sc, rn = stage_act.__wrapped__(cam)
        cols = {
            "xyz": p_s["xyz"][:R], "opacity": op[:, None],
            "scaling": sc, "rotation": rn,
        }
        slices, index, lane_valid = ts._compact_slices_sort(cols, cand, R)
        return slices["xyz"]

    @jax.jit
    def stage_full_notake(cam):
        cand, op, sc, rn = stage_act.__wrapped__(cam)
        ok = ts._check_root_weights(
            p_s["xyz"][:R], op, sc, rn, cand, cam, H, W,
            "antialias", "tiled", 1 << 19, CHECK_SCALE,
        )
        return ok

    @jax.jit
    def stage_full(cam):
        # the REAL expansion: seg-broadcast when the layout provides
        # cull_seg_starts (root_major), else the w[root_id] take
        ok = stage_full_notake.__wrapped__(cam)
        return ts.expand_weight_full(ok, t_s, cap_sort, R)

    @jax.jit
    def stage_full_take(cam):
        # fallback-comparison: capacity-axis gather (level layout cost)
        ok = stage_full_notake.__wrapped__(cam)
        return jnp.take(
            ok, jnp.clip(t_s["root_id"].astype(jnp.int32), 0, R - 1)
        )

    timeit_cams("proj+frustum(R)", stage_proj)
    timeit_cams("  +activations", stage_act)
    timeit_cams("  +compact_sort", stage_compact)
    timeit_cams("  +check_raster (full cull, no take)", stage_full_notake)
    timeit_cams("  +expand = full root_cull", stage_full)
    timeit_cams("  +take-expand (level-layout comparison)", stage_full_take)


if __name__ == "__main__":
    main()
