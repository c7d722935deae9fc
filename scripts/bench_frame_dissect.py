"""Round-3 frame dissection: attribute every ms of the bench frame.

Round 2 measured the full 3.24M-pt 1080p frame at ~170-200 ms while the
itemized stages (cut 6.4 + compact 7.4 + expand ~24 + sort ~8-13 + check 35
+ kernel ~45) sum to only ~126-131 ms. This probe times (a) each stage as
its own executable, (b) cumulative prefixes of the pipeline, and (c) the
full fused frame — at the EXACT bench config — so the residual is localized
to a stage boundary instead of guessed at.

Timing protocol (ARCHITECTURE.md "Environment quirks"): warm twice, loop
REPS, ONE position-weighted scalar fetch at the end (block_until_ready is a
no-op through the axon tunnel; permutation-invariant reductions get DCE'd).

Usage: python scripts/bench_frame_dissect.py [phase ...]
Phases: full cut compact check prefix23 nocheck act pairs kernel trace
"""
from __future__ import annotations

import math
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_ROOTS = int(os.environ.get("DISSECT_ROOTS", "600000"))
H, W = 1088, 1920
REPS = int(os.environ.get("DISSECT_REPS", "10"))
MIN_RES_PIXEL = float(os.environ.get("DISSECT_MIN_RES", "3.0"))
PHASES = sys.argv[1:] or [
    "full", "cut", "compact", "check", "prefix23", "nocheck", "pairs",
    "kernel",
]


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
    from log_tpu.model.tensor_tree import flat_cut_pre
    from log_tpu.ops import gaussian_math as gm
    from log_tpu.ops import pick_max_pairs
    from log_tpu.ops import rasterize_tiled as rt
    from log_tpu.render.renderer import camera_device
    from log_tpu.utils.synth_tree import padded_model_device, tree_sizes

    _, _, n = tree_sizes(N_ROOTS)
    cap = next_capacity(n)
    params, tree_dev, is_leaf_opt = padded_model_device(
        jax.random.PRNGKey(0), N_ROOTS, cap
    )
    n_roots_bucket = min(next_capacity(N_ROOTS), cap)
    n_alive = jnp.int32(n)
    pcam = camera_device(prepare_camera(make_cam(0.7), 1, 0.01, 1000.0))
    bg = jnp.zeros(3, jnp.float32)

    cap_sort = min(cap, -(-n // (1 << 18)) * (1 << 18))
    common = dict(
        n_alive=n_alive, is_leaf_opt=is_leaf_opt,
        min_resolution_pixel=jnp.float32(MIN_RES_PIXEL),
        current_depth=jnp.int32(20), background=bg,
        image_height=H, image_width=W, sh_degree=0, stage_has_tree=True,
        num_levels=3, backend="tiled", check_scale=4,
        cut_method="flat_slice", n_roots=n_roots_bucket,
        prep_backend="tiled", prep_max_pairs=1 << 19,
        cap_sort=cap_sort,
    )

    # size k_vis exactly like bench.py
    _, _, counts = ts.fused_prepare_render(
        params, tree_dev, pcam, k_visible=min(1 << 21, cap),
        max_pairs=1 << 21, **common,
    )
    c = np.asarray(counts)
    cut = int(c[:2].sum())
    k_vis = min(next_capacity(int(cut * 1.2), 1 << 15), cap)
    max_pairs = pick_max_pairs(k_vis, per_point=6)
    if len(c) > 2 and c[2] > 0:
        max_pairs = min(
            max_pairs, pick_max_pairs(int(c[2] * 1.25), per_point=1)
        )
    print(f"n={n} cap={cap} cut={cut} k_vis={k_vis} "
          f"max_pairs={max_pairs} pairs_demand={int(c[2]) if len(c) > 2 else -1}",
          flush=True)

    def bench(name, fn, *args):
        out = fn(*args)
        out = out[-1] if isinstance(out, tuple) else out
        float(jnp.sum(out * 1.000001))
        out = fn(*args)
        out = out[-1] if isinstance(out, tuple) else out
        float(jnp.sum(out * 1.000001))
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
        out = out[-1] if isinstance(out, tuple) else out
        float(jnp.sum(out * 1.000001))
        dt = (time.perf_counter() - t0) / REPS * 1000
        print(f"{name}: {dt:.2f} ms", flush=True)
        return dt

    # ---- stage replicas (mirror fused_prepare_render's flat_slice branch)
    def cut_core(params, tree_arrays, cam):
        alive = jnp.arange(cap) < n_alive
        rx = tree_arrays["root_xyz"]
        rpx, rpy, rpz, _ = gm.project_ndc_c(
            rx[..., 0], rx[..., 1], rx[..., 2], cam["full_proj"]
        )
        root_frus = gm.frustum_flag_c(rpx, rpy, rpz, padding=0.5) & alive
        scaling_full = jnp.exp(params["scaling"])
        rotation_full = params["rotation"] / jnp.maximum(
            jnp.linalg.norm(params["rotation"], axis=-1, keepdims=True), 1e-12
        )
        radius2d = gm.compute_radius2d(
            params["xyz"], scaling_full, rotation_full, cam["world_view"],
            cam["full_proj"], cam["focal_x"], cam["focal_y"],
            cam["tan_fovx"], cam["tan_fovy"],
        )
        radius2d_parent = gm.compute_radius2d(
            tree_arrays["parent_xyz"], jnp.exp(tree_arrays["parent_scaling"]),
            tree_arrays["parent_rotation"] / jnp.maximum(
                jnp.linalg.norm(
                    tree_arrays["parent_rotation"], axis=-1, keepdims=True
                ), 1e-12,
            ),
            cam["world_view"], cam["full_proj"], cam["focal_x"],
            cam["focal_y"], cam["tan_fovx"], cam["tan_fovy"],
        )
        keep = flat_cut_pre(
            tree_arrays["index_parent"], tree_arrays["node_index"],
            tree_arrays["depth"], root_frus, radius2d, radius2d_parent,
            alive, jnp.float32(MIN_RES_PIXEL), jnp.int32(20),
        )
        return keep, (rpx, rpy, rpz), scaling_full, rotation_full, root_frus

    iota_cap = None

    @jax.jit
    def stage_cut(params, tree_arrays, cam):
        keep, _, _, _, _ = cut_core(params, tree_arrays, cam)
        w = jnp.arange(cap, dtype=jnp.float32) * 1e-6
        return jnp.sum(jnp.where(keep, w, 0.0))

    need = ["xyz", "colors", "scaling", "opacity", "rotation"]

    @jax.jit
    def stage_compact(params, tree_arrays, cam):
        keep, _, _, _, _ = cut_core(params, tree_arrays, cam)
        cols = {kk: params[kk] for kk in need}
        cols["root_id"] = tree_arrays["root_id"][:, None]
        slices, index, lane_prefix = ts._compact_slices_sort(
            cols, keep, k_vis
        )
        w = jnp.arange(k_vis, dtype=jnp.float32) * 1e-6
        return jnp.sum(slices["xyz"][:, 0] * w)

    @jax.jit
    def stage_check(params, tree_arrays, cam):
        alive = jnp.arange(cap) < n_alive
        R = n_roots_bucket
        rx = tree_arrays["root_xyz"]
        rpx, rpy, rpz, _ = gm.project_ndc_c(
            rx[..., 0], rx[..., 1], rx[..., 2], cam["full_proj"]
        )
        scaling_full = jnp.exp(params["scaling"][:R])
        rotation_full = params["rotation"][:R] / jnp.maximum(
            jnp.linalg.norm(params["rotation"][:R], axis=-1, keepdims=True),
            1e-12,
        )
        cand = (
            gm.frustum_flag_c(rpx[:R], rpy[:R], rpz[:R], padding=0.5)
            & (tree_arrays["index_parent"][:R] == -1)
            & alive[:R]
        )
        ok = ts._check_root_weights(
            params["xyz"][:R], jax.nn.sigmoid(params["opacity"][:R, 0]),
            scaling_full, rotation_full, cand, cam, H, W, "antialias",
            "tiled", 1 << 19, 4,
        )
        w = jnp.arange(R, dtype=jnp.float32) * 1e-6
        return jnp.sum(jnp.where(ok, w, 0.0))

    @jax.jit
    def stage_prefix23(params, tree_arrays, cam):
        # cut + compact + check + weight gather (everything except the
        # main render)
        keep, (rpx, rpy, rpz), scaling_full, rotation_full, _ = cut_core(
            params, tree_arrays, cam
        )
        alive = jnp.arange(cap) < n_alive
        cols = {kk: params[kk] for kk in need}
        cols["root_id"] = tree_arrays["root_id"][:, None]
        slices, index, lane_prefix = ts._compact_slices_sort(cols, keep, k_vis)
        root_id_sl = slices.pop("root_id")[:, 0]
        R = n_roots_bucket
        cand = (
            gm.frustum_flag_c(rpx[:R], rpy[:R], rpz[:R], padding=0.5)
            & (tree_arrays["index_parent"][:R] == -1)
            & alive[:R]
        )
        ok = ts._check_root_weights(
            params["xyz"][:R], jax.nn.sigmoid(params["opacity"][:R, 0]),
            scaling_full[:R], rotation_full[:R], cand, cam, H, W,
            "antialias", "tiled", 1 << 19, 4,
        )
        w_sl = jnp.take(ok, jnp.clip(root_id_sl, 0, R - 1))
        lane_valid = lane_prefix & w_sl
        w = jnp.arange(k_vis, dtype=jnp.float32) * 1e-6
        return jnp.sum(slices["xyz"][:, 0] * w) + jnp.sum(
            jnp.where(lane_valid, w, 0.0)
        )

    # ---- intermediates for render-side stages (device-resident, computed
    # once; passed as ARGS, never closed over)
    @jax.jit
    def make_slices(params, tree_arrays, cam):
        keep, (rpx, rpy, rpz), scaling_full, rotation_full, _ = cut_core(
            params, tree_arrays, cam
        )
        alive = jnp.arange(cap) < n_alive
        cols = {kk: params[kk] for kk in need}
        cols["root_id"] = tree_arrays["root_id"][:, None]
        slices, index, lane_prefix = ts._compact_slices_sort(cols, keep, k_vis)
        root_id_sl = slices.pop("root_id")[:, 0]
        R = n_roots_bucket
        cand = (
            gm.frustum_flag_c(rpx[:R], rpy[:R], rpz[:R], padding=0.5)
            & (tree_arrays["index_parent"][:R] == -1)
            & alive[:R]
        )
        ok = ts._check_root_weights(
            params["xyz"][:R], jax.nn.sigmoid(params["opacity"][:R, 0]),
            scaling_full[:R], rotation_full[:R], cand, cam, H, W,
            "antialias", "tiled", 1 << 19, 4,
        )
        w_sl = jnp.take(ok, jnp.clip(root_id_sl, 0, R - 1))
        return slices, lane_prefix, lane_prefix & w_sl

    @partial(jax.jit, static_argnames=("with_kernel",))
    def stage_render(slices, lane_prefix, lane_valid, cam, with_kernel=True):
        from log_tpu.model.train_step import sh_to_rgb

        scaling = jnp.exp(slices["scaling"])
        opacity = jax.nn.sigmoid(slices["opacity"][:, 0])
        rotation = slices["rotation"] / jnp.linalg.norm(
            slices["rotation"], axis=-1, keepdims=True
        )
        colors = sh_to_rgb(slices["colors"])
        out = rt.rasterize_tiled(
            xyz=slices["xyz"], colors=colors, opacity=opacity,
            scaling=scaling, rotation=rotation,
            means2d_offset=jnp.zeros((k_vis, 2), jnp.float32),
            world_view=cam["world_view"], full_proj=cam["full_proj"],
            focal_x=cam["focal_x"], focal_y=cam["focal_y"],
            tan_fovx=cam["tan_fovx"], tan_fovy=cam["tan_fovy"],
            background=jnp.zeros(3), image_height=H, image_width=W,
            active_mask=lane_valid, mode="antialias", use_filter=False,
            max_pairs=max_pairs, with_stats=False, tight_radius=True,
            runs_tail_only=True, prefix_mask=lane_prefix,
        )
        img = out["render"]
        w = jnp.arange(W, dtype=jnp.float32) * 1e-6
        return jnp.sum(img[0] * w[None, :])

    @jax.jit
    def stage_pairs(slices, lane_prefix, lane_valid, cam):
        from log_tpu.model.train_step import sh_to_rgb
        from log_tpu.ops.projection import project_gaussians

        scaling = jnp.exp(slices["scaling"])
        opacity = jax.nn.sigmoid(slices["opacity"][:, 0])
        rotation = slices["rotation"] / jnp.linalg.norm(
            slices["rotation"], axis=-1, keepdims=True
        )
        colors = sh_to_rgb(slices["colors"])
        splats = project_gaussians(
            slices["xyz"], scaling, rotation, opacity, cam["world_view"],
            cam["full_proj"], cam["focal_x"], cam["focal_y"],
            cam["tan_fovx"], cam["tan_fovy"], H, W, mode="antialias",
            use_filter=False,
            means2d_offset=jnp.zeros((k_vis, 2), jnp.float32),
            active_mask=lane_valid, tight_radius=True,
        )
        pairs = rt.build_pairs(
            splats, colors, H, W, max_pairs, runs_tail_only=True,
            active_prefix=lane_prefix, interpret=False,
        )
        w = jnp.arange(pairs["pair_data"].shape[1], dtype=jnp.float32) * 1e-6
        return (
            pairs["pair_data"], pairs["tile_start"], pairs["tile_count"],
            jnp.sum(pairs["pair_data"][0] * w),
        )

    @jax.jit
    def stage_kernel(pair_data, tile_start, tile_count):
        color, tfinal, pid, pwp, pair_w = rt._run_forward(
            pair_data, tile_start, tile_count, jnp.zeros(3),
            rt.pl.cdiv(W, rt.TILE_W), rt.pl.cdiv(H, rt.TILE_H),
            False, False,
        )
        w = jnp.arange(color.shape[2], dtype=jnp.float32) * 1e-6
        return jnp.sum(color[0] * w[None, :])

    @jax.jit
    def stage_check8(params, tree_arrays, cam):
        # check render at 1/8 resolution with a halved pair budget — the
        # 1e-8 weight cull is a coarse occlusion test
        alive = jnp.arange(cap) < n_alive
        R = n_roots_bucket
        rx = tree_arrays["root_xyz"]
        rpx, rpy, rpz, _ = gm.project_ndc_c(
            rx[..., 0], rx[..., 1], rx[..., 2], cam["full_proj"]
        )
        scaling_full = jnp.exp(params["scaling"][:R])
        rotation_full = params["rotation"][:R] / jnp.maximum(
            jnp.linalg.norm(params["rotation"][:R], axis=-1, keepdims=True),
            1e-12,
        )
        cand = (
            gm.frustum_flag_c(rpx[:R], rpy[:R], rpz[:R], padding=0.5)
            & (tree_arrays["index_parent"][:R] == -1)
            & alive[:R]
        )
        ok = ts._check_root_weights(
            params["xyz"][:R], jax.nn.sigmoid(params["opacity"][:R, 0]),
            scaling_full, rotation_full, cand, cam, H, W, "antialias",
            "tiled", 1 << 18, 8,
        )
        w = jnp.arange(R, dtype=jnp.float32) * 1e-6
        return jnp.sum(jnp.where(ok, w, 0.0))

    @jax.jit
    def stage_fused2(params, tree_arrays, cam):
        # exactly make_slices + stage_render composed in ONE executable —
        # if this matches `full`, the replicas are faithful and the halves
        # gap is real fusion overhead; if it matches the halves sum,
        # fused_prepare_render does extra work the replicas skip
        slices, lane_prefix, lane_valid = make_slices.__wrapped__(
            params, tree_arrays, cam
        )
        return stage_render.__wrapped__(
            slices, lane_prefix, lane_valid, cam, with_kernel=True
        )

    def full_frame(cam):
        img, _, _ = ts.fused_prepare_render(
            params, tree_dev, cam, k_visible=k_vis, max_pairs=max_pairs,
            **common,
        )
        return img

    results = {}
    if "full" in PHASES:
        results["full"] = bench("full frame", full_frame, pcam)
    if "cut" in PHASES:
        results["cut"] = bench("cut", stage_cut, params, tree_dev, pcam)
    if "compact" in PHASES:
        results["compact"] = bench(
            "cut+compact", stage_compact, params, tree_dev, pcam
        )
    if "check" in PHASES:
        results["check"] = bench("check", stage_check, params, tree_dev, pcam)
    if "prefix23" in PHASES:
        results["prefix23"] = bench(
            "cut+compact+check (no render)", stage_prefix23, params,
            tree_dev, pcam,
        )
    if "nocheck" in PHASES or "pairs" in PHASES or "kernel" in PHASES:
        slices, lane_prefix, lane_valid = jax.tree.map(
            lambda x: x, make_slices(params, tree_dev, pcam)
        )
    if "nocheck" in PHASES:
        results["render"] = bench(
            "render-from-slices (proj+pairs+kernel)", stage_render,
            slices, lane_prefix, lane_valid, pcam,
        )
    if "pairs" in PHASES:
        pd, tstart, tcount, _ = stage_pairs(slices, lane_prefix, lane_valid, pcam)
        results["pairs"] = bench(
            "proj+pairs (no kernel)",
            lambda s, lp, lv, c: stage_pairs(s, lp, lv, c)[-1],
            slices, lane_prefix, lane_valid, pcam,
        )
    if "kernel" in PHASES:
        results["kernel"] = bench(
            "kernel only", stage_kernel, pd, tstart, tcount
        )
    @jax.jit
    def stage_f2nok(params, tree_arrays, cam):
        # everything except the forward kernel, in one executable
        slices, lane_prefix, lane_valid = make_slices.__wrapped__(
            params, tree_arrays, cam
        )
        return stage_pairs.__wrapped__(
            slices, lane_prefix, lane_valid, cam
        )[-1]

    if "f2nok" in PHASES:
        results["f2nok"] = bench(
            "fused all-but-kernel", stage_f2nok, params, tree_dev, pcam
        )

    def full_frame_nocull(cam):
        img, _, _ = ts.fused_prepare_render(
            params, tree_dev, cam, k_visible=k_vis, max_pairs=max_pairs,
            check_cull=False, **common,
        )
        return img

    if "nocull" in PHASES:
        results["nocull"] = bench(
            "full frame check_cull=False", full_frame_nocull, pcam
        )
    if "check8" in PHASES:
        results["check8"] = bench(
            "check @1/8 res", stage_check8, params, tree_dev, pcam
        )
    if "fused2" in PHASES:
        results["fused2"] = bench(
            "fused halves (one executable)", stage_fused2, params,
            tree_dev, pcam,
        )
    if "trace" in PHASES:
        import jax.profiler

        full_frame(pcam)
        with jax.profiler.trace("/tmp/jax_trace"):
            for _ in range(3):
                x = full_frame(pcam)
            float(jnp.sum(x * 1.000001))
        print("trace written to /tmp/jax_trace", flush=True)
    print("RESULTS", results, flush=True)


if __name__ == "__main__":
    main()
