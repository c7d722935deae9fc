"""THE frame-dissection tool: attribute every ms of the bench frame.

Times (a) each pipeline stage as its own executable, (b) cumulative
prefixes, and (c) the full fused frame — at the EXACT bench config — so
any full-vs-sum residual is localized to a stage boundary instead of
guessed at. Round 5 folded the one-off probe scripts in here as phases
(VERDICT r4 weak #6): their round-3/4 findings are recorded in
ARCHITECTURE.md; the phases keep the measurements repeatable.

Timing protocol (ARCHITECTURE.md "Environment quirks"): warm twice, loop
REPS, ONE position-weighted scalar fetch at the end (block_until_ready is a
no-op through the axon tunnel; permutation-invariant reductions get DCE'd).

Usage: python scripts/bench_frame_dissect.py [phase ...]
Stage phases:  full cut compact check prefix23 nocheck act pairs kernel
               f2nok nocull check8 fused2 trace
Probe phases (ex probe_*.py):
  headline   per-frame executables of bench.py's headline split
             (root_cull vs fused frame vs block frame, min_res 3 & 96)
  cull       fused_root_cull internals (proj / compact / check raster /
             seg-broadcast vs take expansion)
  kernel2    packed forward kernel alone on prebuilt pair data + the
             tile-starts searchsorted
  prims      TPU primitive costs: takes, scatters, cummax, repeat
  blocksize  block-size S sweep of the block-pruned frame
  demand     unclamped pair demand per camera (tile_h x binning sweep)
Env: DISSECT_ROOTS (600000), DISSECT_REPS (10), DISSECT_MIN_RES (3.0),
     DISSECT_LAYOUT (root_major — the layout bench.py uses)
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
        jax.random.PRNGKey(0), N_ROOTS, cap,
        os.environ.get("DISSECT_LAYOUT", "root_major"),
    )
    n_roots_bucket = min(next_capacity(N_ROOTS), cap)
    n_alive = jnp.int32(n)
    pcam = camera_device(prepare_camera(make_cam(0.7), 1, 0.01, 1000.0))
    pcams = [
        camera_device(
            prepare_camera(make_cam(2 * math.pi * i / 32), 1, 0.01, 1000.0)
        )
        for i in range(8)
    ]
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
        color, tfinal, pid, pwp, pair_w, _cend = rt._run_forward(
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
    # ------------------------------------------------------------------
    # probe phases (consolidated one-off probe_*.py scripts, round 5)
    # ------------------------------------------------------------------
    def timeit_cams(name, fn):
        # rotate cameras so no per-frame result can be cached
        out = fn(pcams[0])
        out = out[-1] if isinstance(out, tuple) else out
        o = out.astype(jnp.float32).ravel()
        float(jnp.sum(o * (1.0 + jnp.arange(o.size, dtype=jnp.float32) * 1e-7)))
        t0 = time.perf_counter()
        for i in range(REPS):
            out = fn(pcams[i % len(pcams)])
        out = out[-1] if isinstance(out, tuple) else out
        o = out.astype(jnp.float32).ravel()
        float(jnp.sum(o * (1.0 + jnp.arange(o.size, dtype=jnp.float32) * 1e-7)))
        dt = (time.perf_counter() - t0) / REPS * 1000
        print(f"{name}: {dt:.2f} ms", flush=True)
        return dt

    def root_cull(cam, full_cap=False):
        return ts.fused_root_cull(
            params, tree_dev, cam, n_alive, H, W,
            prep_backend="tiled", prep_max_pairs=1 << 19, check_scale=4,
            n_roots=n_roots_bucket, cap_sort=0 if full_cap else cap_sort,
        )

    if "headline" in PHASES:
        # ex probe_headline.py: the per-frame executables composing
        # bench.py's headline (cull-first) and blocks_cull4 metrics
        from log_tpu.model.block_render import (
            block_size_for, build_block_cache, render_blocks,
        )

        for min_res in (MIN_RES_PIXEL, 96.0):
            hcommon = dict(common)
            hcommon["min_resolution_pixel"] = jnp.float32(min_res)
            w0 = root_cull(pcams[0])
            _, _, hc = ts.fused_prepare_render(
                params, tree_dev, pcams[0], k_visible=min(1 << 21, cap),
                max_pairs=1 << 21, w_full=w0, **hcommon,
            )
            hc = np.asarray(hc)
            hcut = int(hc[:2].sum())
            hk_vis = min(next_capacity(int(hcut * 1.2), 1 << 15), cap)
            hmp = pick_max_pairs(hk_vis, per_point=6)
            if len(hc) > 2 and hc[2] > 0:
                hmp = min(hmp, pick_max_pairs(int(hc[2] * 1.25), per_point=1))
            print(f"--- headline min_res={min_res:g} cut={hcut} "
                  f"k_vis={hk_vis} max_pairs={hmp}", flush=True)
            timeit_cams("root_cull(bucket)", lambda cam: root_cull(cam))
            timeit_cams("root_cull(fullcap)",
                        lambda cam: root_cull(cam, full_cap=True))

            def hframe(cam):
                img, _, _ = ts.fused_prepare_render(
                    params, tree_dev, cam, k_visible=hk_vis,
                    max_pairs=hmp, w_full=w0, **hcommon,
                )
                return img

            timeit_cams("fused_frame(w_fixed)", hframe)
            S_blk = block_size_for(cap)
            blk_cols, blk_meta = build_block_cache(
                params, tree_dev, is_leaf_opt, n_alive, S_blk
            )
            B_blk = cap // S_blk
            wf = root_cull(pcams[0], full_cap=True)
            _, _, cb = render_blocks(
                blk_cols, blk_meta, pcams[0], jnp.float32(min_res),
                jnp.int32(20), bg, H, W, k_blocks=B_blk,
                k_visible=min(1 << 21, cap), max_pairs=1 << 21, w_full=wf,
            )
            cb = np.asarray(cb)
            cutb = int(cb[:2].sum())
            k_visb = min(next_capacity(int(cutb * 1.2), 1 << 15), cap)
            mpb = pick_max_pairs(int(max(cb[2], 1) * 1.25), per_point=1)
            kb = min(B_blk,
                     max(16, -(-int(int(cb[3]) * 1.2) // 16) * 16))
            print(f"    blocks: cut={cutb} k_vis={k_visb} max_pairs={mpb} "
                  f"kb={kb}", flush=True)

            def bframe(cam):
                img, _, _ = render_blocks(
                    blk_cols, blk_meta, cam, jnp.float32(min_res),
                    jnp.int32(20), bg, H, W, k_blocks=kb, k_visible=k_visb,
                    max_pairs=mpb, w_full=wf,
                )
                return img

            timeit_cams("block_frame(w_fixed)", bframe)

    if "cull" in PHASES:
        # ex probe_cull.py: which fused_root_cull stage eats the time
        R = n_roots_bucket
        alive_s = jnp.arange(cap_sort) < n_alive
        p_s = {k: v[:cap_sort] for k, v in params.items()}
        t_s = {
            k: (v[:cap_sort]
                if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == cap
                else v)
            for k, v in tree_dev.items()
        }

        @jax.jit
        def cull_act(cam):
            x = p_s["xyz"][:R]
            px, py, pz, _ = gm.project_ndc_c(
                x[:, 0], x[:, 1], x[:, 2], cam["full_proj"]
            )
            cand = (
                gm.frustum_flag_c(px, py, pz, padding=0.5)
                & (t_s["index_parent"][:R] == -1) & alive_s[:R]
            )
            rot = p_s["rotation"][:R]
            rn = rot / jnp.maximum(
                jnp.linalg.norm(rot, axis=-1, keepdims=True), 1e-12
            )
            return (cand, jax.nn.sigmoid(p_s["opacity"][:R, 0]),
                    jnp.exp(p_s["scaling"][:R]), rn)

        @jax.jit
        def cull_proj(cam):
            return cull_act.__wrapped__(cam)[0]

        @jax.jit
        def cull_check(cam):
            cand, op, sc, rn = cull_act.__wrapped__(cam)
            return ts._check_root_weights(
                p_s["xyz"][:R], op, sc, rn, cand, cam, H, W,
                "antialias", "tiled", 1 << 19, 4,
            )

        @jax.jit
        def cull_full(cam):
            # seg-broadcast expansion (root_major layout)
            return ts.expand_weight_full(
                cull_check.__wrapped__(cam), t_s, cap_sort, R
            )

        @jax.jit
        def cull_take(cam):
            # capacity-axis gather (level-layout comparison)
            return jnp.take(
                cull_check.__wrapped__(cam),
                jnp.clip(t_s["root_id"].astype(jnp.int32), 0, R - 1),
            )

        timeit_cams("cull: proj+frustum(R)", cull_proj)
        timeit_cams("cull:   +activations", cull_act)
        timeit_cams("cull:   +check_raster (no expand)", cull_check)
        timeit_cams("cull:   +seg-broadcast = full root_cull", cull_full)
        timeit_cams("cull:   +take-expand (level-layout comparison)",
                    cull_take)

    if "kernel2" in PHASES:
        # ex probe_kernel2.py: packed forward kernel alone on prebuilt
        # pair data at the bench shape, + the tile-starts searchsorted
        from log_tpu.model.tensor_tree import flat_cut_pre
        from log_tpu.model.train_step import sh_to_rgb
        from log_tpu.ops.projection import SplatCols, project_gaussians_cols

        p_s = {k: v[:cap_sort] for k, v in params.items()}
        t_s = {
            k: (v[:cap_sort]
                if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == cap
                else v)
            for k, v in tree_dev.items()
        }
        w0 = root_cull(pcams[0])

        @jax.jit
        def k2_build(cam, w_full):
            alive = jnp.arange(cap_sort) < n_alive
            splat_full, radius2d = project_gaussians_cols(
                p_s["xyz"][:, 0], p_s["xyz"][:, 1], p_s["xyz"][:, 2],
                jnp.exp(p_s["scaling"][:, 0]), jnp.exp(p_s["scaling"][:, 1]),
                jnp.exp(p_s["scaling"][:, 2]),
                p_s["rotation"][:, 0], p_s["rotation"][:, 1],
                p_s["rotation"][:, 2], p_s["rotation"][:, 3],
                jax.nn.sigmoid(p_s["opacity"][:, 0]), cam["world_view"],
                cam["full_proj"], cam["focal_x"], cam["focal_y"],
                cam["tan_fovx"], cam["tan_fovy"], H, W, mode="antialias",
                use_filter=False, active_mask=alive, tight_radius=True,
                with_cut_radius=True,
            )
            rx = t_s["root_xyz"]
            rpx, rpy, rpz, _ = gm.project_ndc_c(
                rx[..., 0], rx[..., 1], rx[..., 2], cam["full_proj"]
            )
            root_frus = gm.frustum_flag_c(rpx, rpy, rpz, padding=0.5) & alive
            radius2d_parent = gm.compute_radius2d(
                t_s["parent_xyz"], jnp.exp(t_s["parent_scaling"]),
                t_s["parent_rotation"] / jnp.maximum(
                    jnp.linalg.norm(
                        t_s["parent_rotation"], axis=-1, keepdims=True
                    ), 1e-12,
                ),
                cam["world_view"], cam["full_proj"], cam["focal_x"],
                cam["focal_y"], cam["tan_fovx"], cam["tan_fovy"],
            )
            keep = flat_cut_pre(
                t_s["index_parent"], t_s["node_index"], t_s["depth"],
                root_frus, radius2d, radius2d_parent, alive,
                jnp.float32(MIN_RES_PIXEL), jnp.int32(20),
            ) & w_full
            rad_up = splat_full.radius * (1.0 + 2.0 ** -7)
            sort_cols = {
                "px": splat_full.px, "py": splat_full.py,
                "depth": splat_full.depth,
                "p1": rt._pack2_bf16(splat_full.cxx, splat_full.cxy),
                "p2": rt._pack2_bf16(splat_full.cyy, splat_full.opacity),
                "p3": rt._pack2_bf16(sh_to_rgb(p_s["colors"][:, 0]),
                                     sh_to_rgb(p_s["colors"][:, 1])),
                "p4": rt._pack2_bf16(sh_to_rgb(p_s["colors"][:, 2]), rad_up),
            }
            cols_s, index, lane_prefix = ts._compact_flat_cols_sort(
                sort_cols, keep, k_vis
            )
            cxx_sl, cxy_sl = rt._unpack2_bf16(cols_s["p1"])
            cyy_sl, op_sl = rt._unpack2_bf16(cols_s["p2"])
            r_sl, g_sl = rt._unpack2_bf16(cols_s["p3"])
            b_sl, rad_sl = rt._unpack2_bf16(cols_s["p4"])
            valid = lane_prefix & (rad_sl > 0)
            splat_cols = SplatCols(
                px=cols_s["px"], py=cols_s["py"], cxx=cxx_sl, cxy=cxy_sl,
                cyy=cyy_sl, opacity=jnp.where(valid, op_sl, 0.0),
                depth=cols_s["depth"],
                radius=jnp.where(valid, rad_sl, 0.0), valid=valid,
            )
            es = rt.expand_sort_pairs(
                splat_cols, (r_sl, g_sl, b_sl), H, W, max_pairs,
                runs_tail_only=True, active_prefix=lane_prefix,
                inference_pack=True,
            )
            arange_t1 = jnp.arange(es["num_tiles"] + 1, dtype=jnp.int32)
            starts = jnp.searchsorted(
                es["tile_s"], arange_t1, side="left"
            ).astype(jnp.int32)
            pair_data = rt._pack_rows_impl(es["packed6"], n_out=rt.P_N_ROWS)
            return pair_data, starts, es["tiles_x"], es["tiles_y"]

        pd0, starts0, tx, ty = k2_build(pcams[0], w0)
        pd1, starts1, _, _ = k2_build(pcams[1], w0)
        tx, ty = int(tx), int(ty)
        k2_data = [(pd0, starts0), (pd1, starts1)]

        @jax.jit
        def k2_run(pair_data, starts):
            color, tfinal = rt._run_forward_packed(
                pair_data, starts[:-1], starts[1:] - starts[:-1], bg,
                tx, ty, False,
            )
            return color

        def timeit_pairs(name, fn, args_list):
            out = fn(*args_list[0])
            o = out.astype(jnp.float32).ravel()
            float(jnp.sum(
                o * (1.0 + jnp.arange(o.size, dtype=jnp.float32) * 1e-7)
            ))
            t0 = time.perf_counter()
            for i in range(REPS):
                out = fn(*args_list[i % len(args_list)])
            o = out.astype(jnp.float32).ravel()
            float(jnp.sum(
                o * (1.0 + jnp.arange(o.size, dtype=jnp.float32) * 1e-7)
            ))
            print(f"{name}: {(time.perf_counter() - t0) / REPS * 1000:.2f} ms",
                  flush=True)

        timeit_pairs("kernel2: packed forward kernel only", k2_run, k2_data)

        @jax.jit
        def k2_searchsorted(tile_s):
            arange_t1 = jnp.arange(tx * ty + 1, dtype=jnp.int32)
            return jnp.searchsorted(
                tile_s, arange_t1, side="left"
            ).astype(jnp.int32)

        tile_s0 = jnp.sort(
            jnp.cumsum(jnp.ones(max_pairs, jnp.int32)) % (tx * ty)
        )
        timeit_pairs("kernel2: searchsorted(starts)", k2_searchsorted,
                     [(tile_s0,), (tile_s0,)])

    if "prims" in PHASES:
        # ex probe_prims.py: primitive costs for the expansion redesign
        R = n_roots_bucket
        rng = np.random.default_rng(0)
        rid_np = rng.integers(0, R, cap_sort).astype(np.int32)
        rid = jnp.asarray(rid_np)
        rid_sorted = jnp.asarray(np.sort(rid_np))
        counts = np.bincount(rid_np, minlength=R)
        starts = jnp.asarray(
            np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
        )
        wts = [jnp.asarray(rng.random(R) > 0.5) for _ in range(4)]
        runs_idx = jnp.asarray(
            rng.integers(0, R, 1_080_000).astype(np.int32)
        )

        def timeit_w(name, fn):
            out = fn(wts[0])
            o = out.astype(jnp.float32).ravel()
            float(jnp.sum(
                o * (1.0 + jnp.arange(o.size, dtype=jnp.float32) * 1e-7)
            ))
            t0 = time.perf_counter()
            for i in range(REPS):
                out = fn(wts[i % len(wts)])
            o = out.astype(jnp.float32).ravel()
            float(jnp.sum(
                o * (1.0 + jnp.arange(o.size, dtype=jnp.float32) * 1e-7)
            ))
            print(f"{name}: {(time.perf_counter() - t0) / REPS * 1000:.2f} ms",
                  flush=True)

        timeit_w(f"prims: take {cap_sort} random",
                 jax.jit(lambda w: jnp.take(w, rid)))
        timeit_w(f"prims: take {cap_sort} sorted-indices",
                 jax.jit(lambda w: w.at[rid_sorted].get(
                     mode="promise_in_bounds", indices_are_sorted=True)))
        timeit_w("prims: take 1.08M (run roots)",
                 jax.jit(lambda w: jnp.take(w, runs_idx)))
        timeit_w(
            f"prims: scatter-set {R} -> {cap_sort} (static sorted idx)",
            jax.jit(lambda w: jnp.zeros(cap_sort, jnp.int32).at[starts].set(
                starts * 2 + w.astype(jnp.int32) + 1,
                mode="promise_in_bounds", unique_indices=True,
                indices_are_sorted=True)),
        )

        @jax.jit
        def prim_scat_cummax(w):
            b = jnp.zeros(cap_sort, jnp.int32).at[starts].set(
                starts * 2 + w.astype(jnp.int32) + 1,
                mode="promise_in_bounds", unique_indices=True,
                indices_are_sorted=True,
            )
            return (jax.lax.cummax(b) & 1).astype(jnp.bool_)

        timeit_w("prims: scatter + cummax broadcast (full expansion)",
                 prim_scat_cummax)
        timeit_w(
            f"prims: cummax {cap_sort} only",
            jax.jit(lambda w: jax.lax.cummax(
                jnp.zeros(cap_sort, jnp.int32).at[0].set(
                    w[0].astype(jnp.int32)))),
        )
        timeit_w(
            "prims: jnp.repeat segment broadcast",
            jax.jit(lambda w: jnp.repeat(
                w, jnp.diff(jnp.append(starts, cap_sort)),
                total_repeat_length=cap_sort)),
        )

    if "blocksize" in PHASES:
        # ex probe_blocksize.py: sweep block size S for the block frame
        from log_tpu.model.block_render import build_block_cache, render_blocks

        w0 = root_cull(pcams[0], full_cap=True)
        for S in (512, 1024, 2048, 4096):
            if cap % S:
                continue
            cols, meta = build_block_cache(
                params, tree_dev, is_leaf_opt, n_alive, S
            )
            B = cap // S
            for min_res in (MIN_RES_PIXEL, 96.0):
                _, _, c0 = render_blocks(
                    cols, meta, pcams[0], jnp.float32(min_res), jnp.int32(20),
                    bg, H, W, k_blocks=B, k_visible=min(1 << 21, cap),
                    max_pairs=1 << 21, w_full=w0,
                )
                ca = np.asarray(c0)
                cutS = int(ca[:2].sum())
                n_elig = int(ca[3])
                for ci in (3, 6):
                    _, _, c2 = render_blocks(
                        cols, meta, pcams[ci], jnp.float32(min_res),
                        jnp.int32(20), bg, H, W, k_blocks=B,
                        k_visible=min(1 << 21, cap), max_pairs=1 << 21,
                        w_full=w0,
                    )
                    n_elig = max(n_elig, int(np.asarray(c2)[3]))
                kb = min(B, max(16, -(-int(n_elig * 1.3) // 16) * 16))
                k_visS = min(next_capacity(int(cutS * 1.2), 1 << 15), cap)
                mp = pick_max_pairs(int(max(ca[2], 1) * 1.3), per_point=1)

                def bsframe(cam):
                    img, _, _ = render_blocks(
                        cols, meta, cam, jnp.float32(min_res), jnp.int32(20),
                        bg, H, W, k_blocks=kb, k_visible=k_visS,
                        max_pairs=mp, w_full=w0,
                    )
                    return img

                timeit_cams(
                    f"blocksize S={S} B={B} min_res={min_res:g} cut={cutS} "
                    f"kb={kb} rows={kb * S} elig={n_elig}", bsframe,
                )

    if "demand" in PHASES:
        # ex probe_demand.py: unclamped pair demand per camera at several
        # TILE_H values, circle-rect vs ellipse-bbox binning
        from log_tpu.model.tensor_tree import flat_cut_pre
        from log_tpu.ops.projection import project_gaussians

        @partial(jax.jit, static_argnames=("tile_h", "use_bbox", "min_res"))
        def pair_demand(cam, tile_h, use_bbox, min_res):
            alive = jnp.arange(cap) < n_alive
            rx = tree_dev["root_xyz"]
            rpx, rpy, rpz, _ = gm.project_ndc_c(
                rx[..., 0], rx[..., 1], rx[..., 2], cam["full_proj"]
            )
            root_frus = gm.frustum_flag_c(rpx, rpy, rpz, padding=0.5) & alive
            scaling_full = jnp.exp(params["scaling"])
            rotation_full = params["rotation"] / jnp.maximum(
                jnp.linalg.norm(params["rotation"], axis=-1, keepdims=True),
                1e-12,
            )
            r2d = gm.compute_radius2d(
                params["xyz"], scaling_full, rotation_full, cam["world_view"],
                cam["full_proj"], cam["focal_x"], cam["focal_y"],
                cam["tan_fovx"], cam["tan_fovy"],
            )
            r2dp = gm.compute_radius2d(
                tree_dev["parent_xyz"], jnp.exp(tree_dev["parent_scaling"]),
                tree_dev["parent_rotation"] / jnp.maximum(
                    jnp.linalg.norm(
                        tree_dev["parent_rotation"], axis=-1, keepdims=True
                    ), 1e-12,
                ),
                cam["world_view"], cam["full_proj"], cam["focal_x"],
                cam["focal_y"], cam["tan_fovx"], cam["tan_fovy"],
            )
            keep = flat_cut_pre(
                tree_dev["index_parent"], tree_dev["node_index"],
                tree_dev["depth"], root_frus, r2d, r2dp, alive,
                jnp.float32(min_res), jnp.int32(20),
            )
            sp = project_gaussians(
                params["xyz"], scaling_full, rotation_full,
                jax.nn.sigmoid(params["opacity"][:, 0]), cam["world_view"],
                cam["full_proj"], cam["focal_x"], cam["focal_y"],
                cam["tan_fovx"], cam["tan_fovy"], H, W, mode="antialias",
                use_filter=False, active_mask=keep, tight_radius=True,
            )
            tiles_x = -(-W // 128)
            tiles_y = -(-H // tile_h)
            px, radius = sp.pix_xy, sp.radius
            valid = sp.valid & (radius > 0)
            if use_bbox:
                ext_x, ext_y = rt.splat_extents(
                    sp.conic[:, 0], sp.conic[:, 1], sp.conic[:, 2],
                    sp.opacity, radius,
                )
            else:
                ext_x = ext_y = radius
            x0 = jnp.clip(((px[:, 0] - ext_x) / 128).astype(jnp.int32),
                          0, tiles_x)
            y0 = jnp.clip(((px[:, 1] - ext_y) / tile_h).astype(jnp.int32),
                          0, tiles_y)
            x1 = jnp.clip(((px[:, 0] + ext_x + 127) / 128).astype(jnp.int32),
                          0, tiles_x)
            y1 = jnp.clip(
                ((px[:, 1] + ext_y + tile_h - 1) / tile_h).astype(jnp.int32),
                0, tiles_y,
            )
            pairs = jnp.where(
                valid, jnp.maximum(x1 - x0, 0) * jnp.maximum(y1 - y0, 0), 0
            )
            return jnp.sum(keep), jnp.sum(pairs), jnp.sum(valid)

        for min_res in (MIN_RES_PIXEL, 96.0):
            for tile_h in (8, 16, 32):
                for use_bbox in (False, True):
                    per_cam = [
                        int(pair_demand(cam, tile_h, use_bbox, min_res)[1])
                        for cam in pcams
                    ]
                    arr = np.array(per_cam)
                    print(
                        f"demand min_res={min_res:g} tile_h={tile_h} "
                        f"bbox={int(use_bbox)} max={arr.max()} "
                        f"mean={arr.mean():.0f} min={arr.min()}",
                        flush=True,
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
