"""Dissect the packed fused frame (round-4 headline): stage-prefix timings
of fused_prepare_render's flat_slice packed branch at the bench config.

Stages (cumulative prefixes, each its own executable):
  proj      full-axis projection (cap_sort rows, with_cut_radius)
  cut       + flat_cut_pre & w_full + counts
  compact   + bf16 pack + 7-payload compaction sort
  expand    + unpack + SplatCols + expand_sort_pairs(inference_pack)
  packrows  + _pack_rows_impl (8, A) pair pack
  full      the real fused_prepare_render frame (same args)

Usage: python scripts/probe_frame.py [n_roots] [min_res]
"""
from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_ROOTS = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
MIN_RES = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0
H, W = 1088, 1920
REPS = int(os.environ.get("REPS", "10"))


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
    from log_tpu.model.train_step import (
        fused_prepare_render, fused_root_cull, sh_to_rgb,
    )
    from log_tpu.ops import gaussian_math as gm
    from log_tpu.ops import pick_max_pairs
    from log_tpu.ops.projection import SplatCols, project_gaussians_cols
    from log_tpu.ops.rasterize_tiled import (
        PACK_CHUNK, P_N_ROWS, _pack2_bf16, _pack_rows_impl, _unpack2_bf16,
        expand_sort_pairs,
    )
    from log_tpu.render.renderer import camera_device
    from log_tpu.utils.synth_tree import padded_model_device, tree_sizes

    _, _, n = tree_sizes(N_ROOTS)
    cap = next_capacity(n)
    params, tree_dev, is_leaf_opt = padded_model_device(
        jax.random.PRNGKey(0), N_ROOTS, cap, "root_major"
    )
    n_roots_bucket = min(next_capacity(N_ROOTS), cap)
    cap_sort = min(cap, -(-n // (1 << 18)) * (1 << 18))
    pcams = [
        camera_device(prepare_camera(make_cam(2 * math.pi * i / 32), 1, 0.01, 1000.0))
        for i in range(4)
    ]

    def root_cull(cam):
        return fused_root_cull(
            params, tree_dev, cam, jnp.int32(n), H, W,
            prep_backend="tiled", prep_max_pairs=1 << 19, check_scale=4,
            n_roots=n_roots_bucket, cap_sort=cap_sort,
        )

    w0 = root_cull(pcams[0])

    common = dict(
        n_alive=jnp.int32(n), is_leaf_opt=is_leaf_opt,
        min_resolution_pixel=jnp.float32(MIN_RES),
        current_depth=jnp.int32(20),
        background=jnp.zeros(3, jnp.float32),
        image_height=H, image_width=W,
        sh_degree=0, stage_has_tree=True, num_levels=3,
        backend="tiled", check_scale=4,
        cut_method="flat_slice", n_roots=n_roots_bucket,
        prep_backend="tiled", prep_max_pairs=1 << 19,
        cap_sort=cap_sort,
    )
    _, _, counts = fused_prepare_render(
        params, tree_dev, pcams[0], k_visible=min(1 << 21, cap),
        max_pairs=1 << 21, w_full=w0, **common,
    )
    c = np.asarray(counts)
    cut = int(c[:2].sum())
    k_vis = min(next_capacity(int(cut * 1.2), 1 << 15), cap)
    max_pairs = pick_max_pairs(k_vis, per_point=6)
    if len(c) > 2 and c[2] > 0:
        max_pairs = min(max_pairs, pick_max_pairs(int(c[2] * 1.25), per_point=1))
    print(f"n={n} cap_sort={cap_sort} cut={cut} k_vis={k_vis} "
          f"max_pairs={max_pairs}", flush=True)

    # sliced copies (mirror fused_prepare_render's cap_sort slicing)
    p_s = {k: v[:cap_sort] for k, v in params.items()}
    t_s = {
        k: (v[:cap_sort] if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == cap else v)
        for k, v in tree_dev.items()
    }
    ileaf_s = is_leaf_opt[:cap_sort]
    n_al = jnp.int32(n)
    min_res = jnp.float32(MIN_RES)
    cur_depth = jnp.int32(20)

    def proj_core(p_s, cam):
        alive = jnp.arange(cap_sort) < n_al
        op_full = jax.nn.sigmoid(p_s["opacity"][:, 0])
        splat_full, radius2d = project_gaussians_cols(
            p_s["xyz"][:, 0], p_s["xyz"][:, 1], p_s["xyz"][:, 2],
            jnp.exp(p_s["scaling"][:, 0]), jnp.exp(p_s["scaling"][:, 1]),
            jnp.exp(p_s["scaling"][:, 2]),
            p_s["rotation"][:, 0], p_s["rotation"][:, 1],
            p_s["rotation"][:, 2], p_s["rotation"][:, 3],
            op_full, cam["world_view"], cam["full_proj"],
            cam["focal_x"], cam["focal_y"], cam["tan_fovx"], cam["tan_fovy"],
            H, W, mode="antialias", use_filter=False, active_mask=alive,
            tight_radius=True, with_cut_radius=True,
        )
        return splat_full, radius2d, alive

    def cut_core(p_s, t_s, cam, w_full):
        splat_full, radius2d, alive = proj_core(p_s, cam)
        rx = t_s["root_xyz"]
        rpx, rpy, rpz, _ = gm.project_ndc_c(
            rx[..., 0], rx[..., 1], rx[..., 2], cam["full_proj"]
        )
        root_frus = gm.frustum_flag_c(rpx, rpy, rpz, padding=0.5) & alive
        radius2d_parent = gm.compute_radius2d(
            t_s["parent_xyz"], jnp.exp(t_s["parent_scaling"]),
            t_s["parent_rotation"] / jnp.maximum(
                jnp.linalg.norm(t_s["parent_rotation"], axis=-1, keepdims=True),
                1e-12,
            ),
            cam["world_view"], cam["full_proj"], cam["focal_x"],
            cam["focal_y"], cam["tan_fovx"], cam["tan_fovy"],
        )
        keep = flat_cut_pre(
            t_s["index_parent"], t_s["node_index"], t_s["depth"],
            root_frus, radius2d, radius2d_parent, alive, min_res, cur_depth,
        )
        keep = keep & w_full
        return splat_full, keep

    def compact_core(p_s, t_s, cam, w_full):
        splat_full, keep = cut_core(p_s, t_s, cam, w_full)
        rad_up = splat_full.radius * (1.0 + 2.0 ** -7)
        col_r = sh_to_rgb(p_s["colors"][:, 0])
        col_g = sh_to_rgb(p_s["colors"][:, 1])
        col_b = sh_to_rgb(p_s["colors"][:, 2])
        sort_cols = {
            "px": splat_full.px, "py": splat_full.py,
            "depth": splat_full.depth,
            "p1": _pack2_bf16(splat_full.cxx, splat_full.cxy),
            "p2": _pack2_bf16(splat_full.cyy, splat_full.opacity),
            "p3": _pack2_bf16(col_r, col_g),
            "p4": _pack2_bf16(col_b, rad_up),
        }
        cols_s, index, lane_prefix = ts._compact_flat_cols_sort(
            sort_cols, keep, k_vis
        )
        return cols_s, lane_prefix

    def splat_core(p_s, t_s, cam, w_full):
        cols_s, lane_prefix = compact_core(p_s, t_s, cam, w_full)
        cxx_sl, cxy_sl = _unpack2_bf16(cols_s["p1"])
        cyy_sl, op_sl = _unpack2_bf16(cols_s["p2"])
        r_sl, g_sl = _unpack2_bf16(cols_s["p3"])
        b_sl, rad_sl = _unpack2_bf16(cols_s["p4"])
        valid = lane_prefix & (rad_sl > 0)
        splat_cols = SplatCols(
            px=cols_s["px"], py=cols_s["py"], cxx=cxx_sl, cxy=cxy_sl,
            cyy=cyy_sl, opacity=jnp.where(valid, op_sl, 0.0),
            depth=cols_s["depth"],
            radius=jnp.where(valid, rad_sl, 0.0), valid=valid,
        )
        return splat_cols, (r_sl, g_sl, b_sl), lane_prefix

    @jax.jit
    def stage_proj(p_s, cam):
        s, r, _ = proj_core(p_s, cam)
        return s.radius

    @jax.jit
    def stage_cut(p_s, t_s, cam, w_full):
        _, keep = cut_core(p_s, t_s, cam, w_full)
        return keep.astype(jnp.float32)

    @jax.jit
    def stage_compact(p_s, t_s, cam, w_full):
        cols_s, _ = compact_core(p_s, t_s, cam, w_full)
        return cols_s["px"]

    @jax.jit
    def stage_expand(p_s, t_s, cam, w_full):
        splat_cols, rgb, lane_prefix = splat_core(p_s, t_s, cam, w_full)
        es = expand_sort_pairs(
            splat_cols, rgb, H, W, max_pairs,
            runs_tail_only=True, active_prefix=lane_prefix,
            inference_pack=True,
        )
        return es["tile_s"].astype(jnp.float32)

    @jax.jit
    def stage_packrows(p_s, t_s, cam, w_full):
        splat_cols, rgb, lane_prefix = splat_core(p_s, t_s, cam, w_full)
        es = expand_sort_pairs(
            splat_cols, rgb, H, W, max_pairs,
            runs_tail_only=True, active_prefix=lane_prefix,
            inference_pack=True,
        )
        pair_data = _pack_rows_impl(es["packed6"], n_out=P_N_ROWS)
        return pair_data

    def stage_full(cam, w_full):
        img, _, cnt = fused_prepare_render(
            params, tree_dev, cam, k_visible=k_vis, max_pairs=max_pairs,
            w_full=w_full, **common,
        )
        return img

    def timeit_cams(name, fn, *extra):
        out = fn(pcams[0], *extra)
        out = out[-1] if isinstance(out, tuple) else out
        o = out.astype(jnp.float32).ravel()
        float(jnp.sum(o * (1.0 + jnp.arange(o.size, dtype=jnp.float32) * 1e-7)))
        t0 = time.perf_counter()
        for i in range(REPS):
            out = fn(pcams[i % len(pcams)], *extra)
        out = out[-1] if isinstance(out, tuple) else out
        o = out.astype(jnp.float32).ravel()
        float(jnp.sum(o * (1.0 + jnp.arange(o.size, dtype=jnp.float32) * 1e-7)))
        dt = (time.perf_counter() - t0) / REPS * 1000
        print(f"{name}: {dt:.2f} ms", flush=True)
        return dt

    def timeit_cams2(name, fn, *lead):
        def g(cam, *extra):
            return fn(*lead, cam, *extra)
        return timeit_cams(name, g)

    def timeit_cams3(name, fn, *lead):
        def g(cam):
            return fn(*lead, cam, w0)
        return timeit_cams(name, g)

    timeit_cams2("proj(full-axis)", stage_proj, p_s)
    timeit_cams3("  +cut", stage_cut, p_s, t_s)
    timeit_cams3("  +pack+compact_sort", stage_compact, p_s, t_s)
    timeit_cams3("  +expand_sort_pairs", stage_expand, p_s, t_s)
    timeit_cams3("  +pack_rows", stage_packrows, p_s, t_s)
    timeit_cams("full frame", stage_full, w0)


if __name__ == "__main__":
    main()
