"""Perf exploration: full-frame (LoD cut + prepare + 1080p render) timing on
a synthetic multi-M-point urban-style tree model, phase by phase.

Usage: python scripts/bench_explore.py [n_roots] [phase ...]
Phases: prepare render fused  (default: all)
"""
from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_ROOTS = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
PHASES = sys.argv[2:] or ["prepare", "render", "fused"]
H, W = 1088, 1920
FRAMES = 20


def main():
    import jax
    import jax.numpy as jnp

    from log_tpu.dataset.base import prepare_camera
    from log_tpu.model.gaussian import next_capacity
    from log_tpu.model.train_step import fused_prepare_render, prepare_visibility
    from log_tpu.render.renderer import camera_device

    from log_tpu.utils.synth_tree import padded_model_device, tree_sizes

    _, _, n = tree_sizes(N_ROOTS)
    cap = next_capacity(n)
    print(f"scene: {n} pts, capacity {cap}", flush=True)
    params, tree_dev, is_leaf_opt = padded_model_device(
        jax.random.PRNGKey(0), N_ROOTS, cap
    )
    n_roots_bucket = min(next_capacity(N_ROOTS), cap)

    # oblique aerial cameras orbiting the scene center
    def make_cam(theta, height=18.0, radius=22.0):
        pos = np.array([radius * math.cos(theta), radius * math.sin(theta),
                        height])
        look = np.array([0.0, 0.0, 0.0])
        fwd = look - pos
        fwd = fwd / np.linalg.norm(fwd)
        right = np.cross(fwd, np.array([0, 0, 1.0]))
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        R = np.stack([right, up, fwd])  # world->cam rows
        T = (-R @ pos).reshape(3, 1)
        K = np.array([[1400.0, 0, W / 2], [0, 1400.0, H / 2], [0, 0, 1]])
        return {"K": K, "R": R, "T": T, "H": H, "W": W,
                "center": pos.reshape(3, 1)}

    pcams = [
        camera_device(prepare_camera(make_cam(2 * math.pi * i / (FRAMES + 2)),
                                     1, 0.01, 1000.0))
        for i in range(FRAMES + 2)
    ]

    @jax.jit
    def checksum(x):
        return jnp.sum(x * (1.0 + 0.0 * x))

    common = dict(
        n_alive=jnp.int32(n), is_leaf_opt=is_leaf_opt,
        min_resolution_pixel=jnp.float32(3.0), current_depth=jnp.int32(20),
        image_height=H, image_width=W, stage_has_tree=True, num_levels=3,
        backend="tiled", max_pairs=1 << 21, check_scale=4,
        cut_method="flat", n_roots=n_roots_bucket,
    )

    def prep(cam):
        return prepare_visibility(
            params, tree_dev, cam, **common,
        )

    # measure the cut size first
    kl, kn, counts = prep(pcams[0])
    c = np.asarray(counts)
    print(f"cut: leaf {c[0]} node {c[1]}")
    k_vis = next_capacity(int(c.sum() * 1.3), 1 << 15)
    print(f"k_visible bucket {k_vis}")

    def time_phase(name, fn, out_of):
        fn(pcams[0]); fn(pcams[1])  # compile+warm
        jax.block_until_ready(out_of(fn(pcams[1])))
        t0 = time.perf_counter()
        for i in range(FRAMES):
            r = fn(pcams[2 + i])
        float(checksum(out_of(r)))
        dt = (time.perf_counter() - t0) / FRAMES * 1000
        print(f"{name}: {dt:.1f} ms/frame ({1000/dt:.1f} FPS)")
        return dt

    if "prepare" in PHASES:
        time_phase("prepare(flat cut + check)", prep, lambda o: o[2])
        nochk = dict(common)
        nochk["check_scale"] = 16
        time_phase(
            "prepare(check/16)",
            lambda cam: prepare_visibility(params, tree_dev, cam, **nochk),
            lambda o: o[2],
        )

    if "micro" in PHASES:
        from log_tpu.ops import gaussian_math as gm

        @jax.jit
        def radius_pass(cam):
            scaling = jnp.exp(params["scaling"])
            rotation = params["rotation"] / jnp.linalg.norm(
                params["rotation"], axis=-1, keepdims=True
            )
            return gm.compute_radius2d(
                params["xyz"], scaling, rotation, cam["world_view"],
                cam["full_proj"], cam["focal_x"], cam["focal_y"],
                cam["tan_fovx"], cam["tan_fovy"],
            )

        time_phase("radius2d @cap", radius_pass, lambda o: o)

        @jax.jit
        def frustum_pass(cam):
            xyz = params["xyz"]
            px, py, pz, _ = gm.project_ndc_c(
                xyz[..., 0], xyz[..., 1], xyz[..., 2], cam["full_proj"]
            )
            return gm.frustum_flag_c(px, py, pz, padding=0.5)

        time_phase("frustum @cap", frustum_pass, lambda o: o)

        @jax.jit
        def parent_radius_pass(cam):
            scaling = jnp.exp(tree_dev["parent_scaling"])
            rotation = tree_dev["parent_rotation"] / jnp.maximum(
                jnp.linalg.norm(
                    tree_dev["parent_rotation"], axis=-1, keepdims=True
                ), 1e-12,
            )
            return gm.compute_radius2d(
                tree_dev["parent_xyz"], scaling, rotation, cam["world_view"],
                cam["full_proj"], cam["focal_x"], cam["focal_y"],
                cam["tan_fovx"], cam["tan_fovy"],
            )

        time_phase("parent radius2d @cap", parent_radius_pass, lambda o: o)

        rv = jnp.asarray(np.random.default_rng(1).random(cap) < 0.5)

        @jax.jit
        def rootvis_gather(cam):
            # cam unused; keep signature for time_phase
            return rv[jnp.maximum(tree_dev["root_id"], 0)]

        time_phase("root_visible gather @cap", rootvis_gather, lambda o: o)

        @jax.jit
        def parent_radius_gather(cam):
            r = radius_pass.__wrapped__(cam)
            return r[jnp.maximum(tree_dev["index_parent"], 0)]

        time_phase("radius + parent GATHER @cap", parent_radius_gather,
                   lambda o: o)

        @jax.jit
        def check_only(cam):
            scaling = jnp.exp(params["scaling"][:n_roots_bucket])
            rotation = params["rotation"][:n_roots_bucket]
            rotation = rotation / jnp.linalg.norm(
                rotation, axis=-1, keepdims=True
            )
            opacity = jax.nn.sigmoid(params["opacity"][:n_roots_bucket, 0])
            xyz = params["xyz"][:n_roots_bucket]
            px, py, pz, _ = gm.project_ndc_c(
                xyz[..., 0], xyz[..., 1], xyz[..., 2], cam["full_proj"]
            )
            cand = gm.frustum_flag_c(px, py, pz, padding=0.5)
            from log_tpu.ops.rasterize_tiled import rasterize_tiled

            out = rasterize_tiled(
                xyz=xyz, colors=jnp.ones_like(xyz), opacity=opacity,
                scaling=scaling, rotation=rotation,
                means2d_offset=jnp.zeros_like(xyz[:, :2]),
                world_view=cam["world_view"], full_proj=cam["full_proj"],
                focal_x=cam["focal_x"] / 4, focal_y=cam["focal_y"] / 4,
                tan_fovx=cam["tan_fovx"], tan_fovy=cam["tan_fovy"],
                background=jnp.zeros(3), image_height=H // 4,
                image_width=W // 4, active_mask=cand, mode="antialias",
                use_filter=True, max_pairs=1 << 21, with_stats="weights",
            )
            return out["point_weight"]

        time_phase("check render @roots", check_only, lambda o: o)

        @jax.jit
        def nonzero_pass(cam):
            keep = rv
            return jnp.nonzero(keep, size=k_vis, fill_value=cap)[0]

        time_phase("nonzero @cap", nonzero_pass, lambda o: o)

        @jax.jit
        def nonzero_manual(cam):
            keep = rv
            dest = jnp.cumsum(keep.astype(jnp.int32)) - 1
            dest = jnp.where(keep, dest, k_vis)
            return (
                jnp.full((k_vis + 1,), cap, jnp.int32)
                .at[dest]
                .set(jnp.arange(cap, dtype=jnp.int32), mode="drop")[:k_vis]
            )

        time_phase("nonzero manual cumsum+scatter", nonzero_manual,
                   lambda o: o)

        GROUP = 128

        @jax.jit
        def group_compact(cam):
            keep = rv.reshape(-1, GROUP)
            ganv = keep.any(axis=1)  # (cap/GROUP,)
            gidx = jnp.nonzero(
                ganv, size=k_vis // GROUP, fill_value=cap // GROUP
            )[0]
            return gidx

        time_phase("group(128) nonzero", group_compact, lambda o: o)

        @jax.jit
        def group_gather(cam):
            gidx = group_compact.__wrapped__(cam)
            rows = params["xyz"].reshape(-1, GROUP, 3)
            return rows.at[gidx].get(mode="fill", fill_value=0.0)

        time_phase("group(128) nonzero+xyz gather", group_gather,
                   lambda o: o)

        @jax.jit
        def gather_slices_pass(cam):
            idx = jnp.nonzero(rv, size=k_vis, fill_value=cap)[0]
            lane_valid = idx < cap
            from log_tpu.model.train_step import _gather_slices

            return _gather_slices(params, idx, lane_valid)

        time_phase("nonzero+slice gather @k_vis", gather_slices_pass,
                   lambda o: o["xyz"])

    if "fused" in PHASES:
        def fused(cam):
            return fused_prepare_render(
                params, tree_dev, cam,
                n_alive=jnp.int32(n),
                is_leaf_opt=is_leaf_opt,
                min_resolution_pixel=jnp.float32(3.0),
                current_depth=jnp.int32(20),
                background=jnp.zeros(3, jnp.float32),
                image_height=H, image_width=W, k_visible=k_vis,
                sh_degree=0, stage_has_tree=True, num_levels=3,
                backend="tiled", max_pairs=1 << 21, check_scale=4,
                cut_method="flat", n_roots=n_roots_bucket,
                prep_backend="tiled", prep_max_pairs=1 << 21,
            )
        time_phase("FUSED cut+prepare+render", fused, lambda o: o[0])

    if "render2" in PHASES:
        # pair-pipeline breakdown at the cut size
        keep = kl | kn
        from log_tpu.model.train_step import _gather_slices
        from log_tpu.ops.projection import project_gaussians
        from log_tpu.ops.rasterize_tiled import build_pairs
        from log_tpu.ops.sh import sh_to_rgb

        @jax.jit
        def slices_of(cam):
            index = jnp.nonzero(keep, size=k_vis, fill_value=cap)[0]
            lane_valid = index < cap
            s = _gather_slices(params, index, lane_valid)
            return s, lane_valid

        s0, lv0 = slices_of(pcams[0])
        s0 = jax.tree.map(jax.block_until_ready, s0)

        def splats_of(s, lv, cam):
            return project_gaussians(
                xyz=s["xyz"],
                scaling=jnp.exp(s["scaling"]),
                rotation=s["rotation"] / jnp.linalg.norm(
                    s["rotation"], axis=-1, keepdims=True
                ),
                opacity=jax.nn.sigmoid(s["opacity"][:, 0]),
                world_view=cam["world_view"], full_proj=cam["full_proj"],
                focal_x=cam["focal_x"], focal_y=cam["focal_y"],
                tan_fovx=cam["tan_fovx"], tan_fovy=cam["tan_fovy"],
                image_height=H, image_width=W, mode="antialias",
                use_filter=False, active_mask=lv,
            )

        @jax.jit
        def proj_only(cam):
            return splats_of(s0, lv0, cam).radius

        time_phase("proj @k_vis", proj_only, lambda o: o)

        @jax.jit
        def pairs_total(cam):
            sp = splats_of(s0, lv0, cam)
            px = sp.pix_xy
            radius = sp.radius
            valid = sp.valid & (radius > 0)
            from log_tpu.ops.rasterize_tiled import TILE_H, TILE_W

            tiles_x = (W + TILE_W - 1) // TILE_W
            tiles_y = (H + TILE_H - 1) // TILE_H
            x0 = jnp.clip(((px[:, 0] - radius) / TILE_W).astype(jnp.int32), 0, tiles_x)
            y0 = jnp.clip(((px[:, 1] - radius) / TILE_H).astype(jnp.int32), 0, tiles_y)
            x1 = jnp.clip(((px[:, 0] + radius + TILE_W - 1) / TILE_W).astype(jnp.int32), 0, tiles_x)
            y1 = jnp.clip(((px[:, 1] + radius + TILE_H - 1) / TILE_H).astype(jnp.int32), 0, tiles_y)
            n = jnp.where(valid, jnp.maximum(x1 - x0, 0) * jnp.maximum(y1 - y0, 0), 0)
            return jnp.sum(n)

        tp = int(pairs_total(pcams[0]))
        print(f"actual pairs at cut: {tp}")
        A2 = 1 << max(int(tp * 1.3 - 1).bit_length(), 16)
        print(f"sized A: {A2}")

        @jax.jit
        def binning_only(cam):
            sp = splats_of(s0, lv0, cam)
            pairs = build_pairs(
                sp, sh_to_rgb(s0["colors"]), H, W, A2
            )
            return pairs["pair_data"]

        time_phase(f"build_pairs @A={A2}", binning_only, lambda o: o)

        @jax.jit
        def render_sized(cam):
            from log_tpu.ops.rasterize_tiled import rasterize_tiled

            out = rasterize_tiled(
                xyz=s0["xyz"],
                colors=sh_to_rgb(s0["colors"]),
                opacity=jax.nn.sigmoid(s0["opacity"][:, 0]),
                scaling=jnp.exp(s0["scaling"]),
                rotation=s0["rotation"] / jnp.linalg.norm(
                    s0["rotation"], axis=-1, keepdims=True
                ),
                means2d_offset=jnp.zeros((k_vis, 2), jnp.float32),
                world_view=cam["world_view"], full_proj=cam["full_proj"],
                focal_x=cam["focal_x"], focal_y=cam["focal_y"],
                tan_fovx=cam["tan_fovx"], tan_fovy=cam["tan_fovy"],
                background=jnp.zeros(3, jnp.float32),
                image_height=H, image_width=W,
                active_mask=lv0, mode="antialias", use_filter=False,
                max_pairs=A2, with_stats=False,
            )
            return out["render"]

        time_phase(f"raster @k_vis A={A2}", render_sized, lambda o: o)

        @jax.jit
        def check_sized(cam):
            scaling = jnp.exp(params["scaling"][:n_roots_bucket])
            rotation = params["rotation"][:n_roots_bucket]
            rotation = rotation / jnp.linalg.norm(
                rotation, axis=-1, keepdims=True
            )
            opacity = jax.nn.sigmoid(params["opacity"][:n_roots_bucket, 0])
            xyz = params["xyz"][:n_roots_bucket]
            from log_tpu.ops import gaussian_math as gm

            px, py, pz, _ = gm.project_ndc_c(
                xyz[..., 0], xyz[..., 1], xyz[..., 2], cam["full_proj"]
            )
            cand = gm.frustum_flag_c(px, py, pz, padding=0.5)
            from log_tpu.ops.rasterize_tiled import rasterize_tiled

            out = rasterize_tiled(
                xyz=xyz, colors=jnp.ones_like(xyz), opacity=opacity,
                scaling=scaling, rotation=rotation,
                means2d_offset=jnp.zeros_like(xyz[:, :2]),
                world_view=cam["world_view"], full_proj=cam["full_proj"],
                focal_x=cam["focal_x"] / 4, focal_y=cam["focal_y"] / 4,
                tan_fovx=cam["tan_fovx"], tan_fovy=cam["tan_fovy"],
                background=jnp.zeros(3), image_height=H // 4,
                image_width=W // 4, active_mask=cand, mode="antialias",
                use_filter=True, max_pairs=1 << 19, with_stats="weights",
            )
            return out["point_weight"]

        time_phase("check render A=1<<19", check_sized, lambda o: o)

    if "binning2" in PHASES:
        P2 = k_vis  # run-count scale (the cut)
        A2 = 1 << 22
        rngl = np.random.default_rng(3)
        counts_sim = rngl.integers(0, 10, P2).astype(np.int32)
        offs_np = np.cumsum(counts_sim) - counts_sim
        offs = jnp.asarray(np.minimum(offs_np, A2).astype(np.int32))
        vals15 = jnp.asarray(rngl.random((15, P2), np.float32))
        vals8 = vals15[:8]

        from log_tpu.ops.rasterize_tiled import _piecewise_expand_sort

        @jax.jit
        def exp_sort15(cam):
            return _piecewise_expand_sort(vals15, offs, A2)

        time_phase(f"expand SORT 15rows P={P2} A={A2}", exp_sort15,
                   lambda o: o)

        @jax.jit
        def exp_sort8(cam):
            return _piecewise_expand_sort(vals8, offs, A2)

        time_phase(f"expand SORT 8rows P={P2} A={A2}", exp_sort8,
                   lambda o: o)

        @jax.jit
        def exp_scatter15(cam):
            deltas = jnp.concatenate(
                [vals15[:, :1], vals15[:, 1:] - vals15[:, :-1]], axis=1
            )
            base = jnp.zeros((15, A2), jnp.float32)
            seeded = base.at[:, offs].add(deltas, mode="drop")
            return jnp.cumsum(seeded, axis=1)

        time_phase(f"expand SCATTER 15rows P={P2} A={A2}", exp_scatter15,
                   lambda o: o)

        keys_sim = jnp.asarray(
            rngl.integers(0, 1 << 20, A2).astype(np.uint32)
        )
        pay11 = jnp.asarray(rngl.random((11, A2), np.float32))

        @jax.jit
        def pair_sort11(cam):
            ops = (keys_sim,) + tuple(pay11[r] for r in range(11))
            return jax.lax.sort(ops, num_keys=1, is_stable=False)[1]

        time_phase(f"pair sort 11 payloads A={A2}", pair_sort11, lambda o: o)

        @jax.jit
        def pair_sort6(cam):
            ops = (keys_sim,) + tuple(pay11[r] for r in range(6))
            return jax.lax.sort(ops, num_keys=1, is_stable=False)[1]

        time_phase(f"pair sort 6 payloads A={A2}", pair_sort6, lambda o: o)

    if "group2" in PHASES:
        keep0 = kl | kn
        G = 128
        nG = cap // G
        Kg = k_vis // G

        @jax.jit
        def group_pipeline(cam, keep):
            c = jnp.cumsum(keep.astype(jnp.int32))
            ends = c.reshape(nG, G)[:, -1]
            gcnt = jnp.diff(ends, prepend=0)
            gany = gcnt > 0
            gdest = jnp.cumsum(gany.astype(jnp.int32)) - 1
            gdest = jnp.where(gany, gdest, Kg)
            gidx = (
                jnp.full((Kg + 1,), nG, jnp.int32)
                .at[gdest]
                .set(jnp.arange(nG, dtype=jnp.int32), mode="drop")[:Kg]
            )
            out = {}
            for key in ("xyz", "colors", "scaling", "opacity", "rotation"):
                v = params[key]
                out[key] = v.reshape(nG, G, -1).at[gidx].get(
                    mode="fill", fill_value=0.0
                ).reshape(Kg * G, -1)
            lane_keep = keep.reshape(nG, G).at[gidx].get(
                mode="fill", fill_value=False
            ).reshape(-1)
            return out, lane_keep, jnp.sum(gany)

        o, lk, ng = group_pipeline(pcams[0], keep0)
        print(f"groups touched: {int(ng)} / {Kg} budget; fill "
              f"{float(jnp.sum(lk)) / (int(ng) * G):.2f}")
        time_phase(
            "group compaction+27col gather",
            lambda cam: group_pipeline(cam, keep0), lambda o: o[0]["xyz"],
        )

        from log_tpu.ops import gaussian_math as gm
        from log_tpu.model.tensor_tree import flat_cut

        @jax.jit
        def flat_cut_full(cam):
            xyz = params["xyz"]
            x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
            px, py, pz, _ = gm.project_ndc_c(x, y, z, cam["full_proj"])
            frus = gm.frustum_flag_c(px, py, pz, padding=0.5)
            alive = jnp.arange(cap) < n
            scaling = jnp.exp(params["scaling"])
            rotation = params["rotation"]
            r_self = gm.compute_radius2d(
                xyz, scaling, rotation, cam["world_view"], cam["full_proj"],
                cam["focal_x"], cam["focal_y"], cam["tan_fovx"],
                cam["tan_fovy"],
            )
            r_par = gm.compute_radius2d(
                tree_dev["parent_xyz"], jnp.exp(tree_dev["parent_scaling"]),
                tree_dev["parent_rotation"], cam["world_view"],
                cam["full_proj"], cam["focal_x"], cam["focal_y"],
                cam["tan_fovx"], cam["tan_fovy"],
            )
            root_visible = (tree_dev["index_parent"] == -1) & frus & alive
            return flat_cut(
                tree_dev["index_parent"], tree_dev["node_index"],
                tree_dev["depth"], tree_dev["root_id"], r_self, r_par,
                root_visible, alive, jnp.float32(3.0), jnp.int32(20),
            )

        time_phase("flat cut FUSED (no check)", flat_cut_full, lambda o: o)

    if "fused2" in PHASES:
        # dissect the CURRENT fused_prepare_render pipeline (compaction-by-
        # sort + Pallas expand), mirroring bench.py's exact configuration
        from log_tpu.model.train_step import _compact_slices_sort
        from log_tpu.ops import pick_max_pairs
        from log_tpu.ops.expand_pallas import piecewise_expand_pallas

        keep0 = kl | kn
        kv2 = next_capacity(int(np.asarray(counts).sum() * 1.2), 1 << 15)
        mp2 = pick_max_pairs(kv2, per_point=6)
        print(f"fused2: k_vis {kv2} max_pairs {mp2}")
        common2 = dict(common)
        common2["max_pairs"] = mp2
        prep_kwargs = dict(common2)
        prep_kwargs["max_pairs"] = 1 << 19

        def fused_full(cam):
            return fused_prepare_render(
                params, tree_dev, cam,
                n_alive=jnp.int32(n), is_leaf_opt=is_leaf_opt,
                min_resolution_pixel=jnp.float32(3.0),
                current_depth=jnp.int32(20),
                background=jnp.zeros(3, jnp.float32),
                image_height=H, image_width=W, k_visible=kv2,
                sh_degree=0, stage_has_tree=True, num_levels=3,
                backend="tiled", max_pairs=mp2, check_scale=4,
                cut_method="flat", n_roots=n_roots_bucket,
                prep_backend="tiled", prep_max_pairs=1 << 19,
            )
        time_phase("FUSED full frame", fused_full, lambda o: o[0])

        def prep2(cam):
            return prepare_visibility(params, tree_dev, cam, **prep_kwargs)

        time_phase("prepare(cut+check)", prep2, lambda o: o[2])

        nochk = dict(prep_kwargs)
        nochk["check_scale"] = 1024  # degenerate check: 8x128 render
        time_phase(
            "prepare(no check)",
            lambda cam: prepare_visibility(params, tree_dev, cam, **nochk),
            lambda o: o[2],
        )

        need = ["xyz", "colors", "scaling", "opacity", "rotation"]
        pneed = {kk: params[kk] for kk in need}

        @jax.jit
        def compact_only(cam, keep):
            s, idx, lv = _compact_slices_sort(pneed, keep, kv2)
            return s["xyz"]

        time_phase(
            "compact-by-sort 14col",
            lambda cam: compact_only(cam, keep0), lambda o: o,
        )

        @jax.jit
        def compact_proj(cam, keep):
            from log_tpu.ops.projection import project_gaussians

            s, idx, lv = _compact_slices_sort(pneed, keep, kv2)
            sp = project_gaussians(
                xyz=s["xyz"], scaling=jnp.exp(s["scaling"]),
                rotation=s["rotation"] / jnp.linalg.norm(
                    s["rotation"], axis=-1, keepdims=True
                ),
                opacity=jax.nn.sigmoid(s["opacity"][:, 0]),
                world_view=cam["world_view"], full_proj=cam["full_proj"],
                focal_x=cam["focal_x"], focal_y=cam["focal_y"],
                tan_fovx=cam["tan_fovx"], tan_fovy=cam["tan_fovy"],
                image_height=H, image_width=W, mode="antialias",
                use_filter=False, active_mask=lv, tight_radius=True,
            )
            return sp.radius

        time_phase(
            "compact+proj",
            lambda cam: compact_proj(cam, keep0), lambda o: o,
        )

        @jax.jit
        def compact_proj_pairs(cam, keep):
            from log_tpu.ops.projection import project_gaussians
            from log_tpu.ops.rasterize_tiled import build_pairs
            from log_tpu.ops.sh import sh_to_rgb

            s, idx, lv = _compact_slices_sort(pneed, keep, kv2)
            sp = project_gaussians(
                xyz=s["xyz"], scaling=jnp.exp(s["scaling"]),
                rotation=s["rotation"] / jnp.linalg.norm(
                    s["rotation"], axis=-1, keepdims=True
                ),
                opacity=jax.nn.sigmoid(s["opacity"][:, 0]),
                world_view=cam["world_view"], full_proj=cam["full_proj"],
                focal_x=cam["focal_x"], focal_y=cam["focal_y"],
                tan_fovx=cam["tan_fovx"], tan_fovy=cam["tan_fovy"],
                image_height=H, image_width=W, mode="antialias",
                use_filter=False, active_mask=lv, tight_radius=True,
            )
            pairs = build_pairs(
                sp, sh_to_rgb(s["colors"]), H, W, mp2,
                runs_tail_only=True, active_prefix=lv,
            )
            return pairs["pair_data"]

        time_phase(
            "compact+proj+build_pairs(pallas)",
            lambda cam: compact_proj_pairs(cam, keep0), lambda o: o,
        )

        # pallas expand alone at this scale
        rngl = np.random.default_rng(7)
        cnt_sim = jnp.asarray(
            np.concatenate([
                rngl.integers(1, 9, kv2 // 2),
                np.zeros(kv2 - kv2 // 2, np.int64),
            ]).astype(np.int32)
        )
        offs_sim = jnp.cumsum(cnt_sim) - cnt_sim
        vals_sim = jnp.asarray(rngl.random((13, kv2), np.float32))

        @jax.jit
        def expand_only(cam):
            return piecewise_expand_pallas(vals_sim, offs_sim, mp2)

        time_phase(
            f"pallas expand 13rows P={kv2} A={mp2}", expand_only,
            lambda o: o,
        )

    if "fused3" in PHASES:
        # dissect the flat_slice pipeline
        from log_tpu.model.train_step import (
            _check_root_weights, _compact_slices_sort,
        )
        from log_tpu.model.tensor_tree import flat_cut_pre
        from log_tpu.ops import gaussian_math as gm
        from log_tpu.ops import pick_max_pairs

        kv2 = next_capacity(int(np.asarray(counts).sum() * 1.2), 1 << 15)
        mp2 = pick_max_pairs(kv2, per_point=6)
        print(f"fused3: k_vis {kv2} max_pairs {mp2}")

        def fused_slice(cam):
            return fused_prepare_render(
                params, tree_dev, cam,
                n_alive=jnp.int32(n), is_leaf_opt=is_leaf_opt,
                min_resolution_pixel=jnp.float32(3.0),
                current_depth=jnp.int32(20),
                background=jnp.zeros(3, jnp.float32),
                image_height=H, image_width=W, k_visible=kv2,
                sh_degree=0, stage_has_tree=True, num_levels=3,
                backend="tiled", max_pairs=mp2, check_scale=4,
                cut_method="flat_slice", n_roots=n_roots_bucket,
                prep_backend="tiled", prep_max_pairs=1 << 19,
            )
        time_phase("FUSED flat_slice full frame", fused_slice,
                   lambda o: o[0])

        @jax.jit
        def precut(params, tree_dev, cam):
            cap2 = params["xyz"].shape[0]
            alive = jnp.arange(cap2) < n
            rx = tree_dev["root_xyz"]
            rpx, rpy, rpz, _ = gm.project_ndc_c(
                rx[..., 0], rx[..., 1], rx[..., 2], cam["full_proj"]
            )
            root_frus = gm.frustum_flag_c(rpx, rpy, rpz, padding=0.5) & alive
            sc = jnp.exp(params["scaling"])
            rot = params["rotation"] / jnp.maximum(
                jnp.linalg.norm(params["rotation"], axis=-1, keepdims=True),
                1e-12,
            )
            r_self = gm.compute_radius2d(
                params["xyz"], sc, rot, cam["world_view"], cam["full_proj"],
                cam["focal_x"], cam["focal_y"], cam["tan_fovx"],
                cam["tan_fovy"],
            )
            r_par = gm.compute_radius2d(
                tree_dev["parent_xyz"], jnp.exp(tree_dev["parent_scaling"]),
                tree_dev["parent_rotation"], cam["world_view"],
                cam["full_proj"], cam["focal_x"], cam["focal_y"],
                cam["tan_fovx"], cam["tan_fovy"],
            )
            return flat_cut_pre(
                tree_dev["index_parent"], tree_dev["node_index"],
                tree_dev["depth"], root_frus, r_self, r_par, alive,
                jnp.float32(3.0), jnp.int32(20),
            )

        time_phase("pre-cut (elementwise)",
                   lambda cam: precut(params, tree_dev, cam), lambda o: o)

        need = ["xyz", "colors", "scaling", "opacity", "rotation"]

        @jax.jit
        def precut_compact(params, tree_dev, cam):
            keep = precut.__wrapped__(params, tree_dev, cam)
            cols = {kk: params[kk] for kk in need}
            cols["root_id"] = tree_dev["root_id"][:, None]
            s, idx, lv = _compact_slices_sort(cols, keep, kv2)
            return s["xyz"]

        time_phase("pre-cut + compact(15col)",
                   lambda cam: precut_compact(params, tree_dev, cam),
                   lambda o: o)

        @jax.jit
        def checkw(params, tree_dev, cam):
            Rb2 = n_roots_bucket
            rx = tree_dev["root_xyz"]
            rpx, rpy, rpz, _ = gm.project_ndc_c(
                rx[..., 0][:Rb2], rx[..., 1][:Rb2], rx[..., 2][:Rb2],
                cam["full_proj"],
            )
            cand = gm.frustum_flag_c(rpx, rpy, rpz, padding=0.5) & (
                tree_dev["index_parent"][:Rb2] == -1
            )
            sc = jnp.exp(params["scaling"][:Rb2])
            rot = params["rotation"][:Rb2]
            rot = rot / jnp.maximum(
                jnp.linalg.norm(rot, axis=-1, keepdims=True), 1e-12
            )
            return _check_root_weights(
                params["xyz"][:Rb2],
                jax.nn.sigmoid(params["opacity"][:Rb2, 0]), sc, rot, cand,
                cam, H, W, "antialias", "tiled", 1 << 19, 4,
            )

        time_phase("check render (weights)",
                   lambda cam: checkw(params, tree_dev, cam), lambda o: o)

        @jax.jit
        def slice_raster(params, tree_dev, cam):
            keep = precut.__wrapped__(params, tree_dev, cam)
            cols = {kk: params[kk] for kk in need}
            s, idx, lv = _compact_slices_sort(cols, keep, kv2)
            from log_tpu.ops.rasterize_tiled import rasterize_tiled
            from log_tpu.ops.sh import sh_to_rgb

            out = rasterize_tiled(
                xyz=s["xyz"], colors=sh_to_rgb(s["colors"]),
                opacity=jax.nn.sigmoid(s["opacity"][:, 0]),
                scaling=jnp.exp(s["scaling"]),
                rotation=s["rotation"] / jnp.linalg.norm(
                    s["rotation"], axis=-1, keepdims=True
                ),
                means2d_offset=jnp.zeros((kv2, 2), jnp.float32),
                world_view=cam["world_view"], full_proj=cam["full_proj"],
                focal_x=cam["focal_x"], focal_y=cam["focal_y"],
                tan_fovx=cam["tan_fovx"], tan_fovy=cam["tan_fovy"],
                background=jnp.zeros(3, jnp.float32),
                image_height=H, image_width=W, active_mask=lv,
                mode="antialias", use_filter=False, max_pairs=mp2,
                with_stats=False, tight_radius=True, runs_tail_only=True,
            )
            return out["render"]

        time_phase(
            "precut+compact+FULL raster (no check, no wcull)",
            lambda cam: slice_raster(params, tree_dev, cam), lambda o: o,
        )

        from log_tpu.ops.projection import project_gaussians
        from log_tpu.ops.rasterize_tiled import build_pairs
        from log_tpu.ops.sh import sh_to_rgb as _s2r

        @jax.jit
        def slice_pairs(params, tree_dev, cam):
            keep = precut.__wrapped__(params, tree_dev, cam)
            cols = {kk: params[kk] for kk in need}
            s, idx, lv = _compact_slices_sort(cols, keep, kv2)
            sp = project_gaussians(
                xyz=s["xyz"], scaling=jnp.exp(s["scaling"]),
                rotation=s["rotation"] / jnp.linalg.norm(
                    s["rotation"], axis=-1, keepdims=True
                ),
                opacity=jax.nn.sigmoid(s["opacity"][:, 0]),
                world_view=cam["world_view"], full_proj=cam["full_proj"],
                focal_x=cam["focal_x"], focal_y=cam["focal_y"],
                tan_fovx=cam["tan_fovx"], tan_fovy=cam["tan_fovy"],
                image_height=H, image_width=W, mode="antialias",
                use_filter=False, active_mask=lv, tight_radius=True,
            )
            pairs = build_pairs(
                sp, _s2r(s["colors"]), H, W, mp2,
                runs_tail_only=True, active_prefix=lv,
            )
            return pairs["pair_data"]

        time_phase(
            "precut+compact+proj+build_pairs",
            lambda cam: slice_pairs(params, tree_dev, cam), lambda o: o,
        )

    if "render" in PHASES:
        # render-only at the cut size (gather + rasterize, fixed keep)
        keep = kl | kn
        from log_tpu.model.train_step import _gather_slices

        @jax.jit
        def render_only(cam, keep):
            index = jnp.nonzero(keep, size=k_vis, fill_value=cap)[0]
            lane_valid = index < cap
            slices = _gather_slices(params, index, lane_valid)
            from log_tpu.ops.rasterize_tiled import rasterize_tiled
            from log_tpu.ops.sh import sh_to_rgb

            out = rasterize_tiled(
                xyz=slices["xyz"],
                colors=sh_to_rgb(slices["colors"]),
                opacity=jax.nn.sigmoid(slices["opacity"][:, 0]),
                scaling=jnp.exp(slices["scaling"]),
                rotation=slices["rotation"] / jnp.linalg.norm(
                    slices["rotation"], axis=-1, keepdims=True
                ),
                means2d_offset=jnp.zeros((k_vis, 2), jnp.float32),
                world_view=cam["world_view"],
                full_proj=cam["full_proj"],
                focal_x=cam["focal_x"], focal_y=cam["focal_y"],
                tan_fovx=cam["tan_fovx"], tan_fovy=cam["tan_fovy"],
                background=jnp.zeros(3, jnp.float32),
                image_height=H, image_width=W,
                active_mask=lane_valid, mode="antialias", use_filter=False,
                max_pairs=1 << 21, with_stats=False,
            )
            return out["render"]

        time_phase(
            "render-only(gather+raster @k_vis)",
            lambda cam: render_only(cam, keep), lambda o: o,
        )


if __name__ == "__main__":
    main()
