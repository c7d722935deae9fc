"""Pair-demand probe: unclamped rect pair counts for the bench scene, per
camera, under circle-rect vs ellipse-bbox binning at several TILE_H values.

Sizes the honest pair budget (VERDICT r4 item 1: pairs_measured must be
<= max_pairs for the HEADLINE bench frame set) before paying for full bench
runs. Pure jnp — no kernels, one jit per (tile_h, mode).

Usage: python scripts/probe_demand.py [n_roots]
"""
from __future__ import annotations

import math
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_ROOTS = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
H, W = 1088, 1920
FRAMES = 30


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
    from log_tpu.model.tensor_tree import flat_cut_pre
    from log_tpu.ops import gaussian_math as gm
    from log_tpu.ops.projection import project_gaussians
    from log_tpu.ops.rasterize_tiled import splat_extents
    from log_tpu.render.renderer import camera_device
    from log_tpu.utils.synth_tree import padded_model_device, tree_sizes

    _, _, n = tree_sizes(N_ROOTS)
    cap = next_capacity(n)
    params, tree_dev, is_leaf_opt = padded_model_device(
        jax.random.PRNGKey(0), N_ROOTS, cap
    )

    pcams = [
        camera_device(
            prepare_camera(make_cam(2 * math.pi * i / (FRAMES + 2)), 1, 0.01, 1000.0)
        )
        for i in range(FRAMES + 2)
    ]

    @partial(jax.jit, static_argnames=("tile_h", "use_bbox", "min_res"))
    def demand(params, tree_dev, cam, tile_h, use_bbox, min_res):
        alive = jnp.arange(cap) < jnp.int32(n)
        rx = tree_dev["root_xyz"]
        rpx, rpy, rpz, _ = gm.project_ndc_c(
            rx[..., 0], rx[..., 1], rx[..., 2], cam["full_proj"]
        )
        root_frus = gm.frustum_flag_c(rpx, rpy, rpz, padding=0.5) & alive
        scaling_full = jnp.exp(params["scaling"])
        rotation_full = params["rotation"] / jnp.maximum(
            jnp.linalg.norm(params["rotation"], axis=-1, keepdims=True), 1e-12
        )
        r2d = gm.compute_radius2d(
            params["xyz"], scaling_full, rotation_full, cam["world_view"],
            cam["full_proj"], cam["focal_x"], cam["focal_y"],
            cam["tan_fovx"], cam["tan_fovy"],
        )
        r2dp = gm.compute_radius2d(
            tree_dev["parent_xyz"], jnp.exp(tree_dev["parent_scaling"]),
            tree_dev["parent_rotation"] / jnp.maximum(
                jnp.linalg.norm(tree_dev["parent_rotation"], axis=-1, keepdims=True),
                1e-12,
            ),
            cam["world_view"], cam["full_proj"], cam["focal_x"],
            cam["focal_y"], cam["tan_fovx"], cam["tan_fovy"],
        )
        keep = flat_cut_pre(
            tree_dev["index_parent"], tree_dev["node_index"], tree_dev["depth"],
            root_frus, r2d, r2dp, alive, jnp.float32(min_res), jnp.int32(20),
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
            ext_x, ext_y = splat_extents(
                sp.conic[:, 0], sp.conic[:, 1], sp.conic[:, 2], sp.opacity,
                radius,
            )
        else:
            ext_x = ext_y = radius
        x0 = jnp.clip(((px[:, 0] - ext_x) / 128).astype(jnp.int32), 0, tiles_x)
        y0 = jnp.clip(((px[:, 1] - ext_y) / tile_h).astype(jnp.int32), 0, tiles_y)
        x1 = jnp.clip(((px[:, 0] + ext_x + 127) / 128).astype(jnp.int32), 0, tiles_x)
        y1 = jnp.clip(
            ((px[:, 1] + ext_y + tile_h - 1) / tile_h).astype(jnp.int32), 0, tiles_y
        )
        pairs = jnp.where(
            valid, jnp.maximum(x1 - x0, 0) * jnp.maximum(y1 - y0, 0), 0
        )
        return jnp.sum(keep), jnp.sum(pairs), jnp.sum(valid)

    for min_res in (3.0, 96.0):
        for tile_h in (8, 16, 32):
            for use_bbox in (False, True):
                per_cam = []
                cut0 = 0
                for cam in pcams:
                    c, p, v = demand(
                        params, tree_dev, cam, tile_h, use_bbox, min_res
                    )
                    per_cam.append(int(p))
                    cut0 = max(cut0, int(c))
                arr = np.array(per_cam)
                print(
                    f"min_res={min_res:g} tile_h={tile_h} bbox={int(use_bbox)} "
                    f"cut_max={cut0} demand max={arr.max()} "
                    f"mean={arr.mean():.0f} min={arr.min()}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
