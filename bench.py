"""Benchmark: FULL-FRAME 1080p throughput on the real TPU chip.

The headline metric is the complete per-frame path of an urban-scale
LoD-tree model — flat cut + weight-cull prepare + slice gather + tiled
Pallas render, all fused into one executable with zero per-frame host syncs
(`fused_prepare_render`) — on a synthetic 3.2M-point 3-level tree.
Target semantics: /root/reference/apps/train.py:41-83 timed demo loop;
BASELINE.md bar: >= 30 FPS @ 1080p on urban-scale checkpoints.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
All syncs are scalar fetches (the axon tunnel's bulk D2H path must never
appear on the timed loop).
"""
from __future__ import annotations

import json
import math
import sys
import time

import numpy as np

N_ROOTS = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
H, W = 1088, 1920
FRAMES = 30
MIN_RES_PIXEL = 3.0


def build_scene(n_roots, rng):
    """Urban-style tree: roots over a large extent, 50% split into 4
    children, 30% of those split again (3.2M points at 600k roots)."""
    ext = 30.0
    xyz_r = np.stack([
        rng.uniform(-ext, ext, n_roots),
        rng.uniform(-ext, ext, n_roots),
        rng.uniform(0.0, 2.0, n_roots),
    ], axis=1).astype(np.float32)
    scal_r = rng.uniform(0.08, 0.25, (n_roots, 1)).astype(np.float32)
    scal_r = np.repeat(scal_r, 3, axis=1) * rng.uniform(
        0.6, 1.4, (n_roots, 3)
    ).astype(np.float32)

    def make_children(xyz_p, scal_p, parent_rows, n_child=4):
        P = parent_rows.shape[0]
        off = rng.normal(0.0, 1.0, (P, n_child, 3)).astype(np.float32)
        c_xyz = (
            xyz_p[parent_rows][:, None]
            + off * scal_p[parent_rows][:, None] * 0.5
        )
        c_scal = np.repeat(
            scal_p[parent_rows][:, None] * 0.55, n_child, axis=1
        )
        return c_xyz.reshape(-1, 3), c_scal.reshape(-1, 3)

    split1 = np.flatnonzero(rng.random(n_roots) < 0.5).astype(np.int32)
    c1_xyz, c1_scal = make_children(xyz_r, scal_r, split1)
    n1 = c1_xyz.shape[0]
    split2_local = np.flatnonzero(rng.random(n1) < 0.3).astype(np.int32)
    c2_xyz, c2_scal = make_children(c1_xyz, c1_scal, split2_local)
    n2 = c2_xyz.shape[0]
    n = n_roots + n1 + n2

    xyz = np.concatenate([xyz_r, c1_xyz, c2_xyz])
    scal = np.concatenate([scal_r, c1_scal, c2_scal])
    colors = rng.random((n, 3)).astype(np.float32)
    q = rng.normal(0, 1, (n, 4)).astype(np.float32)
    rot = q / np.linalg.norm(q, axis=1, keepdims=True)
    opac = rng.uniform(0.3, 0.95, (n, 1)).astype(np.float32)

    depth = np.zeros(n, np.int32)
    depth[n_roots:n_roots + n1] = 1
    depth[n_roots + n1:] = 2
    index_parent = np.full(n, -1, np.int32)
    index_parent[n_roots:n_roots + n1] = np.repeat(split1, 4)
    index_parent[n_roots + n1:] = np.repeat(split2_local + n_roots, 4)
    node_index = np.full(n, -1, np.int32)
    node_index[split1] = np.arange(split1.shape[0], dtype=np.int32)
    node_index[split2_local + n_roots] = split1.shape[0] + np.arange(
        split2_local.shape[0], dtype=np.int32
    )
    root_id = np.arange(n, dtype=np.int32)
    root_id[n_roots:n_roots + n1] = index_parent[n_roots:n_roots + n1]
    root_id[n_roots + n1:] = root_id[index_parent[n_roots + n1:]]

    params = {
        "xyz": xyz,
        "colors": ((colors - 0.5) / 0.28209479177387814).astype(np.float32),
        "scaling": np.log(scal).astype(np.float32),
        "opacity": np.log(opac / (1 - opac)).astype(np.float32),
        "rotation": rot,
        "shs": np.zeros((n, 3, 3), np.float32),
    }
    tree = {
        "node_index": node_index, "index_parent": index_parent,
        "depth": depth, "root_id": root_id,
    }
    return params, tree, n


def make_cam(theta, height=18.0, radius=22.0):
    pos = np.array(
        [radius * math.cos(theta), radius * math.sin(theta), height]
    )
    fwd = -pos / np.linalg.norm(pos)
    right = np.cross(fwd, np.array([0, 0, 1.0]))
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    R = np.stack([right, up, fwd])
    T = (-R @ pos).reshape(3, 1)
    K = np.array([[1400.0, 0, W / 2], [0, 1400.0, H / 2], [0, 0, 1]])
    return {"K": K, "R": R, "T": T, "H": H, "W": W,
            "center": pos.reshape(3, 1)}


def main():
    import jax
    import jax.numpy as jnp

    from log_tpu.dataset.base import prepare_camera
    from log_tpu.model.gaussian import next_capacity, pad_rows
    from log_tpu.model.train_step import fused_prepare_render
    from log_tpu.ops import pick_max_pairs
    from log_tpu.render.renderer import camera_device

    rng = np.random.default_rng(0)
    params_np, tree_np, n = build_scene(N_ROOTS, rng)
    cap = next_capacity(n)
    params = {
        k: jax.device_put(jnp.asarray(pad_rows(v, cap)))
        for k, v in params_np.items()
    }
    parent = np.arange(cap, dtype=np.int32)
    nzm = tree_np["index_parent"] >= 0
    parent[:n][nzm] = tree_np["index_parent"][nzm]
    tree_dev = {
        "node_index": jnp.asarray(pad_rows(tree_np["node_index"], cap, -1)),
        "index_parent": jnp.asarray(
            pad_rows(tree_np["index_parent"], cap, -1)
        ),
        "depth": jnp.asarray(pad_rows(tree_np["depth"], cap)),
        "root_id": jnp.asarray(pad_rows(tree_np["root_id"], cap)),
    }
    pdev = jnp.asarray(parent)
    tree_dev["parent_xyz"] = jnp.take(params["xyz"], pdev, axis=0)
    tree_dev["parent_scaling"] = jnp.take(params["scaling"], pdev, axis=0)
    tree_dev["parent_rotation"] = jnp.take(params["rotation"], pdev, axis=0)
    leaf_opt = (tree_np["node_index"] == -1) & (tree_np["depth"] > 0)
    is_leaf_opt = jnp.asarray(pad_rows(leaf_opt, cap, False))
    n_roots_bucket = min(next_capacity(N_ROOTS), cap)

    pcams = [
        camera_device(
            prepare_camera(
                make_cam(2 * math.pi * i / (FRAMES + 2)), 1, 0.01, 1000.0
            )
        )
        for i in range(FRAMES + 2)
    ]

    @jax.jit
    def checksum(x):
        return jnp.sum(x)

    common = dict(
        n_alive=jnp.int32(n),
        is_leaf_opt=is_leaf_opt,
        min_resolution_pixel=jnp.float32(MIN_RES_PIXEL),
        current_depth=jnp.int32(20),
        background=jnp.zeros(3, jnp.float32),
        image_height=H, image_width=W,
        sh_degree=0, stage_has_tree=True, num_levels=3,
        backend="tiled", check_scale=4,
        cut_method="flat", n_roots=n_roots_bucket,
        prep_backend="tiled",
        prep_max_pairs=1 << 19,
    )

    # size the cut bucket once from the first camera
    _, _, counts = fused_prepare_render(
        params, tree_dev, pcams[0], k_visible=1 << 20,
        max_pairs=1 << 21, **common,
    )
    c = np.asarray(counts)
    k_vis = next_capacity(int(c.sum() * 1.2), 1 << 15)
    max_pairs = pick_max_pairs(k_vis, per_point=6)

    def frame(cam):
        img, _, _ = fused_prepare_render(
            params, tree_dev, cam, k_visible=k_vis, max_pairs=max_pairs,
            **common,
        )
        return img

    float(checksum(frame(pcams[0])))
    float(checksum(frame(pcams[1])))

    t0 = time.perf_counter()
    for i in range(FRAMES):
        img = frame(pcams[2 + i])
    float(checksum(img))
    dt = (time.perf_counter() - t0) / FRAMES
    fps = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": f"full_frame_fps_1080p_{n}pts_tree_cut",
                "value": round(fps, 3),
                "unit": "fps",
                "vs_baseline": round(fps / 30.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
