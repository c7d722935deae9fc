"""Benchmark: FULL-FRAME 1080p throughput on the real TPU chip.

The headline metric is the complete per-frame path of an urban-scale
LoD-tree model — flat cut + weight-cull prepare + slice gather + tiled
Pallas render, all fused into one executable with zero per-frame host syncs
(`fused_prepare_render`) — on a synthetic 3.2M-point 3-level tree.
Target semantics: /root/reference/apps/train.py:41-83 timed demo loop;
BASELINE.md bar: >= 30 FPS @ 1080p on urban-scale checkpoints.

The scene is generated ON DEVICE (log_tpu.utils.synth_tree) — the axon
tunnel's host->device upload can degrade to ~100 KB/s, so nothing larger
than a camera ever crosses it.

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
    from log_tpu.model.gaussian import next_capacity
    from log_tpu.model.train_step import fused_prepare_render
    from log_tpu.ops import pick_max_pairs
    from log_tpu.render.renderer import camera_device
    from log_tpu.utils.synth_tree import padded_model_device, tree_sizes

    _, _, n = tree_sizes(N_ROOTS)
    cap = next_capacity(n)
    params, tree_dev, is_leaf_opt = padded_model_device(
        jax.random.PRNGKey(0), N_ROOTS, cap
    )
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
        cut_method="flat_slice", n_roots=n_roots_bucket,
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
