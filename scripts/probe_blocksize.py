"""Sweep the block size S for the block-pruned frame.

kb blocks of S rows are taken per frame; at S=4096 the bench's min_res-3
frame takes ~1.6M working-set rows for a 315k cut (5x overdraw). Smaller
blocks tighten the working set (fewer dead rows pay projection/compaction
lanes) at the cost of a longer eligibility row and more take descriptors.

Usage: python scripts/probe_blocksize.py [n_roots]
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
    from log_tpu.model.block_render import build_block_cache, render_blocks
    from log_tpu.model.gaussian import next_capacity
    from log_tpu.model.train_step import fused_root_cull
    from log_tpu.ops import pick_max_pairs
    from log_tpu.render.renderer import camera_device
    from log_tpu.utils.synth_tree import padded_model_device, tree_sizes

    _, _, n = tree_sizes(N_ROOTS)
    cap = next_capacity(n)
    params, tree_dev, is_leaf_opt = padded_model_device(
        jax.random.PRNGKey(0), N_ROOTS, cap, "root_major"
    )
    n_roots_bucket = min(next_capacity(N_ROOTS), cap)
    pcams = [
        camera_device(prepare_camera(make_cam(2 * math.pi * i / 16), 1,
                                     0.01, 1000.0))
        for i in range(8)
    ]

    @jax.jit
    def checksum(x):
        return jnp.sum(x)

    w0 = fused_root_cull(
        params, tree_dev, pcams[0], jnp.int32(n), H, W,
        prep_backend="tiled", prep_max_pairs=1 << 19, check_scale=4,
        n_roots=n_roots_bucket, cap_sort=0,
    )

    for S in (512, 1024, 2048, 4096):
        if cap % S:
            continue
        cols, meta = build_block_cache(
            params, tree_dev, is_leaf_opt, jnp.int32(n), S
        )
        B = cap // S
        for min_res in (3.0, 96.0):
            _, _, c = render_blocks(
                cols, meta, pcams[0], jnp.float32(min_res), jnp.int32(20),
                jnp.zeros(3, jnp.float32), H, W, k_blocks=B,
                k_visible=min(1 << 21, cap), max_pairs=1 << 21, w_full=w0,
            )
            ca = np.asarray(c)
            cut = int(ca[:2].sum())
            n_elig = int(ca[3])
            for ci in (3, 6):
                _, _, c2 = render_blocks(
                    cols, meta, pcams[ci], jnp.float32(min_res),
                    jnp.int32(20), jnp.zeros(3, jnp.float32), H, W,
                    k_blocks=B, k_visible=min(1 << 21, cap),
                    max_pairs=1 << 21, w_full=w0,
                )
                n_elig = max(n_elig, int(np.asarray(c2)[3]))
            kb = min(B, max(16, -(-int(n_elig * 1.3) // 16) * 16))
            k_vis = min(next_capacity(int(cut * 1.2), 1 << 15), cap)
            mp = pick_max_pairs(int(max(ca[2], 1) * 1.3), per_point=1)

            def frame(cam):
                img, _, _ = render_blocks(
                    cols, meta, cam, jnp.float32(min_res), jnp.int32(20),
                    jnp.zeros(3, jnp.float32), H, W, k_blocks=kb,
                    k_visible=k_vis, max_pairs=mp, w_full=w0,
                )
                return img

            float(checksum(frame(pcams[0])))
            float(checksum(frame(pcams[1])))
            t0 = time.perf_counter()
            for i in range(REPS):
                img = frame(pcams[i % 8])
            float(checksum(img))
            dt = (time.perf_counter() - t0) / REPS * 1000
            print(
                f"S={S} B={B} min_res={min_res:g} cut={cut} kb={kb} "
                f"rows={kb * S} elig={n_elig} k_vis={k_vis} mp={mp} "
                f"-> {dt:.2f} ms ({1000 / dt:.1f} fps w/o cull)",
                flush=True,
            )


if __name__ == "__main__":
    main()
