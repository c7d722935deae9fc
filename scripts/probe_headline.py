"""Round-4 headline dissection: time the two per-frame executables that
compose bench.py's headline (cull-first ordering) separately on the chip.

  frame_ms = root_cull_ms + fused_frame_ms          (headline, cull_every=1)
  blocks_ms = block_frame_ms + root_cull_full_ms/4  (blocks_cull4)

Usage: python scripts/probe_headline.py [n_roots]
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
    from log_tpu.model.gaussian import next_capacity
    from log_tpu.model.train_step import fused_prepare_render, fused_root_cull
    from log_tpu.ops import pick_max_pairs
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
        for i in range(8)
    ]

    def timeit(name, fn, *args):
        out = fn(*args)
        out = out[-1] if isinstance(out, tuple) else out
        float(jnp.sum(out.astype(jnp.float32) * 1.000001))
        t0 = time.perf_counter()
        for i in range(REPS):
            out = fn(*args[:-1], args[-1] if len(args) else None) if False else fn(*args)
        out = out[-1] if isinstance(out, tuple) else out
        float(jnp.sum(out.astype(jnp.float32) * 1.000001))
        dt = (time.perf_counter() - t0) / REPS * 1000
        print(f"{name}: {dt:.2f} ms", flush=True)
        return dt

    def timeit_cams(name, fn):
        # rotate cameras so no per-frame result can be cached
        out = fn(pcams[0])
        out = out[-1] if isinstance(out, tuple) else out
        float(jnp.sum(out.astype(jnp.float32) * 1.000001))
        t0 = time.perf_counter()
        for i in range(REPS):
            out = fn(pcams[i % len(pcams)])
        out = out[-1] if isinstance(out, tuple) else out
        float(jnp.sum(out.astype(jnp.float32) * 1.000001))
        dt = (time.perf_counter() - t0) / REPS * 1000
        print(f"{name}: {dt:.2f} ms", flush=True)
        return dt

    def root_cull(cam, full_cap=False):
        return fused_root_cull(
            params, tree_dev, cam, jnp.int32(n), H, W,
            prep_backend="tiled", prep_max_pairs=1 << 19, check_scale=4,
            n_roots=n_roots_bucket, cap_sort=0 if full_cap else cap_sort,
        )

    for min_res in (3.0, 96.0):
        common = dict(
            n_alive=jnp.int32(n), is_leaf_opt=is_leaf_opt,
            min_resolution_pixel=jnp.float32(min_res),
            current_depth=jnp.int32(20),
            background=jnp.zeros(3, jnp.float32),
            image_height=H, image_width=W,
            sh_degree=0, stage_has_tree=True, num_levels=3,
            backend="tiled", check_scale=4,
            cut_method="flat_slice", n_roots=n_roots_bucket,
            prep_backend="tiled", prep_max_pairs=1 << 19,
            cap_sort=cap_sort,
        )
        w0 = root_cull(pcams[0])
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
        print(f"--- min_res={min_res} cut={cut} k_vis={k_vis} max_pairs={max_pairs}")

        timeit_cams("root_cull(bucket)", lambda cam: root_cull(cam))
        timeit_cams("root_cull(fullcap)", lambda cam: root_cull(cam, full_cap=True))

        def frame(cam):
            img, _, cnt = fused_prepare_render(
                params, tree_dev, cam, k_visible=k_vis,
                max_pairs=max_pairs, w_full=w0, **common,
            )
            return img

        timeit_cams("fused_frame(w_fixed)", frame)

        try:
            from log_tpu.model.block_render import (
                block_size_for, build_block_cache, render_blocks,
            )
            S_blk = block_size_for(cap)
            blk_cols, blk_meta = build_block_cache(
                params, tree_dev, is_leaf_opt, jnp.int32(n), S_blk
            )
            B_blk = cap // S_blk
            wf = root_cull(pcams[0], full_cap=True)
            _, _, cb = render_blocks(
                blk_cols, blk_meta, pcams[0], jnp.float32(min_res),
                jnp.int32(20), jnp.zeros(3, jnp.float32), H, W,
                k_blocks=B_blk, k_visible=min(1 << 21, cap),
                max_pairs=1 << 21, w_full=wf,
            )
            cb = np.asarray(cb)
            cutb = int(cb[:2].sum())
            k_visb = min(next_capacity(int(cutb * 1.2), 1 << 15), cap)
            max_pairsb = pick_max_pairs(int(max(cb[2], 1) * 1.25), per_point=1)
            n_elig = int(cb[3])
            kb = min(B_blk, max(16, -(-int(n_elig * 1.2) // 16) * 16))
            print(f"    blocks: cut={cutb} k_vis={k_visb} max_pairs={max_pairsb} kb={kb}")

            def bframe(cam):
                img, _, _ = render_blocks(
                    blk_cols, blk_meta, cam, jnp.float32(min_res),
                    jnp.int32(20), jnp.zeros(3, jnp.float32), H, W,
                    k_blocks=kb, k_visible=k_visb, max_pairs=max_pairsb,
                    w_full=wf,
                )
                return img

            timeit_cams("block_frame(w_fixed)", bframe)
        except Exception as e:
            print(f"    block path failed: {e!r}")


if __name__ == "__main__":
    main()
