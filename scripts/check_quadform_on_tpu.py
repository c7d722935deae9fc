"""Targeted REAL-CHIP validation of the round-3 inference fast paths:

1. packed pair pipeline w/ MXU quadratic splat eval vs the jnp oracle
   rasterizer (catches Mosaic-only miscompiles: layouts, precision,
   matmul lowering — interpret mode cannot see those);
2. block-pruned frame vs the flat_slice fused frame.

Small scene, single process, a few compiles — designed to give a verdict
in minutes (the full on-TPU pytest lane compiles dozens of variants).
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return 10.0 * math.log10(1.0 / max(mse, 1e-12))


def main():
    import jax
    import jax.numpy as jnp

    from log_tpu.dataset.base import prepare_camera
    from log_tpu.model.block_render import (
        block_size_for, build_block_cache, render_blocks,
    )
    from log_tpu.model.gaussian import next_capacity
    from log_tpu.model.train_step import fused_prepare_render
    from log_tpu.render.renderer import camera_device
    from log_tpu.utils.synth_tree import padded_model_device, tree_sizes

    H, W = 256, 512
    n_roots = 20000
    _, _, n = tree_sizes(n_roots)
    cap = next_capacity(n)
    t0 = time.time()
    params, tree_dev, is_leaf_opt = padded_model_device(
        jax.random.PRNGKey(0), n_roots, cap
    )
    print(f"scene: {n} pts cap {cap} ({time.time()-t0:.1f}s)", flush=True)

    pos = np.array([18.0, 8.0, 14.0])
    fwd = -pos / np.linalg.norm(pos)
    right = np.cross(fwd, np.array([0, 0, 1.0]))
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    R = np.stack([right, up, fwd])
    K = np.array([[300.0, 0, W / 2], [0, 300.0, H / 2], [0, 0, 1]])
    cam = camera_device(prepare_camera(
        {"K": K, "R": R, "T": (-R @ pos).reshape(3, 1), "H": H, "W": W,
         "center": pos.reshape(3, 1)}, 1, 0.01, 1000.0,
    ))

    common = dict(
        n_alive=jnp.int32(n), is_leaf_opt=is_leaf_opt,
        min_resolution_pixel=jnp.float32(3.0), current_depth=jnp.int32(20),
        background=jnp.zeros(3, jnp.float32),
        image_height=H, image_width=W, k_visible=next_capacity(n, 256),
        sh_degree=0, stage_has_tree=True, num_levels=3,
        max_pairs=1 << 19, check_scale=4,
        cut_method="flat_slice", n_roots=min(next_capacity(n_roots, 256), cap),
        prep_backend="tiled", prep_max_pairs=1 << 18,
        check_cull=False,
    )
    t0 = time.time()
    img_t, alpha_t, counts_t = fused_prepare_render(
        params, tree_dev, cam, backend="tiled", **common
    )
    ok = float(jnp.sum(img_t))  # sync
    print(f"tiled packed frame: sum={ok:.1f} cut={np.asarray(counts_t)[:2].sum()} "
          f"({time.time()-t0:.1f}s)", flush=True)
    t0 = time.time()
    img_o, alpha_o, _ = fused_prepare_render(
        params, tree_dev, cam, backend="reference", **common
    )
    float(jnp.sum(img_o))
    print(f"oracle frame ({time.time()-t0:.1f}s)", flush=True)
    p1 = psnr(img_t, img_o)
    print(f"PSNR tiled-vs-oracle: {p1:.1f} dB", flush=True)

    S = block_size_for(cap, target=2048)
    cols, meta = build_block_cache(
        params, tree_dev, is_leaf_opt, jnp.int32(n), S
    )
    t0 = time.time()
    img_b, alpha_b, counts_b = render_blocks(
        cols, meta, cam, jnp.float32(3.0), jnp.int32(20),
        jnp.zeros(3, jnp.float32), H, W,
        k_blocks=cap // S, k_visible=common["k_visible"],
        max_pairs=1 << 19,
    )
    float(jnp.sum(img_b))
    print(f"block frame ({time.time()-t0:.1f}s) "
          f"elig={int(np.asarray(counts_b)[3])}/{cap // S}", flush=True)
    p2 = psnr(img_b, img_t)
    print(f"PSNR block-vs-tiled: {p2:.1f} dB", flush=True)

    ok1, ok2 = p1 > 30.0, p2 > 30.0
    print(f"VERDICT: quadform={'PASS' if ok1 else 'FAIL'} "
          f"blocks={'PASS' if ok2 else 'FAIL'}", flush=True)
    sys.exit(0 if (ok1 and ok2) else 1)


if __name__ == "__main__":
    main()
