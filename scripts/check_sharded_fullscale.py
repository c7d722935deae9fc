"""Full-bench-scale sharded render on the 8-device VIRTUAL CPU mesh.

VERDICT r4 next-round item 5: the multi-chip FPS projection
(ARCHITECTURE.md) assumes the fixed-bucket band exchange neither
overflows nor balloons at REAL pair counts — but the dryrun only ran
toy shapes. This check executes `sharded_render_frame` on the same
3.24M-point tree and 1080p cameras as bench.py's headline (min_res 3,
~1.5M-pair frames) across an orbit and records:

  * max bucket overflow (must be 0 for the projection to hold);
  * the measured (n_src, n_dst) exchange-length matrix per camera —
    the actual ICI volume, vs the projection's pairs x bytes/pair
    assumption (current wire format: 10 f32 value rows + tile i32 +
    gid i32 = 48 B/pair unpacked);
  * total pairs exchanged vs the single-chip frame's pair demand.

Pallas kernels run in interpret mode on CPU (hours-slow at this scale),
so by default the forward band kernel is SKIPPED (stats do not depend
on it; image equality vs single-chip is covered by
tests/test_sharded_render.py at small scale). Pass --with-kernel to run
one full frame end-to-end anyway.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/check_sharded_fullscale.py [n_roots] [frames]
(the script sets these itself if unset)
Prints one JSON line; paste the summary into ARCHITECTURE.md.
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# must happen before jax import
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["LOG_TPU_PLATFORM"] = os.environ.get("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np

N_ROOTS = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
FRAMES = int(sys.argv[2]) if len(sys.argv) > 2 else 8
WITH_KERNEL = "--with-kernel" in sys.argv
H, W = 1088, 1920
MIN_RES = 3.0
N_DEV = 8


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

    # the ambient axon plugin force-registers the TPU in every interpreter;
    # env vars alone cannot override it (tests/conftest.py does the same)
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    assert len(jax.devices()) >= N_DEV, jax.devices()

    from log_tpu.dataset.base import prepare_camera
    from log_tpu.model.gaussian import next_capacity
    from log_tpu.parallel.sharded_render import (
        ShardedRenderConfig, sharded_render_frame,
    )
    from log_tpu.render.renderer import camera_device
    from log_tpu.utils.synth_tree import padded_model_device, tree_sizes

    _, _, n = tree_sizes(N_ROOTS)
    cap = next_capacity(n)
    t0 = time.perf_counter()
    params, tree_dev, is_leaf_opt = padded_model_device(
        jax.random.PRNGKey(0), N_ROOTS, cap, "root_major"
    )
    # production executor layout: round-robin rows so every shard holds a
    # spatially uniform sample (root_major/contiguous saturated one shard's
    # whole pair budget and overflowed dst buckets 4x — round-5 finding)
    from log_tpu.parallel.sharded_render import interleave_shard_rows

    params = interleave_shard_rows(params, N_DEV)
    tree_dev = interleave_shard_rows(tree_dev, N_DEV)
    jax.block_until_ready(params["xyz"])
    print(f"# scene built in {time.perf_counter() - t0:.0f}s",
          file=sys.stderr, flush=True)

    pcams = [
        camera_device(
            prepare_camera(make_cam(2 * math.pi * i / FRAMES), 1, 0.01,
                           1000.0)
        )
        for i in range(FRAMES)
    ]

    # bench-scale budgets: per-shard slices of the single-chip bench
    # sizing (BENCH_r04 headline: cut 315k -> k_vis 393k, pairs 1.55M ->
    # budget 2.1M), with 2x headroom for shard imbalance
    k_local = next_capacity(393_216 * 2 // N_DEV, 1 << 12)
    max_pairs_local = 1 << 19              # 512k pairs/shard (8x4.2M total)
    # measured lens_max on this orbit is ~66k with the strided layout +
    # interleaved bands (was 253k with contiguous bands); 72k rides the
    # same demand-sized ladder as every other pair budget
    bucket_pairs = 73728                   # per (src, dst) lane
    cfg = ShardedRenderConfig(
        image_height=H, image_width=W, n_devices=N_DEV,
        k_local=k_local, max_pairs_local=max_pairs_local,
        bucket_pairs=bucket_pairs, sh_degree=0, min_res_pixel=MIN_RES,
        layout="strided",
    )
    out: dict = {
        "metric": "sharded_fullscale_virtual8", "unit": "report",
        "n_points": int(n), "k_local": k_local,
        "max_pairs_local": max_pairs_local, "bucket_pairs": bucket_pairs,
        "wire_bytes_per_pair": 48,
        "with_kernel": WITH_KERNEL,
    }

    if not WITH_KERNEL:
        # stats-only: monkeypatch the band kernel to a cheap constant —
        # stats (cut / exchange / overflow) are computed before it runs
        import log_tpu.parallel.sharded_render as sr

        def _fake_forward(pair_data, tile_start, tile_count, background,
                          tiles_x, tiles_y, with_stats, interpret):
            shape = (3, tiles_y * sr.TILE_H, tiles_x * sr.TILE_W)
            z = jnp.zeros(shape, jnp.float32)
            t = jnp.ones(shape[1:], jnp.float32)
            return z, t, None, None, None, None

        sr._run_forward = _fake_forward

    frames = []
    t_all = time.perf_counter()
    for i, cam in enumerate(pcams):
        t0 = time.perf_counter()
        img, alpha, stats = sharded_render_frame(
            params, tree_dev, cam, n, MIN_RES, 20, jnp.zeros(3), cfg,
        )
        stats = np.asarray(stats)
        lens = stats[3:].reshape(N_DEV, N_DEV)
        fr = {
            "cam": i,
            "cut": int(stats[0]),
            "pairs_exchanged": int(stats[1]),
            "bucket_overflow": int(stats[2]),
            "lens_max": int(lens.max()),
            "lens_row_sums": lens.sum(axis=1).astype(int).tolist(),
            "lens_col_sums": lens.sum(axis=0).astype(int).tolist(),
            "wall_s": round(time.perf_counter() - t0, 1),
        }
        frames.append(fr)
        print(f"# cam {i}: cut={fr['cut']} pairs={fr['pairs_exchanged']} "
              f"overflow={fr['bucket_overflow']} lens_max={fr['lens_max']} "
              f"({fr['wall_s']}s)", file=sys.stderr, flush=True)

    out["frames"] = frames
    out["max_overflow"] = max(f["bucket_overflow"] for f in frames)
    out["max_pairs_exchanged"] = max(f["pairs_exchanged"] for f in frames)
    out["max_bucket_fill"] = round(
        max(f["lens_max"] for f in frames) / bucket_pairs, 3
    )
    out["wire_mb_per_frame_unpacked"] = round(
        out["max_pairs_exchanged"] * 48 / 1e6, 1
    )
    out["wire_mb_per_frame_if_packed28"] = round(
        out["max_pairs_exchanged"] * 28 / 1e6, 1
    )
    # fixed-bucket wire volume actually shipped (all_to_all ships capacity)
    out["wire_mb_per_frame_bucket_capacity"] = round(
        N_DEV * N_DEV * bucket_pairs * 48 / 1e6, 1
    )
    out["total_wall_s"] = round(time.perf_counter() - t_all, 1)
    print(json.dumps(out), flush=True)
    assert out["max_overflow"] == 0, "bucket overflow at bench scale"


if __name__ == "__main__":
    main()
