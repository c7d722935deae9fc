"""Benchmark: 1080p render throughput on the real TPU chip (tiled Pallas path).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): >= 30 FPS @ 1080p on urban-scale checkpoints
(RTX-4090-class). vs_baseline = fps / 30.

All syncs are scalar fetches — bulk device->host transfers crawl through the
axon tunnel (~14 KB/s) and must never appear on the timed path.
"""
from __future__ import annotations

import json
import math
import sys
import time

import numpy as np

N_GAUSS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
H, W = 1088, 1920
FRAMES = 30  # one sync fetch at the end; tunnel RTT ~32 ms amortizes to ~1 ms/frame
MAX_PAIRS = 1 << 20


def main():
    import jax
    import jax.numpy as jnp

    from log_tpu.dataset.base import prepare_camera
    from log_tpu.dataset.synthetic import random_gaussians, ring_cameras
    from log_tpu.ops.rasterize_tiled import rasterize_tiled

    rng = np.random.default_rng(0)
    scene = random_gaussians(
        N_GAUSS, rng, extent=2.0, scale_range=(0.005, 0.03)
    )
    dev = {k: jax.device_put(jnp.asarray(v)) for k, v in scene.items()}
    zeros2 = jax.device_put(jnp.zeros((N_GAUSS, 2), jnp.float32))
    bg = jax.device_put(jnp.zeros(3, jnp.float32))
    cams = ring_cameras(FRAMES + 2, H, W, radius=5.0)

    @jax.jit
    def checksum(x):
        return jnp.sum(x)

    # one executable per frame: intrinsics are shared across the ring, only
    # the extrinsic matrices are traced arguments
    pc0 = prepare_camera(cams[0], 1, 0.01, 100.0)
    tfx = math.tan(pc0["FoVx"] * 0.5)
    tfy = math.tan(pc0["FoVy"] * 0.5)

    @jax.jit
    def render_j(world_view, full_proj):
        out = rasterize_tiled(
            xyz=dev["xyz"],
            colors=dev["colors"],
            opacity=dev["opacity"],
            scaling=dev["scaling"],
            rotation=dev["rotation"],
            means2d_offset=zeros2,
            world_view=world_view,
            full_proj=full_proj,
            focal_x=W / (2 * tfx),
            focal_y=H / (2 * tfy),
            tan_fovx=tfx,
            tan_fovy=tfy,
            background=bg,
            image_height=H,
            image_width=W,
            max_pairs=MAX_PAIRS,
            with_stats=False,
            interpret=False,
        )
        return out["render"]

    def render(cam):
        pc = prepare_camera(cam, 1, 0.01, 100.0)
        return render_j(
            jnp.asarray(pc["world_view_transform"]),
            jnp.asarray(pc["full_proj_transform"]),
        )

    # warm-up / compile
    float(checksum(render(cams[0])))
    float(checksum(render(cams[1])))

    t0 = time.perf_counter()
    for i in range(FRAMES):
        img = render(cams[2 + i])
    float(checksum(img))
    dt = (time.perf_counter() - t0) / FRAMES
    fps = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": f"tiled_render_fps_1080p_{N_GAUSS}g",
                "value": round(fps, 3),
                "unit": "fps",
                "vs_baseline": round(fps / 30.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
