"""Benchmark: 1080p render throughput on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): >= 30 FPS @ 1080p on urban-scale checkpoints
(RTX-4090-class). vs_baseline = fps / 30.
"""
from __future__ import annotations

import json
import math
import sys
import time

import numpy as np

# scene size for the current backend; the Pallas tiled rasterizer will lift
# this to urban-scale point counts.
N_GAUSS = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
H, W = 1080, 1920
FRAMES = 8


def main():
    import jax
    import jax.numpy as jnp

    from log_tpu.dataset.base import prepare_camera
    from log_tpu.dataset.synthetic import random_gaussians, ring_cameras
    from log_tpu.ops.rasterize_ref import rasterize

    rng = np.random.default_rng(0)
    scene = random_gaussians(N_GAUSS, rng, extent=2.0)
    cams = ring_cameras(FRAMES + 2, H, W, radius=5.0)

    def render(cam):
        pc = prepare_camera(cam, 1, 0.01, 100.0)
        tan_fovx = math.tan(pc["FoVx"] * 0.5)
        tan_fovy = math.tan(pc["FoVy"] * 0.5)
        out = rasterize(
            xyz=jnp.asarray(scene["xyz"]),
            colors=jnp.asarray(scene["colors"]),
            opacity=jnp.asarray(scene["opacity"]),
            scaling=jnp.asarray(scene["scaling"]),
            rotation=jnp.asarray(scene["rotation"]),
            means2d_offset=jnp.zeros((N_GAUSS, 2), jnp.float32),
            world_view=jnp.asarray(pc["world_view_transform"]),
            full_proj=jnp.asarray(pc["full_proj_transform"]),
            focal_x=pc["image_width"] / (2 * tan_fovx),
            focal_y=pc["image_height"] / (2 * tan_fovy),
            tan_fovx=tan_fovx,
            tan_fovy=tan_fovy,
            background=jnp.zeros(3, jnp.float32),
            image_height=H,
            image_width=W,
            use_filter=False,
            chunk=64,
        )
        return out["render"]

    # warm-up: compile
    render(cams[0]).block_until_ready()
    render(cams[1]).block_until_ready()

    t0 = time.perf_counter()
    for i in range(FRAMES):
        img = render(cams[2 + i])
    img.block_until_ready()
    dt = (time.perf_counter() - t0) / FRAMES
    fps = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": f"render_fps_1080p_{N_GAUSS}g",
                "value": round(fps, 3),
                "unit": "fps",
                "vs_baseline": round(fps / 30.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
