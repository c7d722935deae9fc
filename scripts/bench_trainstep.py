"""Training-step throughput at 1080p/100k points on the real chip.

Round-1 measured 226 ms device-side (280-310 ms wall incl. GT upload);
round-2 target: <= ~120 ms device-side (VERDICT item 4). All state and
GT are generated on device; the timed loop's only host traffic is the
final scalar fetch.

Usage: python scripts/bench_trainstep.py [n_points]
"""
from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
H, W = 1088, 1920
STEPS = 20


def main():
    import jax
    import jax.numpy as jnp

    from log_tpu.dataset.base import prepare_camera
    from log_tpu.model.gaussian import next_capacity
    from log_tpu.model.train_step import (
        StepConfig, fused_prepare_train_step,
    )
    from log_tpu.ops import pick_max_pairs
    from log_tpu.render.renderer import camera_device

    cap = next_capacity(N)
    ks = jax.random.split(jax.random.PRNGKey(0), 8)

    @jax.jit
    def gen_state():
        ext = 12.0
        xyz = jnp.stack([
            jax.random.uniform(ks[0], (cap,), minval=-ext, maxval=ext),
            jax.random.uniform(ks[1], (cap,), minval=-ext, maxval=ext),
            jax.random.uniform(ks[2], (cap,), minval=0.0, maxval=2.0),
        ], axis=1)
        scal = jnp.log(
            jax.random.uniform(ks[3], (cap, 3), minval=0.05, maxval=0.3)
        )
        q = jax.random.normal(ks[4], (cap, 4))
        rot = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        opac = jax.random.uniform(ks[5], (cap, 1), minval=0.3, maxval=0.9)
        params = {
            "xyz": xyz,
            "colors": jax.random.uniform(ks[6], (cap, 3)) * 2 - 1,
            "scaling": scal,
            "opacity": jnp.log(opac / (1 - opac)),
            "rotation": rot,
            "shs": jnp.zeros((cap, 3, 3)),
        }
        return params

    params = gen_state()
    moments = {
        "exp_avg": {k: jnp.zeros_like(v) for k, v in params.items()},
        "exp_avg_sq": {k: jnp.zeros_like(v) for k, v in params.items()},
    }
    from log_tpu.model.counter import init_counter

    counter = {k: jnp.asarray(v) for k, v in init_counter(cap).items()}

    def make_cam(theta):
        pos = np.array([16 * math.cos(theta), 16 * math.sin(theta), 12.0])
        fwd = -pos / np.linalg.norm(pos)
        right = np.cross(fwd, np.array([0, 0, 1.0]))
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        R = np.stack([right, up, fwd])
        T = (-R @ pos).reshape(3, 1)
        K = np.array([[1400.0, 0, W / 2], [0, 1400.0, H / 2], [0, 0, 1]])
        return camera_device(prepare_camera(
            {"K": K, "R": R, "T": T, "H": H, "W": W,
             "center": pos.reshape(3, 1)}, 1, 0.01, 1000.0))

    cams = [make_cam(2 * math.pi * i / (STEPS + 2)) for i in range(STEPS + 2)]
    gt = jax.jit(
        lambda: (jax.random.uniform(ks[7], (3, H, W)) * 255).astype(
            jnp.uint8
        )
    )()

    cap_tree = {
        "node_index": jnp.zeros((cap,), jnp.int32),
        "index_parent": jnp.zeros((cap,), jnp.int32),
        "depth": jnp.zeros((cap,), jnp.int32),
    }
    k_bucket = next_capacity(N, 256)
    cfg = StepConfig(
        image_height=H, image_width=W, k_leaf=k_bucket, k_node=0,
        sh_degree=0, mode="antialias", backend="tiled",
        max_pairs=pick_max_pairs(k_bucket),
    )
    lrs = {
        k: jnp.float32(1e-3)
        for k in ("xyz", "colors", "scaling", "opacity", "rotation", "shs")
    }
    corr = {
        "values": jnp.ones((1, 3)), "m1": jnp.zeros((1, 3)),
        "m2": jnp.zeros((1, 3)), "vmax": jnp.zeros((1, 3)),
        "steps": jnp.zeros((1,), jnp.int32),
    }
    ones = jnp.ones((1, 1, 1), jnp.float32)
    oned = jnp.ones((1, 1), jnp.float32)
    key = jax.random.PRNGKey(1)

    def step(params, moments, counter, corr, cam, i):
        return fused_prepare_train_step(
            params, moments, counter, cap_tree, jnp.int32(N),
            jnp.zeros((cap,), bool), jnp.float32(3.0), jnp.int32(0),
            cam, gt, jnp.zeros(3), lrs, jnp.float32(i + 1), corr,
            jnp.int32(0), ones, oned, key,
            stage_has_tree=False, num_levels=1, prep_backend="tiled",
            prep_max_pairs=1 << 19, check_scale=4, cfg=cfg,
        )

    # compile + warm (donated args: thread the state through)
    st = (params, moments, counter, corr)
    for i in range(2):
        p, m, c, co, metrics, aux = step(*st, cams[i], i)
        st = (p, m, c, co)
    float(metrics["loss"])

    trace_dir = os.environ.get("TRACE_DIR")
    if trace_dir:
        # profile 4 steps; summarize with scripts/xplane_summary.py
        with jax.profiler.trace(trace_dir):
            for i in range(4):
                p, m, c, co, metrics, aux = step(*st, cams[2 + i], 2 + i)
                st = (p, m, c, co)
            float(metrics["loss"])
        print(f"trace written to {trace_dir}", flush=True)
    t0 = time.perf_counter()
    for i in range(STEPS):
        p, m, c, co, metrics, aux = step(*st, cams[2 + i], 2 + i)
        st = (p, m, c, co)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / STEPS * 1000
    print(
        f"train step 1080p N={N} k={k_bucket}: {dt:.1f} ms/step "
        f"({1000/dt:.1f} steps/s)", flush=True,
    )


if __name__ == "__main__":
    main()
