"""Spill-mode (host-moment) training throughput vs the fused device path.

The reference offloads Adam moments to CPU RAM past 50M/100M points
(LoG/model/splitter.py:198-204) and eats host<->GPU traffic every step.
Our equivalent (SparseOptimizer.to_host / maybe_spill) keeps the moments
in host numpy and runs host-gather -> device Adam on slices -> host-
scatter through the model's two-phase prepare+step path
(level_of_gaussian.py training_iteration). Numerical equality with the
device path is tested in tests/test_spill.py; THIS probe measures the
throughput cost of the degraded mode — the contract a user accepts when
training past the HBM ceiling (VERDICT r5 item 8).

Measures ms/step at 1080p, N points (no tree — init-stage geometry like
scripts/bench_trainstep.py), for: (a) fused device path, (b) spill of
exp_avg_sq (the 50M-point tier), (c) spill of both moments (the
100M-point tier).

Usage: python scripts/bench_spill.py [n_points]     (default 100_000)
Prints one JSON line.
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
H, W = 1088, 1920
STEPS = 12


def make_cam(theta):
    pos = np.array([16 * math.cos(theta), 16 * math.sin(theta), 12.0])
    fwd = -pos / np.linalg.norm(pos)
    right = np.cross(fwd, np.array([0, 0, 1.0]))
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    R = np.stack([right, up, fwd])
    T = (-R @ pos).reshape(3, 1)
    K = np.array([[1400.0, 0, W / 2], [0, 1400.0, H / 2], [0, 0, 1]])
    from log_tpu.dataset.base import prepare_camera

    return prepare_camera(
        {"K": K, "R": R, "T": T, "H": H, "W": W, "center": pos.reshape(3, 1)},
        1, 0.01, 1000.0,
    )


def build_model(n):
    from log_tpu.model.level_of_gaussian import LoG

    rng = np.random.default_rng(0)
    xyz = np.stack([
        rng.uniform(-12, 12, n), rng.uniform(-12, 12, n),
        rng.uniform(0, 2, n),
    ], axis=1).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    scales = rng.uniform(0.05, 0.3, n).astype(np.float32)
    model = LoG(
        gaussian=dict(sh_degree=1, xyz_scale=1.0),
        tree=dict(max_child=4, max_level=30),
        optimizer=dict(
            optimize_keys=["xyz", "colors", "scaling", "opacity",
                           "rotation", "shs"],
            opt_all_levels=True,
            lr_dict=dict(
                xyz=0.00016, xyz_final=0.0000016, colors=0.0025,
                shs=0.000125, scaling=0.005, opacity=0.05, rotation=0.001,
                max_steps=600,
            ),
        ),
        densify_and_remove=dict(
            upgrade_sh_iter=10**9, densify_from_iter=10**9,
            densify_every_iter=10**9, upgrade_repeat=1,
            init_split_method="split_by_2d", init_radius_min=4,
            init_radius_split=16, init_weight_min=0.1, min_steps=50,
            method="naive", split_grad_thres=0.0002, radius2d_thres=6,
            remove_weights_thres=0.005, max_split_points=20000,
            sort_method="radii", min_steps_split=100, scaling_decay=0.9,
        ),
    )
    model.gaussian.register_by_pointcloud(xyz, colors, scales,
                                          init_opacity=0.5)
    model.counter.reset(model.num_points, model.capacity)
    model.counter.set_numpy(
        {
            "radius3d_min": np.full(model.num_points, 1e-4, np.float32),
            "radius3d_max": np.full(model.num_points, 10.0, np.float32),
        },
        model.capacity,
    )
    model.base_iter = 10
    model.training_setup()
    return model


def measure(model, cams, gt, bg, label):
    # warm: compile + first bucket seed
    for i in range(2):
        metrics, _ = model.training_iteration(cams[i], gt, bg, view_index=0)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for i in range(STEPS):
        metrics, _ = model.training_iteration(
            cams[2 + i % (len(cams) - 2)], gt, bg, view_index=0
        )
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / STEPS * 1000
    print(f"# {label}: {dt:.1f} ms/step", file=sys.stderr, flush=True)
    return round(dt, 1)


def main():
    out = {"metric": "spill_train_step_1080p", "unit": "ms/step",
           "n_points": N}
    cams = [make_cam(2 * math.pi * i / 16) for i in range(14)]
    rng = np.random.default_rng(7)
    gt = rng.integers(0, 256, (3, H, W), dtype=np.uint8)
    bg = np.zeros(3, np.float32)

    model = build_model(N)
    out["fused_device_ms"] = measure(model, cams, gt, bg, "fused device path")

    model = build_model(N)
    model.optimizer.to_host(("exp_avg_sq",))
    assert model.optimizer.spilled == ("exp_avg_sq",)
    out["spill_sq_ms"] = measure(model, cams, gt, bg,
                                 "spill exp_avg_sq (50M tier)")

    model = build_model(N)
    model.optimizer.to_host(("exp_avg_sq", "exp_avg"))
    assert model.optimizer.spilled == ("exp_avg", "exp_avg_sq")
    out["spill_both_ms"] = measure(model, cams, gt, bg,
                                   "spill both moments (100M tier)")

    out["slowdown_sq"] = round(out["spill_sq_ms"] / out["fused_device_ms"], 2)
    out["slowdown_both"] = round(
        out["spill_both_ms"] / out["fused_device_ms"], 2
    )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
