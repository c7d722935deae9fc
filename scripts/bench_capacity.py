"""Single-chip CAPACITY datapoint: a >=10M-point LoD tree on one v5e chip
(BASELINE.json config 4: "UrbanScene3D block ~10M Gaussians"; VERDICT r4
item 3).

Measures, at n_roots=1.9M -> 10.26M total points (tree_sizes):
  * HBM at rest (model + tree + block cache live bytes) and the static
    peak of the render executable (XLA buffer assignment temp bytes) —
    utils/hbm.py telemetry, which works on the axon runtime where
    device.memory_stats() returns nothing;
  * 1080p render FPS: block-pruned path (production demo path) and the
    amortized fused path, at a realistic urban cut (min_res 96) and the
    dense min_res 3 cut;
  * fused train-step ms at the full 10M capacity axis (tree-stage step:
    cut-bucket forward/backward + capacity-axis Adam scatter);
  * whether SparseOptimizer.maybe_spill engages (reference thresholds
    50M/100M points, LoG/model/splitter.py:198-204 — at 10M it must NOT;
    the mechanism itself is equality-tested in tests/test_spill.py).

Pair budgets are sized from measured demand; after the timed loop the
max UNCLAMPED demand is checked against the budget and the run is
re-timed on a raised 1.5x-ladder budget if any frame overflowed (so a
truncated frame can never inflate the reported FPS).

Usage: python scripts/bench_capacity.py [n_roots]      (default 1_900_000)
Prints one JSON line; paste into BASELINE.md round-5 capacity table.
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_ROOTS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_900_000
H, W = 1088, 1920
FRAMES = 12


def ladder(need: int) -> int:
    """1.5x-step budget >= need (no 8M rail: `need` is measured demand)."""
    cap = 1 << 16
    while cap < need:
        nxt = cap + cap // 2
        cap = nxt if nxt >= need else cap * 2
    return cap


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
    from log_tpu.model.block_render import (
        block_size_for, build_block_cache, render_blocks,
    )
    from log_tpu.model.gaussian import next_capacity
    from log_tpu.model.train_step import (
        StepConfig, fused_prepare_render, fused_prepare_train_step,
        fused_root_cull,
    )
    from log_tpu.ops import pick_max_pairs
    from log_tpu.render.renderer import camera_device
    from log_tpu.utils.hbm import hbm_usage
    from log_tpu.utils.synth_tree import padded_model_device, tree_sizes

    out: dict = {"metric": "capacity_10m_single_chip", "unit": "report"}

    _, _, n = tree_sizes(N_ROOTS)
    cap = next_capacity(n)
    out["n_points"] = int(n)
    out["capacity"] = int(cap)

    t0 = time.perf_counter()
    params, tree_dev, is_leaf_opt = padded_model_device(
        jax.random.PRNGKey(0), N_ROOTS, cap, "root_major"
    )
    jax.block_until_ready(params["xyz"])
    out["build_s"] = round(time.perf_counter() - t0, 1)

    u = hbm_usage()
    out["hbm_rest_gb"] = round(u.get("in_use_gb", u["live_gb"]), 3)
    out["hbm_limit_gb"] = u["limit_gb"]
    out["hbm_source"] = u["source"]

    n_roots_bucket = min(next_capacity(N_ROOTS), cap)
    cap_sort = min(cap, -(-n // (1 << 18)) * (1 << 18))
    pcams = [
        camera_device(
            prepare_camera(make_cam(2 * math.pi * i / (FRAMES + 2)), 1,
                           0.01, 1000.0)
        )
        for i in range(FRAMES + 2)
    ]

    @jax.jit
    def checksum(x):
        return jnp.sum(x)

    def root_cull(cam, full_cap=True):
        return fused_root_cull(
            params, tree_dev, cam, jnp.int32(n), H, W,
            prep_backend="tiled", prep_max_pairs=1 << 19, check_scale=4,
            n_roots=n_roots_bucket, cap_sort=0 if full_cap else cap_sort,
        )

    # ---------------------------------------------------------- block path
    S_blk = block_size_for(cap)
    blk_cols, blk_meta = build_block_cache(
        params, tree_dev, is_leaf_opt, jnp.int32(n), S_blk
    )
    jax.block_until_ready(blk_cols)
    B_blk = cap // S_blk
    u = hbm_usage()
    out["hbm_with_block_cache_gb"] = round(u.get("in_use_gb", u["live_gb"]), 3)

    def measure_blocks(min_res, label, cull_every=4):
        w0 = root_cull(pcams[0])
        _, _, counts = render_blocks(
            blk_cols, blk_meta, pcams[0], jnp.float32(min_res),
            jnp.int32(20), jnp.zeros(3, jnp.float32), H, W,
            k_blocks=B_blk, k_visible=min(1 << 21, cap),
            max_pairs=1 << 21, w_full=w0,
        )
        c = np.asarray(counts)
        cut = int(c[:2].sum())
        k_vis = min(next_capacity(int(cut * 1.2), 1 << 15), cap)
        max_pairs = pick_max_pairs(int(max(c[2], 1) * 1.3), per_point=1)
        n_elig = int(c[3])
        for ci in (4, 8):
            _, _, c2 = render_blocks(
                blk_cols, blk_meta, pcams[ci], jnp.float32(min_res),
                jnp.int32(20), jnp.zeros(3, jnp.float32), H, W,
                k_blocks=B_blk, k_visible=min(1 << 21, cap),
                max_pairs=1 << 21, w_full=root_cull(pcams[ci]),
            )
            n_elig = max(n_elig, int(np.asarray(c2)[3]))
        kb = min(B_blk, max(16, -(-int(n_elig * 1.3) // 16) * 16))

        def frame(cam, w_full):
            img, _, cc = render_blocks(
                blk_cols, blk_meta, cam, jnp.float32(min_res),
                jnp.int32(20), jnp.zeros(3, jnp.float32), H, W,
                k_blocks=kb, k_visible=k_vis, max_pairs=max_pairs,
                w_full=w_full,
            )
            return img, cc

        # time; if any timed frame's UNCLAMPED demand exceeded the budget,
        # pairs were silently dropped -> rebump on the 1.5x ladder, re-time
        rebumped = False
        for _attempt in range(3):
            float(checksum(frame(pcams[0], w0)[0]))
            float(checksum(frame(pcams[1], w0)[0]))
            demands = []
            t0 = time.perf_counter()
            w = w0
            for i in range(FRAMES):
                if i % cull_every == 0:
                    w = root_cull(pcams[2 + i])
                img, cc2 = frame(pcams[2 + i], w)
                demands.append(cc2)
            float(checksum(img))
            dt = (time.perf_counter() - t0) / FRAMES
            pairs_measured = int(max(int(np.asarray(d)[2]) for d in demands))
            if pairs_measured <= max_pairs:
                break
            max_pairs = ladder(int(pairs_measured * 1.15))
            rebumped = True
        return {
            "label": label, "fps": round(1.0 / dt, 3),
            "ms_per_frame": round(dt * 1000, 2), "min_res_pixel": min_res,
            "cut": cut, "k_vis": k_vis, "max_pairs": max_pairs,
            "pairs_measured": pairs_measured,
            "budget_overflow": bool(pairs_measured > max_pairs),
            "budget_rebumped": rebumped,
            "k_blocks": kb, "blocks_eligible": n_elig,
            "blocks_total": B_blk, "cull_every": cull_every,
        }

    # ------------------------------------------------- fused (non-block)
    def measure_fused(min_res, label, cull_every=4):
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
        w0 = root_cull(pcams[0], full_cap=False)
        _, _, counts = fused_prepare_render(
            params, tree_dev, pcams[0], k_visible=min(1 << 21, cap),
            max_pairs=1 << 21, w_full=w0, **common,
        )
        c = np.asarray(counts)
        cut = int(c[:2].sum())
        k_vis = min(next_capacity(int(cut * 1.2), 1 << 15), cap)
        max_pairs = pick_max_pairs(int(max(c[2], k_vis) * 1.25), per_point=1)

        def frame(cam, w_full):
            img, _, cnt = fused_prepare_render(
                params, tree_dev, cam, k_visible=k_vis,
                max_pairs=max_pairs, w_full=w_full, **common,
            )
            return img, cnt

        rebumped = False
        for _attempt in range(3):
            float(checksum(frame(pcams[0], w0)[0]))
            float(checksum(frame(pcams[1], w0)[0]))
            t0 = time.perf_counter()
            w = w0
            demands = []
            for i in range(FRAMES):
                if i % cull_every == 0:
                    w = root_cull(pcams[2 + i], full_cap=False)
                img, cnt = frame(pcams[2 + i], w)
                demands.append(cnt)
            float(checksum(img))
            dt = (time.perf_counter() - t0) / FRAMES
            pairs_measured = int(max(int(np.asarray(d)[2]) for d in demands))
            if pairs_measured <= max_pairs:
                break
            max_pairs = ladder(int(pairs_measured * 1.15))
            rebumped = True
        return {
            "label": label, "fps": round(1.0 / dt, 3),
            "ms_per_frame": round(dt * 1000, 2), "min_res_pixel": min_res,
            "cut": cut, "k_vis": k_vis, "max_pairs": max_pairs,
            "pairs_measured": pairs_measured,
            "budget_overflow": bool(pairs_measured > max_pairs),
            "budget_rebumped": rebumped,
            "cull_every": cull_every,
        }

    out["blocks_minres96"] = measure_blocks(96.0, "blocks_cull4_minres96")
    out["blocks_minres3"] = measure_blocks(3.0, "blocks_cull4_minres3")
    out["fused_minres96"] = measure_fused(96.0, "fused_cull4_minres96")

    u = hbm_usage()
    out["hbm_after_render_gb"] = round(u.get("in_use_gb", u["live_gb"]), 3)

    # ------------------------------------------------------- train step
    # tree-stage fused step: forward/backward on the cut bucket, Adam
    # gather/scatter across the FULL 10M capacity axis (the part that
    # scales with total points)
    try:
        moments = {
            "exp_avg": {k: jnp.zeros_like(v) for k, v in params.items()},
            "exp_avg_sq": {k: jnp.zeros_like(v) for k, v in params.items()},
        }
        from log_tpu.model.counter import init_counter

        counter = {k: jnp.asarray(v) for k, v in init_counter(cap).items()}
        cut96 = out["fused_minres96"]["cut"]
        k_bucket = min(next_capacity(int(cut96 * 1.3), 1 << 15), cap)
        cfg = StepConfig(
            image_height=H, image_width=W, k_leaf=k_bucket, k_node=0,
            sh_degree=0, mode="antialias", backend="tiled",
            max_pairs=pick_max_pairs(k_bucket),
        )
        lrs = {
            k: jnp.float32(1e-3)
            for k in ("xyz", "colors", "scaling", "opacity", "rotation",
                      "shs")
        }
        corr = {
            "values": jnp.ones((1, 3)), "m1": jnp.zeros((1, 3)),
            "m2": jnp.zeros((1, 3)), "vmax": jnp.zeros((1, 3)),
            "steps": jnp.zeros((1,), jnp.int32),
        }
        gt = jax.jit(
            lambda: (jax.random.uniform(jax.random.PRNGKey(7), (3, H, W))
                     * 255).astype(jnp.uint8)
        )()
        ones = jnp.ones((1, 1, 1), jnp.float32)
        oned = jnp.ones((1, 1), jnp.float32)
        key = jax.random.PRNGKey(1)
        # production cut path: 'flat' one-gather cut via the parent-attr
        # cache + root-prefix weight cull (LoG.cut_method_train) — the
        # 'traverse' default re-gathers parent pointers per level, ~110 ms
        # of pure gathers at this capacity that the real trainer never pays
        def step(params, moments, counter, corr, cam, i):
            return fused_prepare_train_step(
                params, moments, counter, tree_dev, jnp.int32(n),
                is_leaf_opt, jnp.float32(96.0), jnp.int32(20),
                cam, gt, jnp.zeros(3), lrs, jnp.float32(i + 1), corr,
                jnp.int32(0), ones, oned, key,
                stage_has_tree=True, num_levels=3, prep_backend="tiled",
                prep_max_pairs=1 << 19, check_scale=4, cfg=cfg,
                cut_method="flat", n_roots=n_roots_bucket,
            )

        st = (params, moments, counter, corr)
        for i in range(2):
            p, m, c, co, metrics, aux = step(*st, pcams[i], i)
            st = (p, m, c, co)
        float(metrics["loss"])
        u = hbm_usage()
        out["hbm_train_gb"] = round(u.get("in_use_gb", u["live_gb"]), 3)
        t0 = time.perf_counter()
        for i in range(8):
            p, m, c, co, metrics, aux = step(*st, pcams[2 + i % FRAMES],
                                             2 + i)
            st = (p, m, c, co)
        float(metrics["loss"])
        out["train_step_ms"] = round((time.perf_counter() - t0) / 8 * 1000, 1)
        out["train_k_bucket"] = int(k_bucket)
        del st, moments, counter, p, m, c, co
    except Exception as e:  # pragma: no cover - report partial results
        out["train_step_error"] = repr(e)

    # ---------------------------------------------------------- spill
    from log_tpu.model.sparse_optimizer import SparseOptimizer

    opt = SparseOptimizer.__new__(SparseOptimizer)
    opt.spilled = ()
    opt.spill_points = 50_000_000
    opt.spill_points_full = 100_000_000
    opt.moments = {"exp_avg": {}, "exp_avg_sq": {}}
    out["spill"] = {
        "engaged_at_10m": bool(opt.maybe_spill(int(n))),
        "threshold_points": opt.spill_points,
        "threshold_points_full": opt.spill_points_full,
        "note": "reference thresholds (splitter.py:198-204); mechanism "
                "equality-tested in tests/test_spill.py",
    }

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
