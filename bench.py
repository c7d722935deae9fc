"""Benchmark: FULL-FRAME 1080p throughput on the real TPU chip.

The headline metric is the complete per-frame path of an urban-scale
LoD-tree model — flat cut + weight-cull prepare + slice gather + tiled
Pallas render, all fused into one executable with zero per-frame host syncs
(`fused_prepare_render`) — on a synthetic 3.2M-point 3-level tree at the
reference's default LoD threshold (min_resolution_pixel = 3;
/root/reference/LoG/model/tensor_tree.py:21). Target semantics:
/root/reference/apps/train.py:41-83 timed demo loop; BASELINE.md bar:
>= 30 FPS @ 1080p on urban-scale checkpoints.

A SECOND metric (reported in the same JSON line under "secondary") runs the
same frame at min_res = 12 px, which lands the post-cut live set in the
reference's real-scene regime (~100-300k points after cut+cull) — the
synthetic tree at min_res 3 yields a 1.6M live set, several times denser
than the reference's urban captures.

Telemetry fields (VERDICT r2 weak #8): every metric carries its cut size,
slice bucket, pair budget, and measured pair count so BENCH_r*.json is
self-describing and round-over-round comparable.

The scene is generated ON DEVICE (log_tpu.utils.synth_tree); all syncs are
scalar fetches (ARCHITECTURE.md timing protocol).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
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
    # root_major layout: root-contiguous tail segments make the per-frame
    # weight-cull expansion gather-free (scatter-max + cummax, ~6 ms vs a
    # ~33 ms capacity-axis take — scripts/probe_prims.py). Production
    # models get the same layout from LoG.optimize_render_layout.
    params, tree_dev, is_leaf_opt = padded_model_device(
        jax.random.PRNGKey(0), N_ROOTS, cap, "root_major"
    )
    n_roots_bucket = min(next_capacity(N_ROOTS), cap)
    # alive bucket: capacity-axis sorts/passes sliced to [:cap_sort]
    # (render_fused picks the same bucket in production)
    cap_sort = min(cap, -(-n // (1 << 18)) * (1 << 18))

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

    def find_min_res_for_cut(target_cut, candidates=(12.0, 18.0, 24.0, 36.0, 48.0, 64.0, 96.0)):
        """Smallest candidate min_res whose LoD cut lands at or under
        target_cut points — the reference's real-scene live set is
        ~100-300k after cut+cull, while this synthetic tree at min_res 3
        cuts to 1.6M; the sizing executable is reused (min_res is traced)."""
        common = dict(
            n_alive=jnp.int32(n), is_leaf_opt=is_leaf_opt,
            current_depth=jnp.int32(20),
            background=jnp.zeros(3, jnp.float32),
            image_height=H, image_width=W,
            sh_degree=0, stage_has_tree=True, num_levels=3,
            backend="tiled", check_scale=4,
            cut_method="flat_slice", n_roots=n_roots_bucket,
            prep_backend="tiled", prep_max_pairs=1 << 19,
            cap_sort=cap_sort,
        )
        for mr in candidates:
            _, _, counts = fused_prepare_render(
                params, tree_dev, pcams[0], k_visible=min(1 << 21, cap),
                max_pairs=1 << 21,
                min_resolution_pixel=jnp.float32(mr), **common,
            )
            if int(np.asarray(counts)[:2].sum()) <= target_cut:
                return mr
        return candidates[-1]

    from log_tpu.model.train_step import fused_root_cull

    def root_cull(cam, full_cap=False):
        return fused_root_cull(
            params, tree_dev, cam, jnp.int32(n), H, W,
            prep_backend="tiled", prep_max_pairs=1 << 19, check_scale=4,
            n_roots=n_roots_bucket, cap_sort=0 if full_cap else cap_sort,
        )

    from log_tpu.model.block_render import (
        block_size_for, build_block_cache, render_blocks,
    )

    S_blk = block_size_for(cap)
    try:
        blk_cols, blk_meta = build_block_cache(
            params, tree_dev, is_leaf_opt, jnp.int32(n), S_blk
        )
        B_blk = cap // S_blk
    except Exception as e:  # pragma: no cover - defensive (driver bench)
        print(f"# block cache build failed: {e!r}", file=sys.stderr)
        blk_cols = blk_meta = None
        B_blk = 0

    def measure_blocks(min_res, label, cull_every=4):
        """Production demo path (model.render_fused with
        optimize_render_layout + check_render_every): block-pruned frame
        + cached capacity-axis weight cull, refreshed every `cull_every`
        frames INSIDE the timed loop. The synthetic tree is level-ordered,
        so coarse cuts prune deep blocks; spatial pruning needs partial
        views (urban cameras) and is exercised in tests."""
        w0 = root_cull(pcams[0], full_cap=True)
        _, _, counts = render_blocks(
            blk_cols, blk_meta, pcams[0], jnp.float32(min_res),
            jnp.int32(20), jnp.zeros(3, jnp.float32), H, W,
            k_blocks=B_blk, k_visible=min(1 << 21, cap),
            max_pairs=1 << 21, w_full=w0,
        )
        c = np.asarray(counts)
        cut = int(c[:2].sum())
        k_vis = min(next_capacity(int(cut * 1.2), 1 << 15), cap)
        max_pairs = pick_max_pairs(int(max(c[2], 1) * 1.1), per_point=1)
        # w_full-folded eligibility varies with occlusion across the orbit:
        # size the block budget from several cameras, not just the first
        n_elig = int(c[3])
        for ci in (8, 16, 24):
            _, _, c2 = render_blocks(
                blk_cols, blk_meta, pcams[ci], jnp.float32(min_res),
                jnp.int32(20), jnp.zeros(3, jnp.float32), H, W,
                k_blocks=B_blk, k_visible=min(1 << 21, cap),
                max_pairs=1 << 21, w_full=root_cull(pcams[ci], full_cap=True),
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

        float(checksum(frame(pcams[0], w0)[0]))
        float(checksum(frame(pcams[1], w0)[0]))
        demands = []
        t0 = time.perf_counter()
        w = w0
        for i in range(FRAMES):
            if i % cull_every == 0:
                w = root_cull(pcams[2 + i], full_cap=True)
            img, cc2 = frame(pcams[2 + i], w)
            demands.append(cc2)
        float(checksum(img))
        dt = (time.perf_counter() - t0) / FRAMES
        pairs_measured = int(max(int(np.asarray(d)[2]) for d in demands))
        return {
            "label": label,
            "fps": round(1.0 / dt, 3),
            "ms_per_frame": round(dt * 1000, 2),
            "min_res_pixel": min_res,
            "cut": cut,
            "k_vis": k_vis,
            "max_pairs": max_pairs,
            "pairs_measured": pairs_measured,
            "k_blocks": kb,
            "blocks_eligible": n_elig,
            "blocks_total": B_blk,
            "cull_every": cull_every,
        }

    def measure(min_res, label, cull_every=0, force_max_pairs=None):
        """cull_every=0: per-frame weight cull (reference semantics,
        LoG/model/level_of_gaussian.py:238-241 recomputes render_to_check
        every frame). cull_every=K>0: the capacity-axis cull mask refreshes
        every K frames INSIDE the timed loop (model.render_fused's
        check_render_every mode) — the cull is a conservative 1e-8
        occlusion test, so staleness changes the image below 8-bit
        visibility."""
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
        w0 = root_cull(pcams[0]) if cull_every else None
        # size the cut bucket once from the first camera
        _, _, counts = fused_prepare_render(
            params, tree_dev, pcams[0], k_visible=min(1 << 21, cap),
            max_pairs=1 << 21, w_full=w0, **common,
        )
        c = np.asarray(counts)
        cut = int(c[:2].sum())
        k_vis = min(next_capacity(int(cut * 1.2), 1 << 15), cap)
        # right-size the pair budget from the sizing frame's measured
        # UNCLAMPED demand (counts[2]) — the sorts/expansion/pack scale
        # with the budget, and k_vis*6 over-provisions several-fold
        max_pairs = pick_max_pairs(k_vis, per_point=6)
        if len(c) > 2 and c[2] > 0:
            max_pairs = min(
                max_pairs, pick_max_pairs(int(c[2] * 1.1), per_point=1)
            )
        if force_max_pairs is not None:
            max_pairs = force_max_pairs

        def frame(cam, w_full):
            img, _, cnt = fused_prepare_render(
                params, tree_dev, cam, k_visible=k_vis,
                max_pairs=max_pairs, w_full=w_full, **common,
            )
            return img, cnt

        float(checksum(frame(pcams[0], w0)[0]))
        float(checksum(frame(pcams[1], w0)[0]))
        demands = []
        t0 = time.perf_counter()
        w = w0
        for i in range(FRAMES):
            if cull_every and i % cull_every == 0:
                w = root_cull(pcams[2 + i])
            img, cnt = frame(pcams[2 + i], w)
            demands.append(cnt)  # device scalar, fetched after the loop
        float(checksum(img))
        dt = (time.perf_counter() - t0) / FRAMES
        # counts[2] is each frame's UNCLAMPED pair demand (post-cull,
        # including the runs_tail_only dummy pairs) — the honest number
        # max_pairs must cover for zero truncation (VERDICT r3 weak #1)
        pairs_measured = int(max(int(np.asarray(d)[2]) for d in demands))
        return {
            "label": label,
            "fps": round(1.0 / dt, 3),
            "ms_per_frame": round(dt * 1000, 2),
            "min_res_pixel": min_res,
            "cut": cut,
            "k_vis": k_vis,
            "max_pairs": max_pairs,
            "pairs_measured": pairs_measured,
            "cull_every": cull_every or "per_frame",
        }

    def hbm_stats():
        # memory_stats() returns nothing on the axon runtime; hbm_usage
        # falls back to live-array accounting + the device-kind HBM size
        try:
            from log_tpu.utils.hbm import hbm_usage

            u = hbm_usage()
            return {
                "hbm_in_use_gb": u.get("in_use_gb", u["live_gb"]),
                "hbm_limit_gb": u["limit_gb"],
                "hbm_source": u["source"],
            }
        except Exception:
            return {}

    def try_blocks(min_res, label):
        # the block path must never sink the whole bench on real-hardware
        # quirks: fall back to the plain amortized-cull fused frame
        if blk_cols is None:
            return measure(min_res, label + "_fallback", cull_every=4)
        try:
            return measure_blocks(min_res, label)
        except Exception as e:  # pragma: no cover
            print(f"# block path failed: {e!r}", file=sys.stderr)
            return measure(min_res, label + "_fallback", cull_every=4)

    import os as _os

    def measure_honest(min_res, label, cull_every=0):
        """measure() + one budget re-bump if the timed frames' true demand
        overflowed the sizing frame's budget — the reported headline never
        carries silent pair truncation (VERDICT r3 weak #1)."""
        m = measure(min_res, label, cull_every=cull_every)
        if m["pairs_measured"] > m["max_pairs"]:
            m = measure(
                min_res, label, cull_every=cull_every,
                force_max_pairs=pick_max_pairs(
                    int(m["pairs_measured"] * 1.05), per_point=1
                ),
            )
            m["budget_rebumped"] = True
        return m

    # HEADLINE: per-frame semantics in the REFERENCE OP ORDER — the
    # reference culls roots BEFORE the tree cut every frame
    # (LoG/model/level_of_gaussian.py:229-243: frustum -> render_to_check
    # -> traverse), so cull_every=1 (fused_root_cull at the capacity axis,
    # then the fused frame with w_full) is the faithful per-frame path; it
    # also shrinks the compaction slice and the pair budget vs round <= 3's
    # in-frame cull-after-compaction structure.
    try:
        head = measure_honest(
            3.0, "minres3_cullfirst_perframe", cull_every=1
        )
    except Exception as e:  # pragma: no cover - Mosaic fallback
        print(f"# quadform kernel failed, retrying VPU path: {e!r}",
              file=sys.stderr)
        _os.environ["LOG_TPU_QUADFORM"] = "0"
        head = measure_honest(
            3.0, "minres3_cullfirst_perframe_novq", cull_every=1
        )
    head_amort = try_blocks(3.0, "minres3_blocks_cull4")
    mr_real = find_min_res_for_cut(300_000)
    realistic = measure_honest(
        mr_real, f"realistic_minres{mr_real:g}_cullfirst_perframe",
        cull_every=1,
    )
    real_amort = try_blocks(
        mr_real, f"realistic_minres{mr_real:g}_blocks_cull4"
    )

    print(
        json.dumps(
            {
                "metric": f"full_frame_fps_1080p_{n}pts_tree_cut",
                "value": head["fps"],
                "unit": "fps",
                "vs_baseline": round(head["fps"] / 30.0, 4),
                "n_points": n,
                "cut": head["cut"],
                "k_vis": head["k_vis"],
                "max_pairs": head["max_pairs"],
                "pairs_measured": head["pairs_measured"],
                "ms_per_frame": head["ms_per_frame"],
                "headline_label": head["label"],
                "blocks_cull4": head_amort,
                **hbm_stats(),
                "secondary": realistic,
                "secondary_blocks_cull4": real_amort,
            }
        )
    )


if __name__ == "__main__":
    main()
