"""Probe round 4: bisect the jnp sort-expansion's 135 ms (its two sorts
cost ~25 ms standalone), and measure flat-cut / check render with params
passed as ARGUMENTS (closing over big device arrays embeds them in the
HLO -> the remote compile service rejects/chokes: HTTP 413)."""
from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPS = 10
PHASES = sys.argv[1:] or ["bisect", "cut", "check"]


def main():
    import jax
    import jax.numpy as jnp

    def bench(name, fn, *args):
        r = fn(*args)
        out = r[-1] if isinstance(r, tuple) else r
        float(jnp.sum(out * 1.000001))
        t0 = time.perf_counter()
        for _ in range(REPS):
            r = fn(*args)
        out = r[-1] if isinstance(r, tuple) else r
        float(jnp.sum(out * 1.000001))
        print(f"{name}: {(time.perf_counter()-t0)/REPS*1000:.2f} ms",
              flush=True)

    key0 = jax.random.PRNGKey(0)

    if "bisect" in PHASES:
        P, A = 786432, 1 << 22
        R = 13
        kc, kv = jax.random.split(key0)
        counts = jax.random.randint(kc, (P,), 0, 9)
        offs = jnp.minimum(jnp.cumsum(counts) - counts, A).astype(jnp.int32)
        vals = jax.random.uniform(kv, (R, P), jnp.float32)
        float(jnp.sum(vals[0]))

        def stage1(vals, offs):
            deltas = jnp.concatenate(
                [vals[:, :1], vals[:, 1:] - vals[:, :-1]], axis=1
            )
            key_real = jnp.minimum(offs, A).astype(jnp.uint32) * 2
            key_fill = jnp.arange(A, dtype=jnp.uint32) * 2 + 1
            keys = jnp.concatenate([key_real, key_fill])
            merged = jnp.concatenate(
                [deltas, jnp.zeros((R, A), jnp.float32)], axis=1
            )
            ops = (keys,) + tuple(merged[r] for r in range(R))
            return jax.lax.sort(ops, num_keys=1, is_stable=False)

        bench("stage1: build + sort1", jax.jit(
            lambda v, o: stage1(v, o)[1]), vals, offs)

        def stage2(vals, offs):
            s = stage1(vals, offs)
            run = jnp.cumsum(jnp.stack(s[1:], axis=0), axis=1)
            return run

        bench("stage2: + stack + cumsum", jax.jit(stage2), vals, offs)

        def stage3(vals, offs):
            s = stage1(vals, offs)
            k_s = s[0]
            run = jnp.cumsum(jnp.stack(s[1:], axis=0), axis=1)
            is_fill = (k_s & 1) == 1
            key2 = jnp.where(
                is_fill, k_s >> 1,
                jnp.uint32(A) + jnp.arange(P + A, dtype=jnp.uint32),
            )
            ops2 = (key2,) + tuple(run[r] for r in range(R))
            sorted2 = jax.lax.sort(ops2, num_keys=1, is_stable=False)
            return sorted2[1]

        bench("stage3: + key2 + sort2", jax.jit(stage3), vals, offs)

        def stage4(vals, offs):
            s = stage1(vals, offs)
            k_s = s[0]
            run = jnp.cumsum(jnp.stack(s[1:], axis=0), axis=1)
            is_fill = (k_s & 1) == 1
            key2 = jnp.where(
                is_fill, k_s >> 1,
                jnp.uint32(A) + jnp.arange(P + A, dtype=jnp.uint32),
            )
            ops2 = (key2,) + tuple(run[r] for r in range(R))
            sorted2 = jax.lax.sort(ops2, num_keys=1, is_stable=False)
            return jnp.stack(sorted2[1:], axis=0)[:, :A]

        bench("stage4: full (+ stack + slice)", jax.jit(stage4), vals, offs)

        # cumsum on the stacked (13, 5.2M) alone
        big = jax.random.uniform(key0, (R, P + A), jnp.float32)
        float(jnp.sum(big[0]))
        bench("cumsum (13, 5.2M) axis=1", jax.jit(
            lambda b: jnp.cumsum(b, axis=1)), big)

    if "cut" in PHASES or "check" in PHASES:
        from log_tpu.dataset.base import prepare_camera
        from log_tpu.model.gaussian import next_capacity
        from log_tpu.render.renderer import camera_device
        from log_tpu.utils.synth_tree import padded_model_device, tree_sizes
        from log_tpu.ops import gaussian_math as gm
        from log_tpu.model.tensor_tree import flat_cut

        N_ROOTS = 600_000
        H, W = 1088, 1920
        _, _, n = tree_sizes(N_ROOTS)
        cap = next_capacity(n)
        params, tree_dev, is_leaf_opt = padded_model_device(
            jax.random.PRNGKey(0), N_ROOTS, cap
        )
        Rb = min(next_capacity(N_ROOTS), cap)
        pos = np.array([22 * math.cos(0.3), 22 * math.sin(0.3), 18.0])
        fwd = -pos / np.linalg.norm(pos)
        right = np.cross(fwd, np.array([0, 0, 1.0]))
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        Rm = np.stack([right, up, fwd])
        T = (-Rm @ pos).reshape(3, 1)
        K = np.array([[1400.0, 0, W / 2], [0, 1400.0, H / 2], [0, 0, 1]])
        cam = camera_device(prepare_camera(
            {"K": K, "R": Rm, "T": T, "H": H, "W": W,
             "center": pos.reshape(3, 1)}, 1, 0.01, 1000.0
        ))

    if "cut" in PHASES:
        @jax.jit
        def cut_only(params, tree_dev, cam):
            xyz = params["xyz"]
            x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
            px, py, pz, _ = gm.project_ndc_c(x, y, z, cam["full_proj"])
            frus = gm.frustum_flag_c(px, py, pz, padding=0.5)
            alive = jnp.arange(cap) < n
            scaling = jnp.exp(params["scaling"])
            rotation = params["rotation"]
            r_self = gm.compute_radius2d(
                xyz, scaling, rotation, cam["world_view"], cam["full_proj"],
                cam["focal_x"], cam["focal_y"], cam["tan_fovx"],
                cam["tan_fovy"],
            )
            r_par = gm.compute_radius2d(
                tree_dev["parent_xyz"], jnp.exp(tree_dev["parent_scaling"]),
                tree_dev["parent_rotation"], cam["world_view"],
                cam["full_proj"], cam["focal_x"], cam["focal_y"],
                cam["tan_fovx"], cam["tan_fovy"],
            )
            root_visible = (tree_dev["index_parent"] == -1) & frus & alive
            keep = flat_cut(
                tree_dev["index_parent"], tree_dev["node_index"],
                tree_dev["depth"], tree_dev["root_id"], r_self, r_par,
                root_visible, alive, jnp.float32(3.0), jnp.int32(20),
            )
            return keep.astype(jnp.float32)

        bench("flat cut only", cut_only, params, tree_dev, cam)

    if "check" in PHASES:
        from log_tpu.ops.rasterize_tiled import rasterize_tiled

        def check(params, tree_dev, cam, stats):
            xyz = params["xyz"][:Rb]
            scaling = jnp.exp(params["scaling"][:Rb])
            rotation = params["rotation"][:Rb]
            rotation = rotation / jnp.linalg.norm(
                rotation, axis=-1, keepdims=True
            )
            opacity = jax.nn.sigmoid(params["opacity"][:Rb, 0])
            x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
            px, py, pz, _ = gm.project_ndc_c(x, y, z, cam["full_proj"])
            cand = gm.frustum_flag_c(px, py, pz, padding=0.5) & (
                tree_dev["index_parent"][:Rb] == -1
            )
            out = rasterize_tiled(
                xyz=xyz, colors=jnp.ones_like(xyz), opacity=opacity,
                scaling=scaling, rotation=rotation,
                means2d_offset=jnp.zeros((Rb, 2), jnp.float32),
                world_view=cam["world_view"], full_proj=cam["full_proj"],
                focal_x=cam["focal_x"] / 4, focal_y=cam["focal_y"] / 4,
                tan_fovx=cam["tan_fovx"], tan_fovy=cam["tan_fovy"],
                background=jnp.zeros(3), image_height=H // 4,
                image_width=W // 4, active_mask=cand, mode="antialias",
                use_filter=True, max_pairs=1 << 19, with_stats=stats,
                tight_radius=True,
            )
            return out["point_weight"] if stats else out["render"]

        import functools

        bench(
            "check render weights+scatter-max",
            jax.jit(functools.partial(check, stats="weights")),
            params, tree_dev, cam,
        )
        bench(
            "check render with_stats=False",
            jax.jit(functools.partial(check, stats=False)),
            params, tree_dev, cam,
        )


if __name__ == "__main__":
    main()
