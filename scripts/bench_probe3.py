"""Probe round 3: (a) does stacking columns into (k,3)/(k,4) arrays
materialize padded buffers (cost ~15-20 ms at 786k)? (b) clean re-measure
of the jnp sort-expansion; (c) flat-cut-only cost; (d) the check render
in isolation. All data on device."""
from __future__ import annotations

import math
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPS = 10
PHASES = sys.argv[1:] or ["stack", "sortexp", "cut", "check"]


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

    if "stack" in PHASES:
        k = 786432
        cols = jax.random.uniform(key0, (14, k), jnp.float32)
        float(jnp.sum(cols[0]))

        @jax.jit
        def with_stack(cols):
            xyz = jnp.stack([cols[0], cols[1], cols[2]], axis=1)
            scal = jnp.stack([cols[3], cols[4], cols[5]], axis=1)
            rot = jnp.stack([cols[6], cols[7], cols[8], cols[9]], axis=1)
            col3 = jnp.stack([cols[10], cols[11], cols[12]], axis=1)
            s = jnp.exp(scal)
            r = rot / jnp.linalg.norm(rot, axis=-1, keepdims=True)
            v = xyz[:, 0] * s[:, 1] + r[:, 2] * col3[:, 0] + xyz[:, 2]
            return v * jax.nn.sigmoid(cols[13])

        @jax.jit
        def no_stack(cols):
            s1 = jnp.exp(cols[4])
            nrm = jnp.sqrt(
                cols[6] ** 2 + cols[7] ** 2 + cols[8] ** 2 + cols[9] ** 2
            )
            r2 = cols[8] / nrm
            v = cols[0] * s1 + r2 * cols[10] + cols[2]
            return v * jax.nn.sigmoid(cols[13])

        bench("activations WITH (k,3)/(k,4) stacks", with_stack, cols)
        bench("activations columns only", no_stack, cols)

    if "sortexp" in PHASES:
        from log_tpu.ops.rasterize_tiled import _piecewise_expand_sort

        P, A = 786432, 1 << 22
        kc, kv = jax.random.split(key0)
        counts = jax.random.randint(kc, (P,), 0, 9)
        offs = jnp.minimum(jnp.cumsum(counts) - counts, A).astype(jnp.int32)
        vals = jax.random.uniform(kv, (13, P), jnp.float32)
        float(jnp.sum(vals[0]))
        bench(
            f"jnp sort-expand 13rows P={P} A={A}",
            jax.jit(lambda v, o: _piecewise_expand_sort(v, o, A)), vals, offs,
        )
        P2 = 1 << 20
        offs2 = jnp.minimum(
            jnp.cumsum(counts[:P2] % 2) - counts[:P2] % 2, 1 << 19
        ).astype(jnp.int32)
        bench(
            f"jnp sort-expand 13rows P={P2} A={1 << 19} (check-size)",
            jax.jit(lambda v, o: _piecewise_expand_sort(v, o, 1 << 19)),
            vals[:, :P2], offs2,
        )

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
        R = min(next_capacity(N_ROOTS), cap)

        def mk(theta):
            pos = np.array(
                [22 * math.cos(theta), 22 * math.sin(theta), 18.0]
            )
            fwd = -pos / np.linalg.norm(pos)
            right = np.cross(fwd, np.array([0, 0, 1.0]))
            right /= np.linalg.norm(right)
            up = np.cross(fwd, right)
            Rm = np.stack([right, up, fwd])
            T = (-Rm @ pos).reshape(3, 1)
            K = np.array([[1400.0, 0, W / 2], [0, 1400.0, H / 2], [0, 0, 1]])
            return camera_device(prepare_camera(
                {"K": K, "R": Rm, "T": T, "H": H, "W": W,
                 "center": pos.reshape(3, 1)}, 1, 0.01, 1000.0
            ))

        cam = mk(0.3)

    if "cut" in PHASES:
        @jax.jit
        def cut_only(cam, rv_seed):
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

        bench("flat cut only (no check render)", cut_only, cam,
              jnp.float32(0))

    if "check" in PHASES:
        from log_tpu.ops.rasterize_tiled import rasterize_tiled

        @jax.jit
        def check_only(cam):
            xyz = params["xyz"][:R]
            scaling = jnp.exp(params["scaling"][:R])
            rotation = params["rotation"][:R]
            rotation = rotation / jnp.linalg.norm(
                rotation, axis=-1, keepdims=True
            )
            opacity = jax.nn.sigmoid(params["opacity"][:R, 0])
            x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
            px, py, pz, _ = gm.project_ndc_c(x, y, z, cam["full_proj"])
            cand = gm.frustum_flag_c(px, py, pz, padding=0.5) & (
                tree_dev["index_parent"][:R] == -1
            )
            out = rasterize_tiled(
                xyz=xyz, colors=jnp.ones_like(xyz), opacity=opacity,
                scaling=scaling, rotation=rotation,
                means2d_offset=jnp.zeros((R, 2), jnp.float32),
                world_view=cam["world_view"], full_proj=cam["full_proj"],
                focal_x=cam["focal_x"] / 4, focal_y=cam["focal_y"] / 4,
                tan_fovx=cam["tan_fovx"], tan_fovy=cam["tan_fovy"],
                background=jnp.zeros(3), image_height=H // 4,
                image_width=W // 4, active_mask=cand, mode="antialias",
                use_filter=True, max_pairs=1 << 19, with_stats="weights",
                tight_radius=True,
            )
            return out["point_weight"]

        bench("check render (current: weights+scatter-max)", check_only, cam)

        @jax.jit
        def check_nostats(cam):
            xyz = params["xyz"][:R]
            scaling = jnp.exp(params["scaling"][:R])
            rotation = params["rotation"][:R]
            rotation = rotation / jnp.linalg.norm(
                rotation, axis=-1, keepdims=True
            )
            opacity = jax.nn.sigmoid(params["opacity"][:R, 0])
            x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
            px, py, pz, _ = gm.project_ndc_c(x, y, z, cam["full_proj"])
            cand = gm.frustum_flag_c(px, py, pz, padding=0.5) & (
                tree_dev["index_parent"][:R] == -1
            )
            out = rasterize_tiled(
                xyz=xyz, colors=jnp.ones_like(xyz), opacity=opacity,
                scaling=scaling, rotation=rotation,
                means2d_offset=jnp.zeros((R, 2), jnp.float32),
                world_view=cam["world_view"], full_proj=cam["full_proj"],
                focal_x=cam["focal_x"] / 4, focal_y=cam["focal_y"] / 4,
                tan_fovx=cam["tan_fovx"], tan_fovy=cam["tan_fovy"],
                background=jnp.zeros(3), image_height=H // 4,
                image_width=W // 4, active_mask=cand, mode="antialias",
                use_filter=True, max_pairs=1 << 19, with_stats=False,
                tight_radius=True,
            )
            return out["render"]

        bench("check render (with_stats=False)", check_nostats, cam)


if __name__ == "__main__":
    main()
