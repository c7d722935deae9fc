"""Targeted probes: sorted-key sort pathology, proj cost, searchsorted,
scatter-expand. All data generated on device."""
from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPS = 10


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
        print(
            f"{name}: {(time.perf_counter()-t0)/REPS*1000:.2f} ms",
            flush=True,
        )

    key0 = jax.random.PRNGKey(0)
    L = 5 << 20  # ~5.2M

    @partial(jax.jit, static_argnums=(1,))
    def gen(key, L):
        kk, kp = jax.random.split(key)
        keys = jax.random.randint(kk, (L,), 0, 1 << 23).astype(jnp.uint32)
        pays = jax.random.uniform(kp, (14, L), jnp.float32)
        return keys, pays

    keys_rand, pays = gen(key0, L)
    keys_sorted = jnp.sort(keys_rand)
    # "merged two ascending runs" — the expansion sort's key pattern
    keys_merged = jnp.concatenate(
        [jnp.sort(keys_rand[: L // 6]) * 2,
         jnp.arange(L - L // 6, dtype=jnp.uint32) * 2 + 1]
    )
    float(jnp.sum(pays[0]))

    def srt14(keys, pays):
        ops = (keys,) + tuple(pays[r] for r in range(14))
        return jax.lax.sort(ops, num_keys=1, is_stable=False)[1]

    f = jax.jit(srt14)
    bench("sort 5.2M x14 RANDOM keys", f, keys_rand, pays)
    bench("sort 5.2M x14 SORTED keys", f, keys_sorted, pays)
    bench("sort 5.2M x14 MERGED-ascending keys", f, keys_merged, pays)

    # ---- projection cost at the cut size
    P = 786432
    kj = jax.random.split(key0, 6)
    xyz = jax.random.normal(kj[0], (P, 3)) * 20.0
    scaling = jax.random.uniform(kj[1], (P, 3), minval=0.05, maxval=0.3)
    rotation = jax.random.normal(kj[2], (P, 4))
    rotation = rotation / jnp.linalg.norm(rotation, axis=-1, keepdims=True)
    opacity = jax.random.uniform(kj[3], (P,), minval=0.3, maxval=0.9)
    wv = jnp.eye(4).at[2, 3].set(30.0)
    fp = wv
    float(jnp.sum(xyz))

    from log_tpu.ops.projection import project_gaussians

    for tr in (False, True):
        @jax.jit
        def proj(xyz, scaling, rotation, opacity, tr=tr):
            sp = project_gaussians(
                xyz=xyz, scaling=scaling, rotation=rotation, opacity=opacity,
                world_view=wv, full_proj=fp, focal_x=1400.0, focal_y=1400.0,
                tan_fovx=0.7, tan_fovy=0.4, image_height=1088,
                image_width=1920, mode="antialias", use_filter=False,
                active_mask=jnp.ones(P, bool), tight_radius=tr,
            )
            return sp.radius + sp.depth + sp.conic[:, 0] + sp.pix_xy[:, 0]

        bench(f"proj @786k tight_radius={tr}", proj, xyz, scaling,
              rotation, opacity)

    # ---- searchsorted costs
    A = 1 << 22
    offs = jnp.sort(
        jax.random.randint(kj[4], (P,), 0, A).astype(jnp.int32)
    )
    tile_keys = jnp.sort(
        jax.random.randint(kj[5], (A,), 0, 2041).astype(jnp.int32)
    )
    float(jnp.sum(offs))

    @jax.jit
    def ss_lo(offs):
        starts = jnp.arange(A // 512, dtype=jnp.int32) * 512
        return jnp.searchsorted(offs, starts, side="right")

    bench("searchsorted 8192 probes in 786k", ss_lo, offs)

    @jax.jit
    def ss_tiles(tile_keys):
        bounds = jnp.arange(2042, dtype=jnp.int32)
        return jnp.searchsorted(tile_keys, bounds, side="left")

    bench("searchsorted 2042 probes in 4.2M", ss_tiles, tile_keys)

    # ---- scatter-expand at the cut size (13 rows)
    vals13 = jax.random.uniform(kj[0], (13, P), jnp.float32)
    float(jnp.sum(vals13))

    @jax.jit
    def scat(vals, offs):
        deltas = jnp.concatenate(
            [vals[:, :1], vals[:, 1:] - vals[:, :-1]], axis=1
        )
        base = jnp.zeros((13, A), jnp.float32)
        seeded = base.at[:, offs].add(deltas, mode="drop")
        return jnp.cumsum(seeded, axis=1)

    bench("scatter-expand 13rows P=786k A=4.2M", scat, vals13, offs)


if __name__ == "__main__":
    main()
