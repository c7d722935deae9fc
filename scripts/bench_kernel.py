"""Forward-kernel isolation: per-chunk cost and early-exit efficacy.

Builds synthetic SORTED pair tables directly (on device), bypassing
binning: `t` tiles x `cpt` chunks-per-tile of 128 pairs each, gaussians
centered in their tile with controllable opacity (high opacity ->
saturation -> early exit).

Usage: python scripts/bench_kernel.py
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 10
H, W = 1088, 1920


def main():
    import jax
    import jax.numpy as jnp

    from log_tpu.ops.rasterize_tiled import (
        N_ROWS, PAIR_CHUNK, TILE_H, TILE_W, _raster_core, pack_rows,
    )

    tiles_x = (W + TILE_W - 1) // TILE_W
    tiles_y = (H + TILE_H - 1) // TILE_H
    num_tiles = tiles_x * tiles_y

    def bench(name, fn, *args):
        r = fn(*args)
        out = r[0] if isinstance(r, tuple) else r
        float(jnp.sum(out * 1.000001))
        t0 = time.perf_counter()
        for _ in range(REPS):
            r = fn(*args)
        out = r[0] if isinstance(r, tuple) else r
        float(jnp.sum(out * 1.000001))
        dt = (time.perf_counter() - t0) / REPS * 1000
        print(f"{name}: {dt:.2f} ms", flush=True)
        return dt

    @partial(jax.jit, static_argnums=(1, 2))
    def make_pairs(key, cpt, opac):
        A = num_tiles * cpt * PAIR_CHUNK
        tile_of = jnp.arange(A, dtype=jnp.int32) // (cpt * PAIR_CHUNK)
        ty = tile_of // tiles_x
        tx = tile_of % tiles_x
        kx, kk = jax.random.split(key)
        px = (
            tx.astype(jnp.float32) * TILE_W + 64.0
            + jax.random.uniform(kx, (A,), minval=-40, maxval=40)
        )
        py = (
            ty.astype(jnp.float32) * TILE_H + 4.0
            + jax.random.uniform(kk, (A,), minval=-3, maxval=3)
        )
        inv = 1.0 / (6.0 ** 2)  # sigma ~6px
        rows = [
            px, py,
            jnp.full((A,), inv), jnp.zeros((A,)), jnp.full((A,), inv),
            jnp.full((A,), float(opac)),
            jnp.full((A,), 0.7), jnp.full((A,), 0.4), jnp.full((A,), 0.2),
            jnp.arange(A, dtype=jnp.float32),  # depth (already sorted)
            jnp.zeros((A,)),  # gid row
        ]
        A2 = ((A + (1 << 15) - 1) // (1 << 15)) * (1 << 15)
        rows = [jnp.pad(r, (0, A2 - A)) for r in rows]
        pair_data = pack_rows(tuple(rows))
        starts = (
            jnp.arange(num_tiles, dtype=jnp.int32) * (cpt * PAIR_CHUNK)
        )
        counts = jnp.full((num_tiles,), cpt * PAIR_CHUNK, jnp.int32)
        return pair_data, starts, counts

    bg = jnp.zeros(3, jnp.float32)

    for cpt in (4, 12):
        for opac, tag in ((0.05, "no-exit"), (0.9, "fast-exit")):
            pd, st, ct = make_pairs(jax.random.PRNGKey(0), cpt, opac)
            jax.block_until_ready(pd)
            float(jnp.sum(pd[0, :128]))

            @partial(jax.jit, static_argnums=())
            def run(pd, st, ct):
                color, tfinal, pid, pwp, pw, _cend = _raster_core(
                    pd, st, ct, bg, tiles_x, tiles_y, False, False
                )
                return color

            n_chunks = num_tiles * cpt
            dt = bench(
                f"kernel {cpt} chunks/tile opac={opac} ({tag}) "
                f"[{n_chunks} chunks]",
                run, pd, st, ct,
            )
            print(
                f"    -> {dt / n_chunks * 1000:.2f} us/chunk", flush=True
            )


if __name__ == "__main__":
    main()
