"""Map the TPU sort cost landscape for the binning expansion.

All test data is generated ON DEVICE (jax.random) — the axon tunnel's
host->device upload can degrade to ~100 KB/s, so uploads are banned from
measurement scripts.

Sweeps:
  1. lax.sort of L rows (uint32 key + k f32 payloads) — find where XLA's
     variadic TPU sort falls off its fast path;
  2. compaction-by-sort (27 payloads) vs nonzero+row-gather;
  3. scatter-based piecewise expansion (13 rows) at several run counts P;
  4. the sort-based expansion, whole and payload-split.

Usage: python scripts/bench_sortexp.py [phase ...]
Phases: sort compact scatter split
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PHASES = sys.argv[1:] or ["sort", "compact", "scatter", "split"]
A = 1 << 22
REPS = 10


def main():
    import jax
    import jax.numpy as jnp

    def bench(name, fn, *args):
        r = fn(*args)  # compile
        out = r[-1] if isinstance(r, tuple) else r
        float(jnp.sum(out * 1.000001))  # sync
        t0 = time.perf_counter()
        for _ in range(REPS):
            r = fn(*args)
        out = r[-1] if isinstance(r, tuple) else r
        float(jnp.sum(out * 1.000001))
        dt = (time.perf_counter() - t0) / REPS * 1000
        print(f"{name}: {dt:.2f} ms", flush=True)
        return dt

    key0 = jax.random.PRNGKey(0)

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def gen(key, L):
        kk, kp = jax.random.split(key)
        keys = jax.random.randint(kk, (L,), 0, 1 << 23).astype(jnp.uint32)
        pays = jax.random.uniform(kp, (27, L), jnp.float32)
        return keys, pays

    if "sort" in PHASES:
        for L in (A, A + (1 << 20)):
            keys, pays = gen(key0, L)
            float(jnp.sum(pays[0]))
            for k in (1, 4, 8, 11, 13, 15, 19, 23, 27):
                def srt(keys, pays, k=k):
                    ops = (keys,) + tuple(pays[r] for r in range(k))
                    return jax.lax.sort(ops, num_keys=1, is_stable=False)[1]
                bench(f"sort L={L} payloads={k}", jax.jit(srt), keys, pays)

    if "compact" in PHASES:
        cap = A
        keys, pays = gen(key0, cap)
        keep = keys < jnp.uint32(int((1 << 23) * 0.15))
        float(jnp.sum(pays[0]))
        K = 1 << 20

        def compact_sort(keep, pays):
            pos = jnp.arange(cap, dtype=jnp.uint32)
            skey = jnp.where(keep, pos, jnp.uint32(cap) + pos)
            ops = (skey,) + tuple(pays[r] for r in range(27))
            out = jax.lax.sort(ops, num_keys=1, is_stable=False)
            return jnp.stack(out[1:], axis=0)[:, :K]

        bench(f"compact-by-sort 27rows cap={cap}", jax.jit(compact_sort),
              keep, pays)

        def compact_gather(keep, pays):
            idx = jnp.nonzero(keep, size=K, fill_value=cap)[0]
            return pays.T.at[idx].get(mode="fill", fill_value=0.0)

        bench(f"nonzero+rowgather 27col cap={cap}", jax.jit(compact_gather),
              keep, pays)

    if "scatter" in PHASES or "split" in PHASES:
        from functools import partial as _pt

        @_pt(jax.jit, static_argnums=1)
        def gen_runs(key, P):
            kc, kv = jax.random.split(key)
            counts = jax.random.randint(kc, (P,), 0, 9)
            offs = jnp.minimum(jnp.cumsum(counts) - counts, A).astype(
                jnp.int32
            )
            vals = jax.random.uniform(kv, (13, P), jnp.float32)
            return offs, vals

    if "scatter" in PHASES:
        for P in (1 << 18, 1 << 19, 786432, 1 << 20):
            offs, vals = gen_runs(key0, P)
            float(jnp.sum(vals[0]))

            def scat(vals, offs):
                deltas = jnp.concatenate(
                    [vals[:, :1], vals[:, 1:] - vals[:, :-1]], axis=1
                )
                base = jnp.zeros((13, A), jnp.float32)
                seeded = base.at[:, offs].add(deltas, mode="drop")
                return jnp.cumsum(seeded, axis=1)

            bench(f"scatter-expand 13rows P={P} A={A}", jax.jit(scat),
                  vals, offs)

    if "split" in PHASES:
        from log_tpu.ops.rasterize_tiled import _piecewise_expand_sort

        P = 786432
        offs, vals = gen_runs(key0, P)
        float(jnp.sum(vals[0]))
        bench(
            f"sort-expand 13rows P={P} A={A}",
            jax.jit(lambda v, o: _piecewise_expand_sort(v, o, A)), vals, offs,
        )
        for split in (2, 3):
            def two(vals, offs, split=split):
                outs = []
                for s in range(split):
                    outs.append(_piecewise_expand_sort(vals[s::split], offs, A))
                return jnp.concatenate(outs, axis=0)
            bench(
                f"sort-expand 13rows split={split} P={P} A={A}",
                jax.jit(two), vals, offs,
            )


if __name__ == "__main__":
    main()
