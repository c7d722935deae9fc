"""Measure TPU primitive costs for the w_full expansion redesign:
gather / sorted-gather / scatter-at-static-starts / cummax / repeat.

Usage: python scripts/probe_prims.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CAP = 3_407_872
R = 786_432
REPS = int(os.environ.get("REPS", "20"))


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    rid_np = rng.integers(0, R, CAP).astype(np.int32)
    rid = jnp.asarray(rid_np)
    rid_sorted = jnp.asarray(np.sort(rid_np))
    # root-major layout: seg starts = first row of each root (here uniform)
    counts = np.bincount(rid_np, minlength=R)
    starts_np = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    starts = jnp.asarray(starts_np)
    wt = [jnp.asarray((rng.random(R) > 0.5)) for _ in range(4)]
    runs_idx = jnp.asarray(rng.integers(0, R, 1_080_000).astype(np.int32))

    def timeit(name, fn, args_list):
        out = fn(args_list[0])
        o = out.astype(jnp.float32).ravel()
        float(jnp.sum(o * (1.0 + jnp.arange(o.size, dtype=jnp.float32) * 1e-7)))
        t0 = time.perf_counter()
        for i in range(REPS):
            out = fn(args_list[i % len(args_list)])
        o = out.astype(jnp.float32).ravel()
        float(jnp.sum(o * (1.0 + jnp.arange(o.size, dtype=jnp.float32) * 1e-7)))
        dt = (time.perf_counter() - t0) / REPS * 1000
        print(f"{name}: {dt:.2f} ms", flush=True)

    @jax.jit
    def g_base(w):
        return jnp.take(w, rid)

    @jax.jit
    def g_sorted(w):
        return w.at[rid_sorted].get(mode="promise_in_bounds",
                                    indices_are_sorted=True)

    @jax.jit
    def scat(w):
        b = jnp.zeros(CAP, jnp.int32)
        pos = starts.astype(jnp.int32)
        vals = pos * 2 + w.astype(jnp.int32) + 1
        return b.at[starts].set(vals, mode="promise_in_bounds",
                                unique_indices=True, indices_are_sorted=True)

    @jax.jit
    def scat_cummax(w):
        b = jnp.zeros(CAP, jnp.int32)
        pos = starts.astype(jnp.int32)
        vals = pos * 2 + w.astype(jnp.int32) + 1
        b = b.at[starts].set(vals, mode="promise_in_bounds",
                             unique_indices=True, indices_are_sorted=True)
        m = jax.lax.cummax(b)
        return (m & 1).astype(jnp.bool_)

    @jax.jit
    def cummax_only(w):
        b = jnp.zeros(CAP, jnp.int32).at[0].set(w[0].astype(jnp.int32))
        return jax.lax.cummax(b)

    @jax.jit
    def g_runs(w):
        return jnp.take(w, runs_idx)

    @jax.jit
    def rep(w):
        seg = jnp.diff(jnp.append(starts, CAP))
        return jnp.repeat(w, seg, total_repeat_length=CAP)

    timeit("take 3.4M random (baseline)", g_base, wt)
    timeit("take 3.4M sorted-indices", g_sorted, wt)
    timeit("take 1.08M (run roots)", g_runs, wt)
    timeit("scatter-set 786k -> 3.4M (static sorted idx)", scat, wt)
    timeit("scatter + cummax broadcast (full expansion)", scat_cummax, wt)
    timeit("cummax 3.4M only", cummax_only, wt)
    timeit("jnp.repeat segment broadcast", rep, wt)


if __name__ == "__main__":
    main()
