"""Row-gather cost for two-stage compaction (key-sort then gather).

Candidate replacement for the 16-payload compaction sort: sort the key
alone (7 ms at 4.2M), then gather the attribute columns at the k
surviving (monotone) indices. Measures XLA gather layouts on v5e:

  g1: 8 separate 1-D takes (one per u32 column)
  g2: one (cap, 8) u32 row gather (take axis 0)
  g3: one (cap, 16) f32 row gather
  g4: one (cap, 128) f32 row gather (full lane rows)

All outputs consumed with position-weighted checksums (XLA deletes
unused gather results and simplifies reductions otherwise).
Timing protocol per ARCHITECTURE.md: loop n, single scalar fetch.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from functools import partial

REPS = 10
CAP = 1 << 22


def checksum(x):
    w = jnp.arange(x.shape[0], dtype=jnp.float32) * 1e-9
    return jnp.sum(x.astype(jnp.float32).reshape(x.shape[0], -1).sum(-1) * w)


@jax.jit
def g1(cols, idx):
    acc = jnp.float32(0)
    for c in range(cols.shape[0]):
        acc = acc + checksum(jnp.take(cols[c], idx))
    return acc


@jax.jit
def g2(mat, idx):
    return checksum(jnp.take(mat, idx, axis=0))


def timeit(fn, *args):
    float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(REPS):
        x = fn(*args)
    float(x)
    return (time.perf_counter() - t0) / REPS * 1000


def main():
    rk = jax.random.PRNGKey(0)
    cols8 = jax.random.randint(rk, (8, CAP), 0, 1 << 30).astype(jnp.uint32)
    mat8 = cols8.T.copy()
    mat16 = jax.random.normal(rk, (CAP, 16), jnp.float32)
    mat128 = jax.random.normal(rk, (CAP, 128), jnp.float32)
    for k in (1 << 19, 1 << 21):
        # monotone subset, like a compaction permutation
        idx = jnp.sort(
            jax.random.choice(rk, CAP, (k,), replace=False)
        ).astype(jnp.int32)
        idx = jax.device_put(idx)
        print(f"k={k}", flush=True)
        print(f"  g1 8x1D u32 takes : {timeit(g1, cols8, idx):7.2f} ms", flush=True)
        print(f"  g2 (cap,8)u32 rows: {timeit(g2, mat8, idx):7.2f} ms", flush=True)
        print(f"  g3 (cap,16)f32    : {timeit(g2, mat16, idx):7.2f} ms", flush=True)
        print(f"  g4 (cap,128)f32   : {timeit(g2, mat128, idx):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
