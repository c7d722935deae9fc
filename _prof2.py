import time
import numpy as np, jax, jax.numpy as jnp

A = 1 << 20; P = 100_000; T = 2041
rng = np.random.default_rng(0)
vals15 = jnp.asarray(rng.random((15, P), dtype=np.float32))
offsets = jnp.asarray(np.sort(rng.integers(0, A, P)).astype(np.int32))
key_tile = jnp.asarray(rng.integers(0, T, A).astype(np.int32))
key_depth = jnp.asarray(rng.random(A, dtype=np.float32))
key_gid = jnp.asarray(rng.integers(0, P, A).astype(np.int32))
vals10A = jnp.asarray(rng.random((10, A), dtype=np.float32))
sorted_tile = jnp.sort(key_tile)

w = None
def chk(x):
    global w
    if x.ndim == 2:
        ww = jnp.arange(x.shape[1], dtype=jnp.float32)
        return jnp.sum(x * ww)
    ww = jnp.arange(x.shape[0], dtype=jnp.float32)
    return jnp.sum(x.astype(jnp.float32) * ww)

@jax.jit
def expand(vals15, offsets):
    deltas = jnp.concatenate([vals15[:, :1], vals15[:, 1:] - vals15[:, :-1]], axis=1)
    base = jnp.zeros((15, A), jnp.float32)
    seeded = base.at[:, offsets].add(deltas, mode="drop")
    return chk(jnp.cumsum(seeded, axis=1))

@jax.jit
def seed_only(vals15, offsets):
    deltas = jnp.concatenate([vals15[:, :1], vals15[:, 1:] - vals15[:, :-1]], axis=1)
    base = jnp.zeros((15, A), jnp.float32)
    return chk(base.at[:, offsets].add(deltas, mode="drop"))

@jax.jit
def cumsum_only(vals10A):
    v = jnp.concatenate([vals10A, vals10A[:5]], axis=0)
    return chk(jnp.cumsum(v, axis=1))

@jax.jit
def sort14(key_tile, key_depth, key_gid, vals10A):
    perm = jnp.arange(A, dtype=jnp.int32)
    ops = (key_tile, key_depth, key_gid, perm) + tuple(vals10A[r] for r in range(10))
    o = jax.lax.sort(ops, num_keys=3, is_stable=False)
    return sum(chk(x) for x in o)

@jax.jit
def ssorted(sorted_tile):
    ar = jnp.arange(T + 1, dtype=jnp.int32)
    return chk(jnp.searchsorted(sorted_tile, ar, side="left").astype(jnp.int32))

@jax.jit
def noop(x): return x + 1

def t(f, *a, n=20):
    float(f(*a))
    t0 = time.perf_counter()
    for _ in range(n): r = f(*a)
    float(r)
    return (time.perf_counter()-t0)/n*1000

rtt = t(noop, jnp.float32(1.0))
print("rtt/20        %.2f ms" % rtt)
print("expand15      %.2f ms" % (t(expand, vals15, offsets)-rtt))
print("  seed only   %.2f ms" % (t(seed_only, vals15, offsets)-rtt))
print("  cumsum15    %.2f ms" % (t(cumsum_only, vals10A)-rtt))
print("sort 3k+11p   %.2f ms" % (t(sort14, key_tile, key_depth, key_gid, vals10A)-rtt))
print("searchsorted  %.2f ms" % (t(ssorted, sorted_tile)-rtt))
