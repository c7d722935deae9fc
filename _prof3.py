import time
import numpy as np, jax, jax.numpy as jnp

A = 1 << 20; P = 100_000; T = 2041
rng = np.random.default_rng(0)
vals15 = jnp.asarray(rng.random((15, P), dtype=np.float32))
vals15T = jnp.asarray(rng.random((P, 16), dtype=np.float32))
offsets = jnp.asarray(np.sort(rng.integers(0, A, P)).astype(np.int32))
key_tile = jnp.asarray(rng.integers(0, T, A).astype(np.int32))
key_depth = jnp.asarray(rng.random(A, dtype=np.float32) * 50 + 0.2)
vals10A = jnp.asarray(rng.random((10, A), dtype=np.float32))
sorted_tile = jnp.sort(key_tile)

def chk(x):
    ww = jnp.arange(x.shape[-1], dtype=jnp.float32)
    return jnp.sum(x.astype(jnp.float32) * ww)

@jax.jit
def seed_col(vals15, offsets):
    deltas = jnp.concatenate([vals15[:, :1], vals15[:, 1:] - vals15[:, :-1]], axis=1)
    base = jnp.zeros((15, A), jnp.float32)
    return chk(base.at[:, offsets].add(deltas, mode="drop"))

@jax.jit
def seed_row_T(vals15T, offsets):
    base = jnp.zeros((A, 16), jnp.float32)
    seeded = base.at[offsets, :].add(vals15T, mode="drop")
    return chk(seeded.T)

@jax.jit
def seed_row_cumsum_T(vals15T, offsets):
    base = jnp.zeros((A, 16), jnp.float32)
    seeded = base.at[offsets, :].add(vals15T, mode="drop")
    out = jnp.cumsum(seeded, axis=0)
    return chk(out.T)

@jax.jit
def ss_default(sorted_tile):
    ar = jnp.arange(T + 1, dtype=jnp.int32)
    return chk(jnp.searchsorted(sorted_tile, ar, side="left").astype(jnp.int32))

@jax.jit
def ss_sortmethod(sorted_tile):
    ar = jnp.arange(T + 1, dtype=jnp.int32)
    return chk(jnp.searchsorted(sorted_tile, ar, side="left", method="sort").astype(jnp.int32))

@jax.jit
def ss_compare(sorted_tile):
    # counts per tile via one-hot compare matrix in chunks? T*A too big.
    # instead: start[t] = sum(tile < t) via bucketed reduce: 2041x1M/128...
    # cheap version: per-pair one-hot accumulate with segment trick
    ar = jnp.arange(T + 1, dtype=jnp.int32)
    lt = (sorted_tile[None, :] < ar[:, None])  # (T+1, A) bool — 2G elems, skip
    return chk(jnp.sum(lt, axis=1).astype(jnp.int32))

@jax.jit
def sort_packed(key_tile, key_depth, vals10A):
    dbits = jax.lax.bitcast_convert_type(key_depth, jnp.uint32) >> 12
    key = (key_tile.astype(jnp.uint32) << 20) | dbits
    perm = jnp.arange(A, dtype=jnp.int32)
    ops = (key, perm) + tuple(vals10A[r] for r in range(10))
    o = jax.lax.sort(ops, num_keys=1, is_stable=False)
    return sum(chk(x) for x in o)

@jax.jit
def sort_3key(key_tile, key_depth, vals10A):
    perm = jnp.arange(A, dtype=jnp.int32)
    gid = perm
    ops = (key_tile, key_depth, gid, perm) + tuple(vals10A[r] for r in range(10))
    o = jax.lax.sort(ops, num_keys=3, is_stable=False)
    return sum(chk(x) for x in o)

@jax.jit
def noop(x): return x + 1

def t(f, *a, n=20):
    float(f(*a))
    t0 = time.perf_counter()
    for _ in range(n): r = f(*a)
    float(r)
    return (time.perf_counter()-t0)/n*1000

rtt = t(noop, jnp.float32(1.0))
print("rtt/20            %.2f ms" % rtt)
print("seed col-scatter  %.2f ms" % (t(seed_col, vals15, offsets)-rtt))
print("seed row+T        %.2f ms" % (t(seed_row_T, vals15T, offsets)-rtt))
print("seed row+cum+T    %.2f ms" % (t(seed_row_cumsum_T, vals15T, offsets)-rtt))
print("searchsorted      %.2f ms" % (t(ss_default, sorted_tile)-rtt))
print("searchsorted sort %.2f ms" % (t(ss_sortmethod, sorted_tile)-rtt))
print("sort 3-key        %.2f ms" % (t(sort_3key, key_tile, key_depth, vals10A)-rtt))
print("sort packed 1-key %.2f ms" % (t(sort_packed, key_tile, key_depth, vals10A)-rtt))
