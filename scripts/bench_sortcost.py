"""True variadic-sort cost vs payload count (all outputs consumed).

The round-2 'sorts are flat in payloads' measurement consumed only one
output column; XLA's sort simplifier removes unused sort operands, so
every configuration silently measured a ~2-payload sort. This probe
consumes EVERY output with a position-weighted checksum so nothing is
DCE'd. Usage: python scripts/bench_sortcost.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from functools import partial

REPS = 10

@partial(jax.jit, static_argnames=("p",))
def probe(key, vals, p):
    ops = (key,) + tuple(vals[i] for i in range(p))
    out = jax.lax.sort(ops, num_keys=1, is_stable=False)
    w = jnp.arange(key.shape[0], dtype=jnp.float32) * 1e-9
    acc = jnp.sum(out[0].astype(jnp.float32) * w)
    for o in out[1:]:
        acc = acc + jnp.sum(o * w)
    return acc

def main():
    rk = jax.random.PRNGKey(0)
    for n in (1 << 20, 1 << 21, 3 << 20, 1 << 22):
        key = jax.random.randint(rk, (n,), 0, 1 << 30).astype(jnp.uint32)
        vals = jax.random.normal(jax.random.PRNGKey(1), (15, n), jnp.float32)
        for p in (1, 3, 7, 11, 15):
            float(probe(key, vals, p))
            t0 = time.perf_counter()
            for _ in range(REPS):
                x = probe(key, vals, p)
            float(x)
            dt = (time.perf_counter() - t0) / REPS * 1000
            print(f"n={n:>8} payloads={p:>2}: {dt:7.2f} ms", flush=True)

if __name__ == "__main__":
    main()
