"""Probe: cost of BLOCK gathers (axis-0 takes of (B, S) arrays) on the TPU.

The cut-bound render architecture gathers eligible 4k-row blocks to the
front before projection/compaction, so every per-frame stage scales with
the visible working set instead of capacity. That only works if a block
take costs ~DMA bandwidth (per-index cost amortized over S*d elements),
unlike general row gathers (~9 ms per 1M indices, ARCHITECTURE.md).

Timing protocol: loop the jitted fn, ONE position-weighted checksum fetch
at the end (ARCHITECTURE.md — block_until_ready is a no-op through the
tunnel; permutation-invariant reductions get sort/gather DCE'd).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

CAP = 1 << 22  # 4.2M rows
S = 4096       # block size
B = CAP // S   # 1024 blocks


def main():
    key = jax.random.PRNGKey(0)
    ncols = 14

    cols = [
        jax.random.normal(jax.random.PRNGKey(i), (B, S), jnp.float32)
        for i in range(ncols)
    ]

    def run(kb):
        idx_np = np.random.default_rng(0).permutation(B)[:kb].astype(np.int32)
        idx = jnp.asarray(np.sort(idx_np))

        @jax.jit
        def take_all(idx, *cs):
            w = jnp.arange(kb * S, dtype=jnp.float32)
            acc = jnp.float32(0)
            for c in cs:
                g = jnp.take(c, idx, axis=0).reshape(-1)
                acc = acc + jnp.sum(g * w)
            return acc

        float(take_all(idx, *cols))  # compile + warm
        n = 20
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for _ in range(n):
            acc = acc + take_all(idx, *cols)
        float(acc)
        dt = (time.perf_counter() - t0) / n * 1000
        mb = kb * S * ncols * 4 / 1e6
        print(
            f"block-take x{ncols} cols: K_b={kb:5d} ({kb*S/1e6:.2f}M rows, "
            f"{mb:.0f} MB) -> {dt:.2f} ms  ({mb/dt:.1f} GB/s)",
            flush=True,
        )

    # also a plain dense slice baseline (pure bandwidth reference)
    @jax.jit
    def dense(*cs):
        w = jnp.arange(CAP, dtype=jnp.float32)
        return sum(jnp.sum(c.reshape(-1) * w) for c in cs)

    float(dense(*cols))
    n = 20
    t0 = time.perf_counter()
    acc = jnp.float32(0)
    for _ in range(n):
        acc = acc + dense(*cols)
    float(acc)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"dense read x{ncols} cols: {CAP/1e6:.1f}M rows -> {dt:.2f} ms "
          f"({CAP*ncols*4/1e6/dt:.1f} GB/s)", flush=True)

    for kb in (64, 128, 256, 512, 896):
        run(kb)


if __name__ == "__main__":
    main()
