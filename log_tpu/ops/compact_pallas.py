"""Single-pass stream compaction over the capacity axis (Pallas TPU).

The render frame's slice compaction was a variadic payload SORT over the
whole capacity axis (~2.6 ms/payload at 3.4M rows — the largest stage of
the per-frame headline) or, for small cuts, an index sort plus serialized
row gathers. Stream compaction is the bandwidth-shaped answer: ONE
sequential pass over the capacity rows that writes kept rows densely —
cost ~= 2x the array bytes instead of sort_passes x payloads x bytes.

TPU mechanics (no data-dependent DMA sizes exist on this hardware):

  * per 1024-row sub-chunk, the kept rows' target slots are an EXCLUSIVE
    prefix sum (strict-triangular f32 matmul — exact for integer counts);
  * a one-hot (1024, 1024+128) matmul moves every kept row to its slot in
    one MXU pass — exact, because each output column sums exactly one
    nonzero f32 product (HIGHEST precision);
  * kept rows accumulate into a step-local VMEM window at a 128-ALIGNED
    cursor (dynamic `pl.ds` stores with a multiple_of proof), so every
    HBM DMA is fixed-size and aligned. A <128-row CARRY rolls between
    grid steps (VMEM scratch + SMEM scalars persist across the
    sequential grid); the final grid step flushes it.
  * v1 issued one write DMA per 1024-row chunk and lost 2x to per-chunk
    DMA/grid overhead (50 vs 24 ms at 4.2M rows); v2 batches SUB=8
    sub-chunks per grid step and issues ONE step DMA.

Mixed dtypes ride as exact f32 lanes: u32 columns split into hi/lo
16-bit halves (integers <= 65535 are exact f32), the position key rides
as pos+1 (cap < 2^24 asserted), zero = invalid.

Same output contract as train_step._compact_flat_cols_sort.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 8
CHUNK = 1024
STEP = SUB * CHUNK
CARRY = 128
WIN = CHUNK + CARRY


def _compact_kernel(keep_ref, vals_ref, out_init_hbm, out_hbm, acc, carry,
                    sem, state, *, n_c: int, n_steps: int):
    # out_init_hbm is the zero-filled input aliased to out_hbm (rows past
    # the final write cursor must read as invalid / key 0)
    del out_init_hbm
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        state[0] = 0  # carry_len (< CARRY)
        state[1] = 0  # global out cursor (128-aligned)
        carry[...] = jnp.zeros((n_c, CARRY), jnp.float32)

    # step-local window: zero, then seed with the rolling carry
    acc[...] = jnp.zeros((n_c, STEP + WIN), jnp.float32)
    acc[:, :CARRY] = carry[...]

    row = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    tri = (row < col).astype(jnp.float32)    # tri[j, i] = j < i
    lane = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, WIN), 1)

    def sub_body(s, lc):
        # lc = logical count of rows placed so far this step (incl. carry)
        la = pl.multiple_of((lc // CARRY) * CARRY, CARRY)
        kp = keep_ref[0, pl.ds(s * CHUNK, CHUNK)]
        vals = vals_ref[:, pl.ds(s * CHUNK, CHUNK)]
        pos = jax.lax.dot_general(
            kp[None, :], tri, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )[0]
        tgt = (lc - la) + pos.astype(jnp.int32)
        onehot = jnp.where(
            (lane == tgt[:, None]) & (kp[:, None] > 0), 1.0, 0.0
        )
        contrib = jax.lax.dot_general(
            vals, onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                    # (n_c, WIN) exact
        cur = acc[:, pl.ds(la, WIN)]
        acc[:, pl.ds(la, WIN)] = cur + contrib
        return lc + jnp.sum(kp).astype(jnp.int32)

    lc_final = jax.lax.fori_loop(0, SUB, sub_body, state[0])
    la_final = pl.multiple_of((lc_final // CARRY) * CARRY, CARRY)

    out_off = state[1]
    wr = pltpu.make_async_copy(
        acc.at[:, :STEP],
        out_hbm.at[:, pl.ds(pl.multiple_of(out_off, CARRY), STEP)],
        sem,
    )
    wr.start()
    wr.wait()
    carry[...] = acc[:, pl.ds(la_final, CARRY)]
    state[0] = lc_final - la_final
    state[1] = out_off + la_final

    @pl.when(i == n_steps - 1)
    def _():
        fl = pltpu.make_async_copy(
            carry,
            out_hbm.at[:, pl.ds(pl.multiple_of(state[1], CARRY), CARRY)],
            sem,
        )
        fl.start()
        fl.wait()


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def stream_compact_cols(cols: dict, keep: jax.Array, k: int,
                        interpret: bool = False):
    """Compact 1-D columns (f32/u32/i32 mixed) by `keep`, returning the
    first k kept rows in original order — the contract of
    train_step._compact_flat_cols_sort (invalid lanes zero-filled,
    index == cap sentinel)."""
    cap = keep.shape[0]
    assert cap % STEP == 0, cap
    assert cap < (1 << 24), "position key rides as exact f32"
    names = list(cols)
    lanes = []        # (kind, name) per f32 lane; kind: f32 | hi | lo | i32
    rows = []
    pos1 = (jnp.arange(cap, dtype=jnp.float32) + 1.0)
    rows.append(pos1)
    lanes.append(("key", None))
    for n in names:
        v = cols[n]
        if v.dtype == jnp.uint32:
            u = v
            rows.append((u >> 16).astype(jnp.float32))
            lanes.append(("hi", n))
            rows.append((u & jnp.uint32(0xFFFF)).astype(jnp.float32))
            lanes.append(("lo", n))
        elif v.dtype in (jnp.int32, jnp.uint16):
            rows.append(v.astype(jnp.float32))
            lanes.append(("i32", n))
        else:
            rows.append(v.astype(jnp.float32))
            lanes.append(("f32", n))
    # pad the lane count to a sublane multiple (Mosaic requires first-dim
    # slices 8-aligned for the HBM DMAs)
    while len(rows) % 8:
        rows.append(jnp.zeros((cap,), jnp.float32))
        lanes.append(("pad", None))
    vals = jnp.stack(rows, axis=0)           # (n_c, cap)
    n_c = vals.shape[0]
    n_steps = cap // STEP
    out_w = cap + STEP + CARRY
    out_init = jnp.zeros((n_c, out_w), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, STEP), lambda i: (0, i)),
            pl.BlockSpec((n_c, STEP), lambda i: (0, i)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((n_c, STEP + WIN), jnp.float32),
            pltpu.VMEM((n_c, CARRY), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SMEM((2,), jnp.int32),
        ],
    )
    kernel = functools.partial(
        _compact_kernel, n_c=n_c, n_steps=n_steps
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_c, out_w), jnp.float32),
        interpret=interpret,
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        keep.astype(jnp.float32).reshape(1, cap),
        vals,
        out_init,
    )

    key_f = out[0, :k]
    lane_valid = key_f > 0
    index = jnp.where(
        lane_valid, key_f.astype(jnp.int32) - 1, jnp.int32(cap)
    )
    slices = {}
    r = 1
    for n in names:
        v = cols[n]
        if v.dtype == jnp.uint32:
            hi = out[r, :k].astype(jnp.uint32)
            lo = out[r + 1, :k].astype(jnp.uint32)
            r += 2
            slices[n] = (hi << 16) | lo
        elif v.dtype in (jnp.int32, jnp.uint16):
            slices[n] = out[r, :k].astype(v.dtype)
            r += 1
        else:
            slices[n] = out[r, :k].astype(v.dtype)
            r += 1
    return slices, index, lane_valid
