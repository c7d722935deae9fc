"""Pallas piecewise-constant expansion: run-space -> pair-space on the MXU.

The binning stage expands per-gaussian rows (13 x P) to pair space
(13 x A) as piecewise-constant sequences. The jnp constructions pay either
a serialized per-index scatter (~47 ns x P) or two variadic sorts of
(P + A) rows; at urban scale (P ~ 800k, A ~ 4M) both are tens to hundreds
of ms — far above the memory bound. This kernel gets the expansion to
~memory speed with an exact one-hot matmul:

* The pair axis is processed in chunks of CHUNK=512 columns. Runs are
  DISJOINT intervals [offs[i], offs[i+1]) that partition [0, total), so at
  most 513 runs intersect a chunk; with the window start floor-aligned to
  128 lanes, a static window of W=768 runs always covers every
  intersecting run (the caller contract below makes this a hard bound).
* Per chunk, coverage is two broadcast comparisons:
      C[j, i]    = offs[w0+i]   <= j
      Cnext[j,i] = offs[w0+i+1] <= j
      cov = C - Cnext   (exactly the one-hot row-selector, f32 0/1)
  and the expansion is one MXU matmul vals_w (16, W) @ cov^T -> (16, 512).
  Each output column has EXACTLY ONE covering run (disjointness), so the
  matmul sum has a single nonzero term — the result is bit-exact f32.
* The window's 16 input rows (10 splat values + geo + gid + offs +
  offs_next, f32) arrive in ONE double-buffered DMA from HBM; Mosaic
  pipelines the output blocks.

Caller contract (asserted in tests, guaranteed by `build_pairs` under
`runs_tail_only`): offs ascending; every run before `n_valid` has count
>= 1; all later runs have offs = A (zero-length tail); offs values are
exact in f32 (A < 2^24). Violating the interior-zero-run bound silently
corrupts output — this path is only reachable from callers that compact
their slices (prefix-valid lanes).

The VJP is the fast segment reduction: inclusive cumsum over the pair
axis + boundary-column gathers (exactly the transpose the jnp
scatter+cumsum construction produces via autodiff).

Reference semantics being replaced: the CUDA duplicateWithKeys pass of
diff-gaussian-rasterization (SURVEY.md §2.9) — there a per-gaussian
atomic append; here a gather/scatter-free expansion.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 512  # pair columns per grid step
SUB = 128    # sub-group width: the one-hot matmul runs per 128 columns
N_SUB = CHUNK // SUB
SUBW = 256   # run window per sub-group: <=128 starters + 1 straddler + 127
             # alignment slack = 256 lanes exactly
# chunk DMA window: the last sub-group's aligned window start sits at most
# lo_0 + 3*128 + 127 past the chunk's, so 768 lanes (= 511 + SUBW rounded
# to 128) bound every sub-window. The matmuls only ever read SUBW of it —
# sub-chunking cuts the per-chunk one-hot matmul from 20 MXU tile passes
# ((16,640)@(640,512)) to 8 (4 x (16,256)@(256,128)); measured ~2x on the
# 24 ms expansion at 4.2M pairs.
W = 768
N_IN_ROWS = 16  # 13 caller rows + offs + offs_next + 1 spare


def _expand_kernel(lo_ref, total_ref, packed_hbm, out_ref, buf, sems, *,
                   emit_keys: bool, tiles_x: int, num_tiles: int):
    c = pl.program_id(0)
    n_chunks = pl.num_programs(0)

    def get_dma(slot, chunk):
        # lo is FLAT (n_chunks * N_SUB,): a 2-D SMEM scalar array gets its
        # minor dim padded to 128 lanes (4 MB at 8192 chunks > the 1 MB
        # SMEM budget)
        w0 = pl.multiple_of(
            (lo_ref[chunk * N_SUB] // 128) * 128, 128
        )
        return pltpu.make_async_copy(
            packed_hbm.at[:, pl.ds(w0, W)], buf.at[slot], sems.at[slot]
        )

    @pl.when(c == 0)
    def _():
        get_dma(0, 0).start()

    @pl.when(c + 1 < n_chunks)
    def _():
        get_dma((c + 1) % 2, c + 1).start()

    slot = c % 2
    get_dma(slot, c).wait()

    w0_lane = (lo_ref[c * N_SUB] // 128) * 128
    parts = []
    for g in range(N_SUB):
        # clamp: under the tail-only contract og <= W - SUBW always (see
        # module docstring); the clamp is pure insurance so a future
        # contract violation yields wrong pixels, not a TPU fault
        og_raw = (lo_ref[c * N_SUB + g] // 128) * 128 - w0_lane
        og = pl.multiple_of(
            jnp.clip(og_raw, 0, W - SUBW), 128
        )
        # slice the REF (Mosaic has no dynamic_slice on values)
        dg = buf[slot, :, pl.ds(og, SUBW)]  # (16, SUBW)
        gj = (
            jnp.float32(c * CHUNK + g * SUB)
            + jax.lax.broadcasted_iota(jnp.int32, (SUB, 1), 0).astype(
                jnp.float32
            )
        )
        offs_w = dg[ROW_OFFS, :][None, :]  # (1, SUBW)
        next_w = dg[ROW_NEXT, :][None, :]
        cov = (offs_w <= gj).astype(jnp.float32) - (next_w <= gj).astype(
            jnp.float32
        )  # (SUB, SUBW), one-hot rows
        parts.append(
            jax.lax.dot_general(
                dg, cov, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                # HIGHEST: the selection must be bit-exact f32 — run
                # offsets (row 13) and gids (row 12) are integers up to
                # 2^24 riding f32 lanes; Mosaic lowers this shape at
                # bf16 DEFAULT precision otherwise (caught by the
                # on-TPU check lane; interpret mode can't see it)
                precision=jax.lax.Precision.HIGHEST,
            )
        )
    res = jnp.concatenate(parts, axis=1)  # (16, CHUNK)
    if not emit_keys:
        out_ref[:, :] = res
        return
    # decode the pair's tile id + sentineled depth key IN-KERNEL (VPU
    # headroom exists — the chunk is matmul-bound; doing it outside costs
    # ~6 elementwise passes over the A axis). Rows: 10=run offsets,
    # 11=packed rect geometry, 9=depth (see build_pairs).
    gj_row = (
        jnp.float32(c * CHUNK)
        + jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1).astype(
            jnp.float32
        )
    )
    off = res[10:11, :]  # row 10: the expanded run offsets
    geo = res[11:12, :].astype(jnp.int32)
    k = gj_row - off
    x0 = (geo & 31).astype(jnp.float32)
    y0 = ((geo >> 5) & 511).astype(jnp.float32)
    wrect = jnp.maximum(geo >> 14, 1).astype(jnp.float32)
    # float division with a +0.5 guard is an exact integer floor-div here:
    # (k + 0.5)/w lies strictly inside (m, m+1) for k in [w m, w(m+1)),
    # and the 0.5/w margin (>= 0.015 at w <= 32) dwarfs f32 rounding
    tyl = jnp.floor((k + 0.5) / wrect)
    txl = k - tyl * wrect
    tile = (y0 + tyl) * jnp.float32(tiles_x) + (x0 + txl)
    real = gj_row < total_ref[0].astype(jnp.float32)
    tile_key = jnp.where(real, tile, jnp.float32(num_tiles))
    depth_key = jnp.where(real, res[9:10, :], jnp.float32(3.0e38))
    out_ref[:, :] = jnp.concatenate(
        [res[:13], tile_key, depth_key, res[15:16]], axis=0
    )


ROW_OFFS = 13  # input row carrying run starts
ROW_NEXT = 14  # input row carrying next-run starts


def _expand_fwd_impl(vals, offs, length, interpret, total=None,
                     emit_keys=False, tiles_x=0, num_tiles=0):
    R, P = vals.shape
    assert R <= ROW_OFFS, f"too many value rows for the packed layout: {R}"
    A = length
    assert A % CHUNK == 0, A
    assert A < (1 << 24), "pair index must stay exact in f32"
    n_chunks = A // CHUNK

    offs_f = offs.astype(jnp.float32)
    next_f = jnp.concatenate(
        [offs_f[1:], jnp.full((1,), float(A), jnp.float32)]
    )
    pad_rows = jnp.zeros((ROW_OFFS - R, P), jnp.float32)
    packed = jnp.concatenate(
        [
            vals,
            pad_rows,
            offs_f[None, :],
            next_f[None, :],
            jnp.zeros((N_IN_ROWS - ROW_NEXT - 1, P), jnp.float32),
        ],
        axis=0,
    )
    # window slack: DMAs read [w0, w0+W); pad the run axis with
    # beyond-every-chunk sentinels so tail windows stay in bounds
    packed = jnp.pad(packed, ((0, 0), (0, W)))
    packed = packed.at[ROW_OFFS, P:].set(float(A))
    packed = packed.at[ROW_NEXT, P:].set(float(A))

    starts = (
        jnp.arange(n_chunks * N_SUB, dtype=jnp.int32) * SUB
    )
    # first run whose interval can reach each sub-group: runs with
    # next-start <= sub start lie entirely before it
    lo = jnp.searchsorted(
        next_f, starts.astype(jnp.float32), side="right"
    ).astype(jnp.int32)
    # clamp so the aligned window [w0, w0+W) stays inside P+W columns
    lo = jnp.minimum(lo, P)  # flat (n_chunks * N_SUB,)

    total_arr = (
        jnp.zeros((1,), jnp.int32)
        if total is None
        else jnp.reshape(total, (1,)).astype(jnp.int32)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (N_IN_ROWS, CHUNK), lambda c, *_: (0, c)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, N_IN_ROWS, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _expand_kernel, emit_keys=emit_keys, tiles_x=tiles_x,
        num_tiles=num_tiles,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N_IN_ROWS, A), jnp.float32),
        interpret=interpret,
    )(lo, total_arr, packed)
    if emit_keys:
        return out[:R], out[13], out[14]
    return out[:R]


def expand_packed_with_keys(packed, offs, total, length, tiles_x,
                            num_tiles, interpret=False):
    """expand_pallas_with_keys on a PRE-PACKED (16, P + spare) input.

    packed rows: 0..9 splat values, 10 run offsets (f32), 11 packed rect
    geometry, 12 caller ids, 13 offs_f, 14 next_f, 15 zero — exactly the
    layout `pack_rows` produces from the 15 1-D rows, with the spare
    columns of rows 13/14 set to float(A) (the window sentinel). The
    column-native render path uses this to skip the (13, P) jnp.stack
    (strided sublane writes, ~0.8 ns/element). Inference only (no VJP).

    Returns (rows (13, A), tile_key (A,), depth_key (A,)).
    """
    P = offs.shape[0]
    A = length
    assert A % CHUNK == 0 and A < (1 << 24), A
    assert packed.shape[0] == N_IN_ROWS and packed.shape[1] >= P + W, (
        packed.shape, P,
    )
    n_chunks = A // CHUNK
    offs_f = offs.astype(jnp.float32)
    next_f = jnp.concatenate(
        [offs_f[1:], jnp.full((1,), float(A), jnp.float32)]
    )
    starts = jnp.arange(n_chunks * N_SUB, dtype=jnp.int32) * SUB
    lo = jnp.searchsorted(
        next_f, starts.astype(jnp.float32), side="right"
    ).astype(jnp.int32)
    lo = jnp.minimum(lo, P)
    total_arr = jnp.reshape(total, (1,)).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((N_IN_ROWS, CHUNK), lambda c, *_: (0, c)),
        scratch_shapes=[
            pltpu.VMEM((2, N_IN_ROWS, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _expand_kernel, emit_keys=True, tiles_x=tiles_x,
        num_tiles=num_tiles,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N_IN_ROWS, A), jnp.float32),
        interpret=interpret,
    )(lo, total_arr, packed)
    return out[:13], out[13], out[14]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def piecewise_expand_pallas(vals, offs, length, interpret=False):
    """(R, P) runs -> (R, length) piecewise-constant rows, MXU one-hot.

    Requires the `runs_tail_only` contract (see module docstring). The
    expanded offs row is available to callers as vals row — include offs
    among the value rows if needed downstream.
    """
    return _expand_fwd_impl(vals, offs, length, interpret)


def _pe_fwd(vals, offs, length, interpret):
    out = _expand_fwd_impl(vals, offs, length, interpret)
    return out, (offs, jnp.concatenate([offs[1:], offs[-1:] * 0 + length]))


def _pe_bwd(length, interpret, residuals, g):
    offs, nxt = residuals
    # segment reduction: d_vals[:, i] = sum_{j in [offs_i, nxt_i)} g[:, j]
    s = jnp.cumsum(g, axis=1)
    s = jnp.concatenate([jnp.zeros_like(s[:, :1]), s], axis=1)
    lo = jnp.take(s, jnp.minimum(offs, length), axis=1)
    hi = jnp.take(s, jnp.minimum(nxt, length), axis=1)
    return (hi - lo, None)


piecewise_expand_pallas.defvjp(_pe_fwd, _pe_bwd)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6)
)
def expand_pallas_with_keys(vals, offs, total, length, tiles_x, num_tiles,
                            interpret=False):
    """piecewise_expand_pallas + IN-KERNEL pair-sort key decode.

    Returns (rows (R, length), tile_key (length,) f32,
    depth_key (length,) f32): tile_key = the pair's tile id (num_tiles for
    columns >= total), depth_key = row-9 depth sentineled to 3e38 — the
    ~6 A-length elementwise decode passes run on the kernel's spare VPU
    cycles instead. vals row layout contract: row 9 = depth, row 10 = run
    offsets (= offs expanded), row 11 = packed rect geometry
    x0 + 32*(y0 + 512*w).
    """
    return _expand_fwd_impl(
        vals, offs, length, interpret, total=total, emit_keys=True,
        tiles_x=tiles_x, num_tiles=num_tiles,
    )


def _pek_fwd(vals, offs, total, length, tiles_x, num_tiles, interpret):
    out = _expand_fwd_impl(
        vals, offs, length, interpret, total=total, emit_keys=True,
        tiles_x=tiles_x, num_tiles=num_tiles,
    )
    return out, (offs, jnp.concatenate([offs[1:], offs[-1:] * 0 + length]))


def _pek_bwd(length, tiles_x, num_tiles, interpret, residuals, g):
    offs, nxt = residuals
    g_rows, _, _ = g  # key rows feed stop_gradient'd sort keys
    s = jnp.cumsum(g_rows, axis=1)
    s = jnp.concatenate([jnp.zeros_like(s[:, :1]), s], axis=1)
    lo = jnp.take(s, jnp.minimum(offs, length), axis=1)
    hi = jnp.take(s, jnp.minimum(nxt, length), axis=1)
    return (hi - lo, None, None)


expand_pallas_with_keys.defvjp(_pek_fwd, _pek_bwd)
