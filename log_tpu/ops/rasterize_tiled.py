"""Tiled Pallas rasterizer — the production render path.

Replaces the CUDA diff-gaussian-rasterization fork (SURVEY.md §2.9) with a
TPU-native pipeline built around the measured TPU cost model (see
ARCHITECTURE.md): dense passes / sorts / cumsums are fast, general gathers and
scatters are serialized and catastrophically slow. Consequently the binning
stage contains NO general gather or scatter on the pair axis:

  1. **Projection** (jnp, fused elementwise): shared `project_gaussians`.
  2. **Pair expansion, gather-free**: per-gaussian tile rectangles give pair
     counts; every per-gaussian quantity is expanded to pair space as a
     *piecewise-constant* sequence — one scatter-add of telescoping deltas at
     the 100k run boundaries + one cumsum over the pair axis (both fast) —
     instead of a 1M-element gather (~9 ms each on TPU).
  3. **One sort** by (tile, depth, gid) carrying the 10 splat-value rows and
     the permutation as payloads (TPU sort is ~100x faster than TPU gather,
     so permutations are always applied by sorting, never by gathering —
     including in the backward, where cotangents are "unsorted" by a second
     sort keyed on the saved permutation).
  4. **Per-tile compositing** (Pallas): sequential grid over (8,128)-pixel
     tiles (one f32 VPU register tile); each tile streams its pair run with
     double-buffered chunk DMAs from *floor-aligned* offsets (Mosaic requires
     128-lane alignment) and masks head/tail lanes; the front-to-back
     recurrence uses a triangular-matmul cumprod on the MXU; color
     accumulates as a (pix x chunk)@(chunk x 3) matmul; inference
     early-exits when every pixel saturates. Side outputs (argmax contributor
     pair, per-pixel max blend weight, per-pair max weight) feed
     densification statistics (LoG/model/counter.py:36-68); chunks shared
     with a neighboring tile are merged read-modify-write (the grid is
     sequential, so RMW is race-free).
  5. **Backward** (Pallas, custom VJP at the pair boundary): back-to-front
     recompute per tile (suffix products/sums as triangular matmuls) emitting
     per-pair gradients; the cotangent then flows through the *piecewise
     construction*, whose autodiff transpose is exactly the fast segment
     reduction (reverse cumsum + 100k-gather at run boundaries).
"""
from __future__ import annotations

import functools
import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .projection import ALPHA_MAX, ALPHA_MIN, T_EPS, project_gaussians

# Tile geometry: (TILE_H, 128) pixels. 8 rows = one f32 VPU register tile
# (the minimum legal Mosaic output block); TALLER tiles cut the pair count
# (pairs ~ (2r + TILE_H)/TILE_H per column span) at the cost of more pixel
# lanes per compositing step — profitable when binning (sort-bound)
# dominates the kernel (compute-bound). LOG_TPU_TILE_H overrides.
TILE_H = int(os.environ.get("LOG_TPU_TILE_H", "8"))
TILE_W = 128
TILE_PIX = TILE_H * TILE_W  # 1024 pixel lanes per tile
# PAIR_CHUNK equals the 128-lane HBM tiling; chunk DMAs start at
# floor-aligned offsets and mask out-of-run lanes.
PAIR_CHUNK = 128
# pair record rows in the packed (N_ROWS, A) array; 16 rows = 2 sublane tiles
ROW_PX, ROW_PY, ROW_CXX, ROW_CXY, ROW_CYY, ROW_OPAC = 0, 1, 2, 3, 4, 5
ROW_R, ROW_G, ROW_B, ROW_DEPTH = 6, 7, 8, 9
# row 10 carries the caller gaussian id (exact in f32: ids < 2^24) so the
# forward kernel can emit the argmax CONTRIBUTOR id per pixel directly —
# avoiding a serialized H*W pair->gid gather in the stats epilogue
ROW_GID = 10
N_ROWS = 16
N_VAL_ROWS = 10
# packed INFERENCE pair record: 8 rows = 1 sublane tile per chunk DMA.
# Sort cost on TPU scales ~3.2 ms per payload at 4.2M rows (the round-2
# "flat in payloads" measurement was DCE-corrupted — see
# scripts/bench_sortcost.py), so the inference path packs the 10 value
# rows into 6: px/py stay f32 (center precision is visually load-bearing);
# conic/opacity/rgb round to bf16 and ride u32 lanes in pairs (<=0.4%
# relative — below one 8-bit LSB at the image). gid/perm payloads and the
# per-pair weight outputs exist only for training stats and are dropped.
P_ROW_PX, P_ROW_PY = 0, 1
P_ROW_CXX_CXY, P_ROW_CYY_OPAC, P_ROW_R_G, P_ROW_B = 2, 3, 4, 5
P_N_ROWS = 8


def _pack2_bf16(hi, lo):
    """Round two f32 rows to bf16 and pack them into one u32 row."""
    hb = jax.lax.bitcast_convert_type(
        hi.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    lb = jax.lax.bitcast_convert_type(
        lo.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    return (hb << 16) | lb


def _unpack2_bf16(u32row):
    """Kernel-side inverse of _pack2_bf16 on a u32 vector: two f32 vectors.

    A bf16 pattern placed in the top 16 bits of an f32 word IS that bf16's
    exact f32 value; the low half shifts up 16 first. Pure VPU bit ops.
    """
    hi = jax.lax.bitcast_convert_type(
        u32row & jnp.uint32(0xFFFF0000), jnp.float32
    )
    lo = jax.lax.bitcast_convert_type(u32row << 16, jnp.float32)
    return hi, lo
# exclusive-cumprod implementation in the forward kernel:
#   'matmul'   — exp(strict-tri @ log(x)) on the MXU
#   'doubling' — log-steps of sublane roll+multiply on the VPU (skips the
#                log+exp transcendental passes: ~390k transcendentals per
#                chunk are about half the kernel's per-chunk cost)
CUMPROD_IMPL = os.environ.get("LOG_TPU_CUMPROD", "matmul")

# ---------------------------------------------------------------------------
# Polynomial base-2 transcendentals (LOG_TPU_FASTEXP=1, experiment knob,
# DEFAULT OFF). Hypothesis was that the compositing kernels were bound by
# the 3 full (CHUNK, TILE_PIX) exp/log passes per chunk and single-pass ALU
# sequences (floor/bitcast exponent assembly + minimax polynomial) would be
# cheaper. MEASURED FALSE on v5e (scripts/probe_kernel2.py, 1.5M pairs,
# 2026-08-19): packed forward kernel 28.3 ms with hardware exp/log vs
# 33.4 ms with the polynomial path — the TPU's native transcendental
# pipeline beats a ~10-op ALU replacement. Kept behind the flag because the
# accuracy work transfers (exp2 deg-4: 7.3e-6 max relative on f in [0,1);
# log2 deg-5: 3.2e-5 max absolute on m in [1,2) — both below the ~0.4% bf16
# conic rounding) and the CPU interpret path exercises it in tests.
# ---------------------------------------------------------------------------
_LOG2E = 1.4426950408889634
_EXP2_C = (1.367653109e-02, 5.166687743e-02, 2.417102625e-01,
           6.929312892e-01, 1.000007283e+00)
_LOG2_C = (4.342890782e-02, -4.048671744e-01, 1.593901363e+00,
           -3.492494280e+00, 5.046876045e+00, -2.786812954e+00)


def _use_fastexp() -> bool:
    return os.environ.get("LOG_TPU_FASTEXP", "0") not in ("0", "false", "")


def _fexp2(x):
    """2**x for x <= ~2 via exponent-bit assembly + deg-4 minimax poly.

    Clamps to [-126, 2]: inputs below -126 (sanitized lanes, dead
    transmittance) are clamped to ~1e-38 (2^-126 * p(f), a small normal),
    which downstream ALPHA_MIN / T_EPS masks treat as 0.
    """
    x = jnp.clip(x, -126.0, 2.0)
    xi = jnp.floor(x)
    f = x - xi
    p = jnp.float32(_EXP2_C[0])
    for c in _EXP2_C[1:]:
        p = p * f + jnp.float32(c)
    scale = jax.lax.bitcast_convert_type(
        (xi.astype(jnp.int32) + 127) << 23, jnp.float32
    )
    return p * scale


def _flog2(x):
    """log2(x) for POSITIVE NORMAL x via exponent extraction + deg-5 poly
    on the mantissa in [1, 2). Callers guarantee x in [1 - ALPHA_MAX, 1]."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    e = ((bits >> 23) & jnp.uint32(0xFF)).astype(jnp.int32) - 127
    m = jax.lax.bitcast_convert_type(
        (bits & jnp.uint32(0x007FFFFF)) | jnp.uint32(0x3F800000), jnp.float32
    )
    p = jnp.float32(_LOG2_C[0])
    for c in _LOG2_C[1:]:
        p = p * m + jnp.float32(c)
    return e.astype(jnp.float32) + p
# packed-kernel splat evaluation: MXU quadratic form (default) vs plain
# VPU elementwise (LOG_TPU_QUADFORM=0 — fallback knob for Mosaic issues).
# Read at TRACE time so a failed compile can be retried with the flag off
# in the same process (bench.py does this defensively).


def _use_quadform() -> bool:
    return os.environ.get("LOG_TPU_QUADFORM", "1") not in ("0", "false", "")


def _is_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _interpret_default() -> bool:
    return not _is_tpu()


# --------------------------------------------------------------------------
# permutation-by-sort with a sort-based VJP
# --------------------------------------------------------------------------
def _pack_shift(num_tiles: int) -> int:
    """Lane shift for packing tile ids into the top bits of a uint32 key."""
    return 32 - max(int(num_tiles + 1).bit_length(), 1)


def _use_packed_keys() -> bool:
    # single packed uint32 key sorts ~20% faster than (tile, depth, gid) on
    # TPU; depth keeps 32 - tile_bits of its (positive-float monotone) bit
    # pattern, ~12-bit relative precision at 1080p — below visual relevance.
    # CPU keeps the exact 3-key order so oracle comparisons stay bitwise.
    # LOG_TPU_PACK_SORT_KEYS={0,1} overrides (tests force the packed path).
    import os

    env = os.environ.get("LOG_TPU_PACK_SORT_KEYS")
    if env is not None:
        return env not in ("0", "false", "")
    return _is_tpu()


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def sort_pairs(key_tile, key_depth, key_gid, values, num_tiles):
    """Sort pair records by (tile, depth[, gid]).

    values: TUPLE of (A,) payload rows — rows stay 1-D through the whole
    binning stage because jnp.stack-ing sort outputs into an (R, A) array
    costs ~50 ms at R=13, A=5M on TPU (strided sublane writes into the
    tiled 2-D layout); the packed (16, A) kernel input is produced by the
    Pallas pack kernel instead (`pack_rows`).

    Returns (tile_sorted, gid_sorted, values_sorted_tuple, perm). The VJP
    applies the inverse permutation to the values-cotangents with ANOTHER
    sort (TPU sort >> TPU gather/scatter). tile_sorted is the raw tile id.
    """
    out = _sort_pairs_fwd(key_tile, key_depth, key_gid, values, num_tiles)
    return out[0]


def _sort_pairs_fwd(key_tile, key_depth, key_gid, values, num_tiles):
    A = key_tile.shape[0]
    perm = jnp.arange(A, dtype=jnp.int32)
    if _use_packed_keys():
        shift = _pack_shift(num_tiles)
        dbits = jax.lax.bitcast_convert_type(key_depth, jnp.uint32)
        key = (key_tile.astype(jnp.uint32) << shift) | (dbits >> (32 - shift))
        ops = (key, key_gid, perm) + tuple(values)
        sorted_ops = jax.lax.sort(ops, num_keys=1, is_stable=False)
        tile_s = (sorted_ops[0] >> shift).astype(jnp.int32)
        gid_s = sorted_ops[1]
        perm_s = sorted_ops[2]
        values_s = tuple(sorted_ops[3:])
    else:
        ops = (key_tile, key_depth, key_gid, perm) + tuple(values)
        sorted_ops = jax.lax.sort(ops, num_keys=3, is_stable=False)
        tile_s = sorted_ops[0]
        gid_s = sorted_ops[2]
        perm_s = sorted_ops[3]
        values_s = tuple(sorted_ops[4:])
    return (tile_s, gid_s, values_s, perm_s), (perm_s,)


def _sort_pairs_bwd(num_tiles, residuals, cts):
    (perm_s,) = residuals
    _, _, d_values_s, _ = cts
    ops = (perm_s,) + tuple(d_values_s)
    unsorted = jax.lax.sort(ops, num_keys=1, is_stable=False)
    return (None, None, None, tuple(unsorted[1:]))


sort_pairs.defvjp(_sort_pairs_fwd, _sort_pairs_bwd)


# --------------------------------------------------------------------------
# Pallas pack: n 1-D rows -> one (16, A + spare) array for the kernel DMAs
# --------------------------------------------------------------------------
PACK_CHUNK = 1 << 15  # every max_pairs bucket is a multiple of 2^15


def _pack_kernel(*refs, n_in: int, n_out: int = N_ROWS):
    # refs: n_in HBM inputs (1, A), out block (16, C), n_in VMEM row
    # buffers (1, C) (DMA into a sublane slice of one tiled buffer is
    # illegal — "slice along dim 0 must be 8-aligned" — so each row gets
    # its own (1, C) buffer), DMA semaphores (n_in,)
    out_ref = refs[n_in]
    bufs = refs[n_in + 1 : n_in + 1 + n_in]
    sems = refs[n_in + 1 + n_in]
    c = pl.program_id(0)
    n_real = pl.num_programs(0) - 1  # the final block is the zero spare

    @pl.when(c < n_real)
    def _():
        off = pl.multiple_of(c * PACK_CHUNK, PACK_CHUNK)
        for r in range(n_in):
            pltpu.make_async_copy(
                refs[r].at[:, pl.ds(off, PACK_CHUNK)], bufs[r], sems.at[r]
            ).start()
        for r in range(n_in):
            pltpu.make_async_copy(
                refs[r].at[:, pl.ds(off, PACK_CHUNK)], bufs[r], sems.at[r]
            ).wait()
        out_ref[:, :] = jnp.concatenate(
            [bufs[r][:, :] for r in range(n_in)]
            + (
                [jnp.zeros((n_out - n_in, PACK_CHUNK), jnp.float32)]
                if n_out > n_in
                else []
            ),
            axis=0,
        )

    @pl.when(c == n_real)
    def _():
        out_ref[:, :] = jnp.zeros((n_out, PACK_CHUNK), jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def pack_rows(rows, interpret=False):
    """Pack n 1-D f32 rows (A,) into (N_ROWS, A + PACK_CHUNK), rows n..15
    and the spare zero-filled. A must be a multiple of PACK_CHUNK.

    Differentiable: the cotangent of row r is d_packed[r, :A]."""
    return _pack_rows_impl(tuple(rows), interpret)


def _pack_rows_fwd(rows, interpret):
    rows = tuple(rows)
    return _pack_rows_impl(rows, interpret), (len(rows), rows[0].shape[0])


def _pack_rows_bwd(interpret, res, g):
    n_in, A = res
    return (tuple(g[r, :A] for r in range(n_in)),)


pack_rows.defvjp(_pack_rows_fwd, _pack_rows_bwd)


def _pack_rows_impl(rows, interpret=False, n_out=N_ROWS):
    n_in = len(rows)
    A = rows[0].shape[0]
    assert n_in <= n_out and A % PACK_CHUNK == 0, (n_in, n_out, A)
    n_chunks = A // PACK_CHUNK + 1
    kernel = functools.partial(_pack_kernel, n_in=n_in, n_out=n_out)
    rows2d = [r.reshape(1, A) for r in rows]
    return pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_in,
        out_specs=pl.BlockSpec((n_out, PACK_CHUNK), lambda c: (0, c)),
        out_shape=jax.ShapeDtypeStruct(
            (n_out, A + PACK_CHUNK), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((1, PACK_CHUNK), jnp.float32) for _ in range(n_in)
        ] + [
            pltpu.SemaphoreType.DMA((n_in,)),
        ],
        interpret=interpret,
    )(*rows2d)


# --------------------------------------------------------------------------
# gather-free binning
# --------------------------------------------------------------------------
def splat_extents(cn_xx, cn_xy, cn_yy, opacity, radius):
    """Per-axis pixel extents (ext_x, ext_y) of a splat: the tight
    axis-aligned bbox of the region where alpha can reach the kernel's
    ALPHA_MIN gate, capped at the caller's scalar `radius`.

    The conic is the inverse 2x2 covariance; the AA bbox of the Mahalanobis-D
    ellipse has half-widths D*sqrt(cov_xx) = D*sqrt(cn_yy/det(conic)) and
    D*sqrt(cov_yy). alpha = op*exp(-d^2/2) >= 1/255 requires
    d <= sqrt(2 ln(255 op)); D caps at 3 (the 3-sigma convention the scalar
    radius already enforces — see projection.tight_radius). +1 px margin
    absorbs bf16 conic rounding on the packed paths (the kernel evaluates
    the same rounded conic, so the rounded gate region stays inside the
    margined bbox)."""
    det_c = cn_xx * cn_yy - cn_xy * cn_xy
    pos = det_c > 0.0
    inv_det = 1.0 / jnp.where(pos, det_c, 1.0)
    d_lim = jnp.sqrt(jnp.clip(2.0 * jnp.log(255.0 * opacity), 0.0, 9.0))
    ext_x = d_lim * jnp.sqrt(jnp.maximum(cn_yy * inv_det, 0.0)) + 1.0
    ext_y = d_lim * jnp.sqrt(jnp.maximum(cn_xx * inv_det, 0.0)) + 1.0
    ext_x = jnp.minimum(jnp.where(pos, ext_x, radius), radius)
    ext_y = jnp.minimum(jnp.where(pos, ext_y, radius), radius)
    return ext_x, ext_y



# above this run count the delta scatter-add serializes catastrophically on
# TPU (~8 s at 2M indices) and the two-sort merge construction wins
_EXPAND_SORT_THRESHOLD = 1 << 18


def piecewise_expand(values, offsets, length):
    """Expand per-run values (R, P) to (R, length) piecewise-constant rows.

    offsets: (P,) int32 run starts (ascending; zero-length runs allowed).
    Two implementations, both gather-free on the pair axis:

    * small P: telescoping-delta scatter-add + cumsum (scatter cost is
      per-index, ~47 ns each — fine up to a few 100k);
    * large P: merge-by-sort — interleave (delta, position) records with one
      filler record per output column via ONE sort keyed on 2*pos+is_filler,
      running-cumsum the payload, then extract the fillers in column order
      with a SECOND sort. Two sorts of (P+length) beat the serialized
      scatter by ~100x at multi-M run counts.

    Both are linear in `values`, so autodiff flows through (scatter-add /
    sort-permutation + cumsum transposes).
    """
    P = offsets.shape[0]
    if P >= _EXPAND_SORT_THRESHOLD:
        return jnp.stack(
            _piecewise_expand_sort_rows(values, offsets, length), axis=0
        )
    deltas = jnp.concatenate(
        [values[:, :1], values[:, 1:] - values[:, :-1]], axis=1
    )
    base = jnp.zeros((values.shape[0], length), values.dtype)
    seeded = base.at[:, offsets].add(deltas, mode="drop")
    return jnp.cumsum(seeded, axis=1)


def piecewise_expand_rows(values, offsets, length):
    """piecewise_expand returning a LIST of (length,) rows.

    Avoids ever stacking sort outputs into an (R, A) array — measured
    ~50 ms at R=13, A=5M on TPU (strided sublane writes into the tiled
    layout); all downstream consumers are row-wise anyway.
    """
    P = offsets.shape[0]
    if P >= _EXPAND_SORT_THRESHOLD:
        return _piecewise_expand_sort_rows(values, offsets, length)
    out = piecewise_expand(values, offsets, length)
    return [out[r] for r in range(values.shape[0])]


def _piecewise_expand_sort(values, offsets, length):
    return jnp.stack(
        _piecewise_expand_sort_rows(values, offsets, length), axis=0
    )


def _piecewise_expand_sort_rows(values, offsets, length):
    R, P = values.shape
    A = length
    deltas = jnp.concatenate(
        [values[:, :1], values[:, 1:] - values[:, :-1]], axis=1
    )
    # reals sort immediately BEFORE the filler of the same column (even vs
    # odd keys), so the running cumsum at each filler includes every delta
    # at offsets <= j; out-of-range runs (offset clamped to A) land beyond
    # every filler = drop. Stability is NOT needed: ties only occur among
    # reals of the same column, whose deltas are summed (commutative) before
    # any filler reads the running total — and a stable lax.sort costs ~10x
    # an unstable one on TPU (measured 82 ms vs 8 ms at 5M rows).
    key_real = jnp.minimum(offsets, A).astype(jnp.uint32) * 2
    key_fill = jnp.arange(A, dtype=jnp.uint32) * 2 + 1
    keys = jnp.concatenate([key_real, key_fill])
    merged = jnp.concatenate(
        [deltas, jnp.zeros((R, A), values.dtype)], axis=1
    )
    ops = (keys,) + tuple(merged[r] for r in range(R))
    sorted_ops = jax.lax.sort(ops, num_keys=1, is_stable=False)
    k_s = sorted_ops[0]
    # per-row 1-D cumsums: stacking the sorted rows first costs ~5x the
    # sorts themselves
    run = tuple(jnp.cumsum(r) for r in sorted_ops[1:])
    # second sort brings fillers to the front in column order
    is_fill = (k_s & 1) == 1
    key2 = jnp.where(
        is_fill, k_s >> 1,
        jnp.uint32(A) + jnp.arange(P + A, dtype=jnp.uint32),
    )
    ops2 = (key2,) + run
    sorted2 = jax.lax.sort(ops2, num_keys=1, is_stable=False)
    return [r[:A] for r in sorted2[1:]]


def expand_sort_pairs(splats, colors, image_height, image_width, max_pairs,
                      runs_tail_only=False, active_prefix=None,
                      interpret=False, gid_ids=None, inference_pack=False):
    """First half of build_pairs: rects -> gather-free pair expansion ->
    ONE sort by (tile, depth, gid). Returns a dict of SORTED 1-D pair rows
    (tile_s int32 with `num_tiles` as the tail sentinel, gid_s, values_s —
    the 10 splat-value rows — and perm_s) plus grid geometry. Used directly
    by the multi-chip point-sharded render (parallel/sharded_render.py),
    which exchanges the sorted rows between band owners BEFORE packing.

    All pair-axis arrays have static length `max_pairs` (+ one spare chunk
    for tail DMA overrun).

    runs_tail_only: caller guarantees `active_prefix` is a PREFIX mask
    (compacted slices — nonzero/sort compaction yields ascending indices).
    Every prefix lane is then forced to emit >= 1 pair (invalid lanes get a
    sanitized zero-alpha record at tile 0), so zero-count runs exist only
    in the tail — the contract that lets the expansion run on the Pallas
    MXU one-hot kernel (ops/expand_pallas.py) instead of the scatter/sort
    constructions.
    """
    from .projection import SplatCols

    cols_mode = isinstance(splats, SplatCols)
    if cols_mode:
        px_x, px_y = splats.px, splats.py
        cn_xx, cn_xy, cn_yy = splats.cxx, splats.cxy, splats.cyy
        col_r, col_g, col_b = colors
    else:
        px_x = splats.pix_xy[:, 0]
        px_y = splats.pix_xy[:, 1]
        cn_xx = splats.conic[:, 0]
        cn_xy = splats.conic[:, 1]
        cn_yy = splats.conic[:, 2]
        col_r, col_g, col_b = colors[:, 0], colors[:, 1], colors[:, 2]
    P = splats.opacity.shape[0]
    # ids ride f32 rows (ROW_GID and the expansion), exact only below 2^24;
    # render slices are LoD cuts (~100-300k) so this bounds the SLICE, not
    # the scene. Lift by splitting the slice if ever hit.
    assert P < (1 << 24), f"rasterize slice too large for f32 id rows: {P}"
    tiles_x = pl.cdiv(image_width, TILE_W)
    tiles_y = pl.cdiv(image_height, TILE_H)
    num_tiles = tiles_x * tiles_y
    A = max_pairs

    radius = splats.radius
    valid = splats.valid & (radius > 0)

    # tile rectangles from the PER-AXIS extents (tight AA bbox of the
    # ellipse) instead of the circumscribed-circle square (Inria getRect,
    # diff_gaussian_rasterization/cuda_rasterizer/forward.cu uses the 3-sigma
    # circle) — every pixel passing the kernel's alpha >= 1/255 gate lies
    # inside the bbox, and anisotropic splats bin to far fewer tiles, which
    # is what the binning sorts scale with.
    ext_x, ext_y = splat_extents(cn_xx, cn_xy, cn_yy, splats.opacity, radius)
    x0 = jnp.clip(((px_x - ext_x) / TILE_W).astype(jnp.int32), 0, tiles_x)
    y0 = jnp.clip(((px_y - ext_y) / TILE_H).astype(jnp.int32), 0, tiles_y)
    x1 = jnp.clip(
        ((px_x + ext_x + TILE_W - 1) / TILE_W).astype(jnp.int32), 0, tiles_x
    )
    y1 = jnp.clip(
        ((px_y + ext_y + TILE_H - 1) / TILE_H).astype(jnp.int32), 0, tiles_y
    )
    rect_w = jnp.maximum(x1 - x0, 0)
    n_tiles_g = jnp.where(valid, rect_w * jnp.maximum(y1 - y0, 0), 0)

    if runs_tail_only:
        ap = (
            active_prefix
            if active_prefix is not None
            else jnp.ones_like(valid)
        )
        # force >= 1 pair per prefix lane; sanitize the dummy records so
        # their alpha masks to zero (power <= 0 fails at px = -1e4) and
        # route them to the SENTINEL tile row (y0 = tiles_y -> tile id >=
        # num_tiles): they sort to the tail and cost the kernel nothing.
        # (Routing them to tile 0 instead put every invalid/culled lane's
        # dummy pair on tile 0's run — ~500k zero-alpha pairs the kernel
        # walked to no effect at the r2 bench sizes, ~7 ms/frame.)
        n_tiles_g = jnp.where(ap, jnp.maximum(n_tiles_g, 1), 0)
        x0 = jnp.where(valid, x0, 0)
        y0 = jnp.where(valid, y0, tiles_y)
        rect_w = jnp.where(valid, rect_w, 1)
        px_x = jnp.where(valid, px_x, -1e4)
        px_y = jnp.where(valid, px_y, -1e4)

    # Exclusive cumsum of per-splat tile counts. At coarse LoD cuts the
    # UNCLAMPED total can exceed int32 (1.6M splats x up to ~2k tiles
    # ~ 3e9): an int32 cumsum wraps negative, searchsorted on the garbage
    # produces chaotic expand windows, and the Pallas expand kernel reads
    # out of bounds (hard TPU fault — hit by bench.py's min_res=12 config).
    # f32 is SAFE here: partial sums are exact integers below 2^24, and
    # every offset past the A (< 2^24) budget clamps to A anyway; f32
    # accumulation of non-negative terms is monotone, so clamped offsets
    # stay ascending.
    csum_f = jnp.cumsum(n_tiles_g.astype(jnp.float32))
    offsets_f = csum_f - n_tiles_g.astype(jnp.float32)
    total_c = jnp.clip(csum_f[-1], 0.0, float(A)).astype(jnp.int32)
    # unclamped demand (clipped to 2^30 for int32 safety): what max_pairs
    # WOULD need to be for zero overflow truncation — callers use it to
    # right-size the pair budget frame-over-frame
    total_unclamped = jnp.minimum(csum_f[-1], float(1 << 30)).astype(
        jnp.int32
    )
    offsets_c = jnp.minimum(offsets_f, float(A)).astype(jnp.int32)
    offsets = offsets_c  # overflow runs scatter out of range

    # ONE piecewise expansion for 13 rows (10 splat-value rows + 3 integer
    # geometry rows carried exactly in f32 — all magnitudes < 2^24). The
    # rect geometry (x0, y0, w) packs into one row: x0 + 32*(y0 + 512*w)
    # needs x0,w < 32 and y0 < 512 — holds through 4K at TILE_W=128/TILE_H>=8
    assert tiles_x <= 32 and tiles_y <= 512, (tiles_x, tiles_y)
    w_eff = jnp.maximum(rect_w, 1)
    geo_packed = (x0 + 32 * (y0 + 512 * w_eff)).astype(jnp.float32)
    # the id row defaults to the lane index; gid_ids overrides it with
    # caller ids (e.g. original capacity rows) so per-gaussian stats land
    # directly in the caller's index space — no un-compaction scatter
    id_row = (
        jnp.arange(P, dtype=jnp.float32)
        if gid_ids is None
        else gid_ids.astype(jnp.float32)
    )
    rows13 = [
        px_x, px_y, cn_xx, cn_xy, cn_yy, splats.opacity,
        col_r, col_g, col_b, splats.depth,
        jax.lax.stop_gradient(offsets.astype(jnp.float32)),
        jax.lax.stop_gradient(geo_packed),
        jax.lax.stop_gradient(id_row),
    ]
    use_pallas_expand = runs_tail_only and A % 512 == 0 and A < (1 << 24)
    if use_pallas_expand and cols_mode and P % PACK_CHUNK == 0:
        # column-native path: pack the 15 1-D rows with the Pallas DMA
        # pack kernel instead of a (13, P) jnp.stack (strided sublane
        # writes cost ~0.8 ns/element — tens of ms/frame at 2M lanes)
        from .expand_pallas import ROW_NEXT, ROW_OFFS, expand_packed_with_keys
        from .expand_pallas import W as EXPAND_W

        offs_f = offsets_c.astype(jnp.float32)
        next_f = jnp.concatenate(
            [offs_f[1:], jnp.full((1,), float(A), jnp.float32)]
        )
        packed15 = pack_rows(
            tuple(rows13) + (offs_f, next_f), interpret=interpret
        )
        # window sentinel: reads past P must see offs = next = A
        packed15 = packed15.at[
            ROW_OFFS:ROW_NEXT + 1, P:P + EXPAND_W
        ].set(float(A))
        all_pc, tile_key, dkey = expand_packed_with_keys(
            packed15, offsets_c, total_c, A, tiles_x, num_tiles,
            interpret=interpret,
        )
        all_rows = [all_pc[r] for r in range(13)]
        val_pc = tuple(all_rows[:N_VAL_ROWS])
        gid_pc = all_rows[N_VAL_ROWS + 2].astype(jnp.int32)
        tile_id = jax.lax.stop_gradient(tile_key).astype(jnp.int32)
        depth_key = jax.lax.stop_gradient(dkey)
        real = tile_id < num_tiles
    elif use_pallas_expand:
        from .expand_pallas import expand_pallas_with_keys

        stack13 = jnp.stack(rows13, axis=0)
        # the (tile id, sentineled depth) sort keys are decoded IN-KERNEL
        # on the expansion's spare VPU cycles — saves ~6 A-length
        # elementwise passes (incl. the slow vector int div/mod)
        all_pc, tile_key, dkey = expand_pallas_with_keys(
            stack13, offsets_c, total_c, A, tiles_x, num_tiles,
            interpret=interpret,
        )
        all_rows = [all_pc[r] for r in range(stack13.shape[0])]
        val_pc = tuple(all_rows[:N_VAL_ROWS])
        gid_pc = all_rows[N_VAL_ROWS + 2].astype(jnp.int32)
        tile_id = jax.lax.stop_gradient(tile_key).astype(jnp.int32)
        depth_key = jax.lax.stop_gradient(dkey)
        real = tile_id < num_tiles
    else:
        stack13 = jnp.stack(rows13, axis=0)
        all_rows = piecewise_expand_rows(stack13, offsets_c, A)
        val_pc = tuple(all_rows[:N_VAL_ROWS])
        off_pc = all_rows[N_VAL_ROWS + 0].astype(jnp.int32)
        geo_pc = all_rows[N_VAL_ROWS + 1].astype(jnp.int32)
        x0_pc = geo_pc & 31
        y0_pc = (geo_pc >> 5) & 511
        w_pc = jnp.maximum(geo_pc >> 14, 1)
        gid_pc = all_rows[N_VAL_ROWS + 2].astype(jnp.int32)

        j = jnp.arange(A, dtype=jnp.int32)
        k = j - off_pc
        tx = x0_pc + k % w_pc
        ty = y0_pc + k // w_pc
        real = j < total_c
        tile_id = jnp.where(real, ty * tiles_x + tx, num_tiles)
        depth_key = jnp.where(real, val_pc[ROW_DEPTH], jnp.inf)

    if inference_pack:
        # inference-only sort: 6 packed payloads instead of 12
        # (10 values + gid + perm). px/py stay f32; conic/opacity/rgb
        # pack as bf16 pairs; no grad path (no perm), no stats (no gid).
        # Opacity rides as LOG(op): the packed kernel evaluates the splat
        # quadratic q = power + log(op) via ONE small MXU matmul
        # (pair-coefficients @ pixel-basis) instead of ~10 VPU passes of
        # (chunk, TILE_PIX) elementwise math, and alpha = exp(q) directly.
        # Zero/sanitized lanes (op = 0) clamp to log(1e-38) = -87.5, so
        # exp(q) underflows to an exact 0 instead of propagating -inf
        # through the matmul.
        shift = _pack_shift(num_tiles)
        dbits = jax.lax.bitcast_convert_type(
            depth_key.astype(jnp.float32), jnp.uint32
        )
        key = (tile_id.astype(jnp.uint32) << shift) | (dbits >> (32 - shift))
        p1 = _pack2_bf16(val_pc[ROW_CXX], val_pc[ROW_CXY])
        p2 = _pack2_bf16(
            val_pc[ROW_CYY],
            jnp.log(jnp.maximum(val_pc[ROW_OPAC], 1e-38)),
        )
        p3 = _pack2_bf16(val_pc[ROW_R], val_pc[ROW_G])
        p4 = _pack2_bf16(val_pc[ROW_B], jnp.zeros_like(val_pc[ROW_B]))
        sorted_ops = jax.lax.sort(
            (key, val_pc[ROW_PX], val_pc[ROW_PY], p1, p2, p3, p4),
            num_keys=1, is_stable=False,
        )
        tile_s = (sorted_ops[0] >> shift).astype(jnp.int32)
        rows6 = (sorted_ops[1], sorted_ops[2]) + tuple(
            jax.lax.bitcast_convert_type(r, jnp.float32)
            for r in sorted_ops[3:]
        )
        return {
            "tile_s": tile_s,
            "packed6": rows6,
            "tiles_x": tiles_x,
            "tiles_y": tiles_y,
            "num_tiles": num_tiles,
            "total": total_unclamped,
        }
    tile_s, gid_s, values_s, perm_s = sort_pairs(
        tile_id, depth_key, gid_pc, val_pc, num_tiles
    )
    return {
        "tile_s": tile_s,
        "gid_s": gid_s,
        "values_s": values_s,
        "perm_s": perm_s,
        "real": real,
        "tiles_x": tiles_x,
        "tiles_y": tiles_y,
        "num_tiles": num_tiles,
        "radius": radius,
        "valid": valid,
        "total": total_unclamped,
    }


def pack_sorted_pairs(tile_s, gid_s, values_s, tiles_x, tiles_y,
                      interpret=False):
    """Second half of build_pairs: per-tile start/count tables + the packed
    (16, A + spare) kernel input from sorted pair rows."""
    num_tiles = tiles_x * tiles_y
    A = tile_s.shape[0]
    if os.environ.get("LOG_TPU_TILESTART") == "bincount":
        # per-tile counts via scatter-add at SORTED indices (the fast TPU
        # scatter path) + exclusive cumsum — A/B alternative to the
        # searchsorted (whose binary-search gathers serialize)
        counts = jnp.zeros((num_tiles + 1,), jnp.int32).at[tile_s].add(
            1, mode="drop"
        )
        starts = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts[:num_tiles])]
        )
        tile_start = starts[:-1]
        tile_end = starts[1:]
    else:
        # one searchsorted over num_tiles+1 boundaries; counts are the diffs
        arange_t1 = jnp.arange(num_tiles + 1, dtype=jnp.int32)
        starts = jnp.searchsorted(tile_s, arange_t1, side="left").astype(jnp.int32)
        tile_start = starts[:-1]
        tile_end = starts[1:]

    # pack (16, A + spare chunk): rows 0..9 values, row 10 the gaussian id
    # (already sorted as a key payload — rides the chunk DMA for free), rest
    # zero. Packing runs in a Pallas DMA kernel: a jnp.stack of the sorted
    # 1-D rows costs ~50 ms at 4M pairs (strided sublane writes).
    gid_row = jax.lax.stop_gradient(gid_s.astype(jnp.float32))
    pack_in = tuple(values_s) + (gid_row,)
    if A % PACK_CHUNK == 0:
        pair_data = pack_rows(pack_in, interpret=interpret)
    else:  # small/odd buckets (tests): plain stack + pad
        pad = jnp.zeros((N_ROWS - len(pack_in), A), jnp.float32)
        pair_data = jnp.concatenate(
            [jnp.stack(pack_in, axis=0), pad], axis=0
        )
        pair_data = jnp.pad(pair_data, ((0, 0), (0, PAIR_CHUNK)))

    return {
        "pair_data": pair_data,  # (16, A + 128)
        "pair_gid": gid_s,  # (A,) original gaussian ids, garbage on tail
        "tile_start": tile_start,
        "tile_count": (tile_end - tile_start),
        "tiles_x": tiles_x,
        "tiles_y": tiles_y,
    }


def build_pairs(splats, colors, image_height, image_width, max_pairs,
                runs_tail_only=False, active_prefix=None, interpret=False,
                gid_ids=None):
    """Expansion + sort + packing: the full binning stage (see
    expand_sort_pairs for the contract notes)."""
    es = expand_sort_pairs(
        splats, colors, image_height, image_width, max_pairs,
        runs_tail_only=runs_tail_only, active_prefix=active_prefix,
        interpret=interpret, gid_ids=gid_ids,
    )
    packed = pack_sorted_pairs(
        es["tile_s"], es["gid_s"], es["values_s"], es["tiles_x"],
        es["tiles_y"], interpret=interpret,
    )
    packed["pair_real"] = es["real"]  # pre-sort real mask (for reference)
    packed["radius"] = es["radius"]
    packed["valid"] = es["valid"]
    packed["total"] = es["total"]
    return packed


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------
def _fwd_kernel(
    # scalar prefetch
    tile_start_ref,
    tile_count_ref,
    # inputs
    pair_hbm,  # (16, A + 128) ANY/HBM
    background_ref,  # (1, 3) VMEM
    pw_init_hbm,  # (8, A + 128) ANY — aliased to pair_w output (zeros)
    # outputs
    color_ref,  # (3, TILE_H, TILE_W)
    tfinal_ref,
    pid_ref,  # argmax PAIR slot (-1 empty)
    pwp_ref,
    pair_w_hbm,  # (8, A + 128): row 0 = per-pair max blend weight
    cend_ref,  # (1, 1) i32: chunks processed before saturation early-exit
    # scratch
    buf,  # (2, 16, PAIR_CHUNK)
    wbuf,  # (8, PAIR_CHUNK)
    sems,
    wsem,
    *,
    tiles_x: int,
    with_stats: bool,
):
    t = pl.program_id(0)
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    off0 = pl.multiple_of((start // PAIR_CHUNK) * PAIR_CHUNK, PAIR_CHUNK)
    n_chunks = pl.cdiv(start + count - off0, PAIR_CHUNK)

    tile_y = t // tiles_x
    tile_x = t - tile_y * tiles_x
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_PIX), 1)
    pix_x = (tile_x * TILE_W + lane % TILE_W).astype(jnp.float32)
    pix_y = (tile_y * TILE_H + lane // TILE_W).astype(jnp.float32)

    def get_dma(slot, c):
        off = pl.multiple_of(off0 + c * PAIR_CHUNK, PAIR_CHUNK)
        return pltpu.make_async_copy(
            pair_hbm.at[:, pl.ds(off, PAIR_CHUNK)], buf.at[slot], sems.at[slot]
        )

    @pl.when(n_chunks > 0)
    def _():
        get_dma(0, 0).start()

    row_idx = jax.lax.broadcasted_iota(jnp.int32, (PAIR_CHUNK, PAIR_CHUNK), 0)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (PAIR_CHUNK, PAIR_CHUNK), 1)
    ltri_strict = (row_idx > col_idx).astype(jnp.float32)
    g_iota = jax.lax.broadcasted_iota(jnp.int32, (PAIR_CHUNK, 1), 0)

    def chunk_body(state):
        c, color, trans, best_w, best_id = state
        slot = c % 2

        @pl.when(c + 1 < n_chunks)
        def _():
            get_dma((c + 1) % 2, c + 1).start()

        get_dma(slot, c).wait()
        d = buf[slot]  # (16, PAIR_CHUNK)

        dx = d[ROW_PX, :][:, None] - pix_x
        dy = d[ROW_PY, :][:, None] - pix_y
        fast = _use_fastexp()
        if fast:
            # experiment path (see _use_fastexp): exponent in base 2 via
            # conic rows pre-scaled by log2 e; `power <= 0` gating is
            # scale-invariant
            s = jnp.float32(_LOG2E)
            power = (
                -0.5
                * ((s * d[ROW_CXX, :])[:, None] * dx * dx
                   + (s * d[ROW_CYY, :])[:, None] * dy * dy)
                - (s * d[ROW_CXY, :])[:, None] * dx * dy
            )
            g_exp = _fexp2(power)
        else:
            power = (
                -0.5
                * (d[ROW_CXX, :][:, None] * dx * dx
                   + d[ROW_CYY, :][:, None] * dy * dy)
                - d[ROW_CXY, :][:, None] * dx * dy
            )
            g_exp = jnp.exp(power)
        alpha = jnp.minimum(ALPHA_MAX, d[ROW_OPAC, :][:, None] * g_exp)
        g_global = off0 + c * PAIR_CHUNK + g_iota
        in_range = (g_global >= start) & (g_global < start + count)
        alpha = jnp.where(
            (power <= 0.0) & (alpha >= ALPHA_MIN) & in_range, alpha, 0.0
        )

        one_minus = 1.0 - alpha
        if CUMPROD_IMPL == "matmul":
            # exclusive cumprod via STRICT-triangular MXU matmul
            # (division-free; inclusive = exclusive * one_minus).
            # Inference (with_stats=False) runs it in bf16: the triangular
            # mask is exact 0/1, log(1-a) in [-4.6, 0] carries ~0.4%
            # relative error -> transmittance error < ~1%, invisible at
            # 8-bit output; training keeps f32 for gradient fidelity.
            if fast:
                log_om = jnp.where(alpha > 0.0, _flog2(one_minus), 0.0)
            else:
                log_om = jnp.log(one_minus)
            if with_stats is False:
                acc = jax.lax.dot_general(
                    ltri_strict.astype(jnp.bfloat16),
                    log_om.astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                acc = jax.lax.dot_general(
                    ltri_strict, log_om,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            cp_excl = _fexp2(acc) if fast else jnp.exp(acc)
        else:
            # doubling scan: log2(CHUNK) sublane-roll multiplies on the VPU
            row1 = jax.lax.broadcasted_iota(
                jnp.int32, (PAIR_CHUNK, 1), 0
            )
            cp_excl = jnp.where(row1 >= 1, pltpu.roll(one_minus, 1, axis=0), 1.0)
            sft = 1
            while sft < PAIR_CHUNK:
                cp_excl = cp_excl * jnp.where(
                    row1 >= sft, pltpu.roll(cp_excl, sft, axis=0), 1.0
                )
                sft *= 2
        cp_incl = cp_excl * one_minus
        t_after = trans * cp_incl
        w = trans * cp_excl * alpha
        w = jnp.where(t_after >= T_EPS, w, 0.0)

        rgb = jnp.concatenate(
            [d[ROW_R, :][:, None], d[ROW_G, :][:, None], d[ROW_B, :][:, None]],
            axis=1,
        )
        if with_stats is False:
            # inference: bf16 color accumulation (~0.4% relative — one
            # 8-bit LSB — while halving the MXU passes of the N=3-padded
            # accumulate matmul); training keeps f32 weights/colors
            color = color + jax.lax.dot_general(
                w.astype(jnp.bfloat16), rgb.astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            color = color + jax.lax.dot_general(
                w, rgb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        trans = trans * cp_incl[-1:, :]

        cw = jnp.max(w, axis=0, keepdims=True)
        if with_stats is True:  # "weights" level skips argmax tracking
            gid_col = d[ROW_GID, :].astype(jnp.int32)[:, None]
            cid = jnp.max(
                jnp.where((w == cw) & (cw > 0.0), gid_col, -1), axis=0,
                keepdims=True,
            )
            take = cw > best_w
            best_w = jnp.where(take, cw, best_w)
            best_id = jnp.where(take, cid, best_id)
        if with_stats:
            # per-pair max weight -> HBM; boundary chunks (shared with a
            # neighboring tile) merge read-modify-write (sequential grid)
            off = pl.multiple_of(off0 + c * PAIR_CHUNK, PAIR_CHUNK)
            boundary = (c == 0) | (c == n_chunks - 1)
            pw_chunk = jnp.max(w, axis=1)[None, :]  # (1, CHUNK)

            @pl.when(boundary)
            def _():
                rd = pltpu.make_async_copy(
                    pair_w_hbm.at[:, pl.ds(off, PAIR_CHUNK)], wbuf, wsem
                )
                rd.start()
                rd.wait()
                merged = jnp.maximum(wbuf[0:1, :], pw_chunk)
                wbuf[:] = jnp.concatenate(
                    [merged, jnp.zeros((7, PAIR_CHUNK), jnp.float32)], axis=0
                )
                wr = pltpu.make_async_copy(
                    wbuf, pair_w_hbm.at[:, pl.ds(off, PAIR_CHUNK)], wsem
                )
                wr.start()
                wr.wait()

            @pl.when(jnp.logical_not(boundary))
            def _():
                wbuf[:] = jnp.concatenate(
                    [pw_chunk, jnp.zeros((7, PAIR_CHUNK), jnp.float32)], axis=0
                )
                wr = pltpu.make_async_copy(
                    wbuf, pair_w_hbm.at[:, pl.ds(off, PAIR_CHUNK)], wsem
                )
                wr.start()
                wr.wait()
        return c + 1, color, trans, best_w, best_id

    def chunk_cond(state):
        c, _, trans, _, _ = state
        # early exit is valid in stats mode too: once T < eps every later
        # pair's blend weight is exactly 0, which is what the zero-initialized
        # pair_w buffer already holds for unvisited chunks
        return (c < n_chunks) & (jnp.max(trans) >= T_EPS)

    init = (
        jnp.int32(0),
        jnp.zeros((TILE_PIX, 3), jnp.float32),
        jnp.ones((1, TILE_PIX), jnp.float32),
        jnp.zeros((1, TILE_PIX), jnp.float32),
        jnp.full((1, TILE_PIX), -1, jnp.int32),
    )
    c_end, color, trans, best_w, best_id = jax.lax.while_loop(
        chunk_cond, chunk_body, init
    )

    @pl.when(c_end < n_chunks)
    def _():
        get_dma(c_end % 2, c_end).wait()

    bg = background_ref[0, :]
    final = color + trans[0, :][:, None] * bg[None, :]
    color_ref[:] = final.T.reshape(3, TILE_H, TILE_W)
    tfinal_ref[:] = trans.reshape(TILE_H, TILE_W)
    pid_ref[:] = best_id.reshape(TILE_H, TILE_W)
    pwp_ref[:] = best_w.reshape(TILE_H, TILE_W)
    # chunks actually composited before the saturation early-exit: the
    # backward kernel clamps its back-to-front walk to this bound — pairs
    # beyond it have w == 0 and u-suffix == 0, so every skipped chunk's
    # gradient is exactly the zero the aliased grad buffer already holds.
    # (SMEM output: a (1,1)-blocked VMEM output violates Mosaic's 8x128
    # tile-divisibility rule; the whole (num_tiles,) row lives in SMEM and
    # each sequential grid step writes its own slot)
    cend_ref[t] = c_end


def _run_forward(pair_data, tile_start, tile_count, background,
                 tiles_x, tiles_y, with_stats, interpret):
    num_tiles = tiles_x * tiles_y
    A = pair_data.shape[1]  # already includes the spare chunk
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(
                (3, TILE_H, TILE_W), lambda t, *_: (0, t // tiles_x, t % tiles_x)
            ),
            pl.BlockSpec((TILE_H, TILE_W), lambda t, *_: (t // tiles_x, t % tiles_x)),
            pl.BlockSpec((TILE_H, TILE_W), lambda t, *_: (t // tiles_x, t % tiles_x)),
            pl.BlockSpec((TILE_H, TILE_W), lambda t, *_: (t // tiles_x, t % tiles_x)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, N_ROWS, PAIR_CHUNK), jnp.float32),
            pltpu.VMEM((8, PAIR_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(
        _fwd_kernel, tiles_x=tiles_x, with_stats=with_stats
    )
    out_shapes = (
        jax.ShapeDtypeStruct((3, tiles_y * TILE_H, tiles_x * TILE_W), jnp.float32),
        jax.ShapeDtypeStruct((tiles_y * TILE_H, tiles_x * TILE_W), jnp.float32),
        jax.ShapeDtypeStruct((tiles_y * TILE_H, tiles_x * TILE_W), jnp.int32),
        jax.ShapeDtypeStruct((tiles_y * TILE_H, tiles_x * TILE_W), jnp.float32),
        jax.ShapeDtypeStruct((8, A), jnp.float32),
        jax.ShapeDtypeStruct((num_tiles,), jnp.int32),
    )
    pw_init = jnp.zeros((8, A), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
        input_output_aliases={4: 4},  # pw_init -> pair_w (zero init for RMW)
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        tile_start,
        tile_count,
        pair_data,
        background.reshape(1, 3).astype(jnp.float32),
        pw_init,
    )


# --------------------------------------------------------------------------
# packed inference forward kernel: (8, A) bit-packed pair rows, color+alpha
# outputs only (no stats, no per-pair weight buffer -> half the chunk DMA
# bytes and none of the 8xA zero-init/alias traffic of the stats kernel)
# --------------------------------------------------------------------------
def _fwd_kernel_packed(
    tile_start_ref,
    tile_count_ref,
    pair_hbm,  # (P_N_ROWS, A + 128) ANY/HBM, rows per P_ROW_* layout
    background_ref,  # (1, 3) VMEM
    color_ref,  # (3, TILE_H, TILE_W)
    tfinal_ref,
    buf,  # (2, P_N_ROWS, PAIR_CHUNK)
    sems,
    *,
    tiles_x: int,
):
    t = pl.program_id(0)
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    off0 = pl.multiple_of((start // PAIR_CHUNK) * PAIR_CHUNK, PAIR_CHUNK)
    n_chunks = pl.cdiv(start + count - off0, PAIR_CHUNK)

    tile_y = t // tiles_x
    tile_x = t - tile_y * tiles_x
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_PIX), 1)
    # TILE-LOCAL pixel coords: the splat quadratic is evaluated as
    # coeffs(chunk, 8) @ basis(8, TILE_PIX) on the MXU — one small matmul
    # replacing ~10 VPU elementwise passes of (chunk, TILE_PIX). Local
    # coords keep the expanded-quadratic coefficients small (|a0| <~ 1e4
    # for on-screen splats), so the f32(HIGHEST) matmul's cancellation
    # error stays ~1e-3 absolute on q — the same order as the bf16 conic
    # rounding the packed pipeline already carries.
    loc_x = (lane % TILE_W).astype(jnp.float32)
    loc_y = (lane // TILE_W).astype(jnp.float32)
    basis = jnp.concatenate(
        [
            jnp.ones_like(loc_x), loc_x, loc_y,
            loc_x * loc_x, loc_x * loc_y, loc_y * loc_y,
            jnp.zeros_like(loc_x), jnp.zeros_like(loc_x),
        ],
        axis=0,
    )  # (8, TILE_PIX)
    tile_x0 = (tile_x * TILE_W).astype(jnp.float32)
    tile_y0 = (tile_y * TILE_H).astype(jnp.float32)

    def get_dma(slot, c):
        off = pl.multiple_of(off0 + c * PAIR_CHUNK, PAIR_CHUNK)
        return pltpu.make_async_copy(
            pair_hbm.at[:, pl.ds(off, PAIR_CHUNK)], buf.at[slot], sems.at[slot]
        )

    @pl.when(n_chunks > 0)
    def _():
        get_dma(0, 0).start()

    row_idx = jax.lax.broadcasted_iota(jnp.int32, (PAIR_CHUNK, PAIR_CHUNK), 0)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (PAIR_CHUNK, PAIR_CHUNK), 1)
    ltri_strict = (row_idx > col_idx).astype(jnp.float32)
    g_iota = jax.lax.broadcasted_iota(jnp.int32, (PAIR_CHUNK, 1), 0)

    def chunk_body(state):
        c, color, trans = state
        slot = c % 2

        @pl.when(c + 1 < n_chunks)
        def _():
            get_dma((c + 1) % 2, c + 1).start()

        get_dma(slot, c).wait()
        d = buf[slot]  # (P_N_ROWS, PAIR_CHUNK) f32 (bit-packed rows)
        c1 = jax.lax.bitcast_convert_type(d[P_ROW_CXX_CXY, :], jnp.uint32)
        c2 = jax.lax.bitcast_convert_type(d[P_ROW_CYY_OPAC, :], jnp.uint32)
        c3 = jax.lax.bitcast_convert_type(d[P_ROW_R_G, :], jnp.uint32)
        c4 = jax.lax.bitcast_convert_type(d[P_ROW_B, :], jnp.uint32)
        cxx, cxy = _unpack2_bf16(c1)
        cyy, logop = _unpack2_bf16(c2)  # opacity rides as log(op)
        col_r, col_g = _unpack2_bf16(c3)
        col_b, _ = _unpack2_bf16(c4)
        fast = _use_fastexp()
        if fast:
            # base-2 pipeline: fold log2(e) into the quadratic coefficients
            # (and the gate threshold) so alpha = exp2(q2) with q2 = q*log2e
            logop = logop * jnp.float32(_LOG2E)
            cxx = cxx * jnp.float32(_LOG2E)
            cxy = cxy * jnp.float32(_LOG2E)
            cyy = cyy * jnp.float32(_LOG2E)

        if _use_quadform():
            # q(X, Y) = power + log(op), expanded in tile-local pixel
            # coords: q = a0 + a1 X + a2 Y - 0.5 cxx X^2 - cxy XY
            #             - 0.5 cyy Y^2
            pxl = d[P_ROW_PX, :] - tile_x0
            pyl = d[P_ROW_PY, :] - tile_y0
            a1 = cxx * pxl + cxy * pyl
            a2 = cyy * pyl + cxy * pxl
            a0 = (
                -0.5 * (cxx * pxl * pxl + cyy * pyl * pyl)
                - cxy * pxl * pyl
                + logop
            )
            zero_c = jnp.zeros_like(a0)
            coef = jnp.concatenate(
                [
                    a0[:, None], a1[:, None], a2[:, None],
                    (-0.5 * cxx)[:, None], (-cxy)[:, None],
                    (-0.5 * cyy)[:, None], zero_c[:, None], zero_c[:, None],
                ],
                axis=1,
            )  # (PAIR_CHUNK, 8)
            q = jax.lax.dot_general(
                coef, basis, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (PAIR_CHUNK, TILE_PIX)
            if fast:
                alpha = jnp.minimum(ALPHA_MAX, _fexp2(q))
                gate = q <= logop[:, None] + jnp.float32(1e-2 * _LOG2E)
            else:
                alpha = jnp.minimum(ALPHA_MAX, jnp.exp(q))
                gate = q <= logop[:, None] + 1e-2
        else:
            # LOG_TPU_QUADFORM=0 fallback: plain VPU elementwise splat
            # evaluation (identical math, ~10 extra passes per chunk)
            dx = d[P_ROW_PX, :][:, None] - (tile_x0 + loc_x)
            dy = d[P_ROW_PY, :][:, None] - (tile_y0 + loc_y)
            power = (
                -0.5 * (cxx[:, None] * dx * dx + cyy[:, None] * dy * dy)
                - cxy[:, None] * dx * dy
            )
            if fast:  # conics pre-scaled by log2(e): power is base-2 already
                alpha = jnp.minimum(ALPHA_MAX, _fexp2(power + logop[:, None]))
            else:
                alpha = jnp.minimum(
                    ALPHA_MAX, jnp.exp(power + logop[:, None])
                )
            gate = power <= 0.0
        g_global = off0 + c * PAIR_CHUNK + g_iota
        in_range = (g_global >= start) & (g_global < start + count)
        # quadform gate: q <= logop <=> power <= 0 (the Inria in-ellipse
        # gate). Slack 1e-2: the exact form is PSD so power == 0 AT the
        # splat center — matmul noise (~1e-3) must not reject center
        # pixels (the clamp above already bounds alpha at ALPHA_MAX).
        alpha = jnp.where(
            gate & (alpha >= ALPHA_MIN) & in_range, alpha, 0.0,
        )

        one_minus = 1.0 - alpha
        if fast:
            # exact 0 where alpha == 0 (most lanes): kills the poly's
            # systematic ~3e-5 residual at m = 1 so empty lanes cannot
            # drift the accumulated transmittance
            log_om = jnp.where(alpha > 0.0, _flog2(one_minus), 0.0)
            cp_excl = _fexp2(
                jax.lax.dot_general(
                    ltri_strict.astype(jnp.bfloat16),
                    log_om.astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        else:
            log_om = jnp.log(one_minus)
            cp_excl = jnp.exp(
                jax.lax.dot_general(
                    ltri_strict.astype(jnp.bfloat16),
                    log_om.astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        cp_incl = cp_excl * one_minus
        t_after = trans * cp_incl
        w = trans * cp_excl * alpha
        w = jnp.where(t_after >= T_EPS, w, 0.0)

        rgb = jnp.concatenate(
            [col_r[:, None], col_g[:, None], col_b[:, None]], axis=1
        )
        color = color + jax.lax.dot_general(
            w.astype(jnp.bfloat16), rgb.astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        trans = trans * cp_incl[-1:, :]
        return c + 1, color, trans

    def chunk_cond(state):
        c, _, trans = state
        return (c < n_chunks) & (jnp.max(trans) >= T_EPS)

    init = (
        jnp.int32(0),
        jnp.zeros((TILE_PIX, 3), jnp.float32),
        jnp.ones((1, TILE_PIX), jnp.float32),
    )
    c_end, color, trans = jax.lax.while_loop(chunk_cond, chunk_body, init)

    @pl.when(c_end < n_chunks)
    def _():
        get_dma(c_end % 2, c_end).wait()

    bg = background_ref[0, :]
    final = color + trans[0, :][:, None] * bg[None, :]
    color_ref[:] = final.T.reshape(3, TILE_H, TILE_W)
    tfinal_ref[:] = trans.reshape(TILE_H, TILE_W)


def _run_forward_packed(pair_data, tile_start, tile_count, background,
                        tiles_x, tiles_y, interpret):
    num_tiles = tiles_x * tiles_y
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (3, TILE_H, TILE_W), lambda t, *_: (0, t // tiles_x, t % tiles_x)
            ),
            pl.BlockSpec((TILE_H, TILE_W), lambda t, *_: (t // tiles_x, t % tiles_x)),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, P_N_ROWS, PAIR_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_fwd_kernel_packed, tiles_x=tiles_x)
    out_shapes = (
        jax.ShapeDtypeStruct((3, tiles_y * TILE_H, tiles_x * TILE_W), jnp.float32),
        jax.ShapeDtypeStruct((tiles_y * TILE_H, tiles_x * TILE_W), jnp.float32),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(
        tile_start,
        tile_count,
        pair_data,
        background.reshape(1, 3).astype(jnp.float32),
    )


def render_pairs_packed(splats, colors, background, image_height, image_width,
                        max_pairs, active_prefix, interpret=False):
    """Inference render on the packed pair pipeline: expansion -> 6-payload
    sort -> (8, A) pack -> packed kernel. Returns (color, tfinal)."""
    es = expand_sort_pairs(
        splats, colors, image_height, image_width, max_pairs,
        runs_tail_only=True, active_prefix=active_prefix,
        interpret=interpret, inference_pack=True,
    )
    tile_s = es["tile_s"]
    num_tiles = es["num_tiles"]
    A = tile_s.shape[0]
    arange_t1 = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    starts = jnp.searchsorted(tile_s, arange_t1, side="left").astype(jnp.int32)
    if A % PACK_CHUNK == 0:
        pair_data = _pack_rows_impl(
            es["packed6"], interpret=interpret, n_out=P_N_ROWS
        )
    else:  # small/odd buckets (tests)
        pad = jnp.zeros((P_N_ROWS - len(es["packed6"]), A), jnp.float32)
        pair_data = jnp.concatenate(
            [jnp.stack(es["packed6"], axis=0), pad], axis=0
        )
        pair_data = jnp.pad(pair_data, ((0, 0), (0, PAIR_CHUNK)))
    color, tfinal = _run_forward_packed(
        pair_data, starts[:-1], starts[1:] - starts[:-1], background,
        es["tiles_x"], es["tiles_y"], interpret,
    )
    return color, tfinal, es["total"]


# --------------------------------------------------------------------------
# backward kernel
# --------------------------------------------------------------------------
def _bwd_kernel(
    tile_start_ref,
    tile_count_ref,
    cend_ref,  # (num_tiles,) i32: forward's per-tile early-exit chunk bound
    pair_hbm,  # (16, A + 128)
    tfinal_ref,  # (TILE_H, TILE_W) block
    dcolor_ref,  # (3, TILE_H, TILE_W) block
    dalpha_ref,  # (TILE_H, TILE_W) block
    background_ref,  # (1, 3)
    grad_init_hbm,  # (16, A + 128) ANY — aliased to pair_grad (zeros)
    pair_grad_hbm,  # (16, A + 128): rows 0..8 = d[px,py,cxx,cxy,cyy,opac,r,g,b]
    buf,
    gbuf,
    rbuf,
    sems,
    gsem,
    *,
    tiles_x: int,
):
    t = pl.program_id(0)
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    off0 = pl.multiple_of((start // PAIR_CHUNK) * PAIR_CHUNK, PAIR_CHUNK)
    # clamp to the forward's saturation early-exit: pairs beyond it have
    # w == 0 AND a zero u-suffix, so their gradients are exactly the zeros
    # the aliased grad buffer is initialized with — skipping them computes
    # the same cotangent the truncated forward defines (chunk bases match:
    # both kernels count chunks from the same off0)
    n_chunks = jnp.minimum(
        pl.cdiv(start + count - off0, PAIR_CHUNK), cend_ref[t]
    )

    tile_y = t // tiles_x
    tile_x = t - tile_y * tiles_x
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_PIX), 1)
    pix_x = (tile_x * TILE_W + lane % TILE_W).astype(jnp.float32)
    pix_y = (tile_y * TILE_H + lane // TILE_W).astype(jnp.float32)

    t_final = tfinal_ref[...].reshape(1, TILE_PIX)
    dC = dcolor_ref[...].reshape(3, TILE_PIX)
    g_alpha = dalpha_ref[...].reshape(1, TILE_PIX)
    bg = background_ref[0, :]
    bg_dot_dC = (
        bg[0] * dC[0:1, :] + bg[1] * dC[1:2, :] + bg[2] * dC[2:3, :]
    )

    def get_dma(slot, c):
        off = pl.multiple_of(off0 + c * PAIR_CHUNK, PAIR_CHUNK)
        return pltpu.make_async_copy(
            pair_hbm.at[:, pl.ds(off, PAIR_CHUNK)], buf.at[slot], sems.at[slot]
        )

    @pl.when(n_chunks > 0)
    def _():
        get_dma(0, n_chunks - 1).start()

    row_idx = jax.lax.broadcasted_iota(jnp.int32, (PAIR_CHUNK, PAIR_CHUNK), 0)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (PAIR_CHUNK, PAIR_CHUNK), 1)
    utri_incl = (col_idx >= row_idx).astype(jnp.float32)
    utri_strict = (col_idx > row_idx).astype(jnp.float32)
    g_iota = jax.lax.broadcasted_iota(jnp.int32, (PAIR_CHUNK, 1), 0)

    def chunk_body(state):
        k, t_run, u_run = state
        c = n_chunks - 1 - k
        slot = k % 2

        @pl.when(k + 1 < n_chunks)
        def _():
            get_dma((k + 1) % 2, c - 1).start()

        get_dma(slot, c).wait()
        d = buf[slot]

        dx = d[ROW_PX, :][:, None] - pix_x
        dy = d[ROW_PY, :][:, None] - pix_y
        fast = _use_fastexp()
        if fast:
            # same base-2 experiment path as the forward kernel; gradient
            # formulas below stay in NATURAL power space (dl_dpower =
            # dl_da * a_unc and the d_c**/d_p* chains use the RAW conic
            # rows), which is exact: d(2^(x*log2e))/dx == 2^(x*log2e),
            # independent of the base used to evaluate the exponential
            s = jnp.float32(_LOG2E)
            power = (
                -0.5
                * ((s * d[ROW_CXX, :])[:, None] * dx * dx
                   + (s * d[ROW_CYY, :])[:, None] * dy * dy)
                - (s * d[ROW_CXY, :])[:, None] * dx * dy
            )
            g_exp = _fexp2(power)
        else:
            power = (
                -0.5
                * (d[ROW_CXX, :][:, None] * dx * dx
                   + d[ROW_CYY, :][:, None] * dy * dy)
                - d[ROW_CXY, :][:, None] * dx * dy
            )
            g_exp = jnp.exp(power)
        a_unc = d[ROW_OPAC, :][:, None] * g_exp
        alpha = jnp.minimum(ALPHA_MAX, a_unc)
        g_global = off0 + c * PAIR_CHUNK + g_iota
        in_range = (g_global >= start) & (g_global < start + count)
        cond = (power <= 0.0) & (alpha >= ALPHA_MIN) & in_range
        alpha = jnp.where(cond, alpha, 0.0)
        one_minus = 1.0 - alpha

        if fast:
            log_om = jnp.where(alpha > 0.0, _flog2(one_minus), 0.0)
        else:
            log_om = jnp.log(one_minus)
        log_p = jax.lax.dot_general(
            utri_incl, log_om,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        p_suffix = _fexp2(log_p) if fast else jnp.exp(log_p)
        t_i = t_run / p_suffix
        w = alpha * t_i
        t_after = t_i * one_minus
        mask = (t_after >= T_EPS).astype(jnp.float32)
        w_m = w * mask

        cdot = (
            d[ROW_R, :][:, None] * dC[0:1, :]
            + d[ROW_G, :][:, None] * dC[1:2, :]
            + d[ROW_B, :][:, None] * dC[2:3, :]
        )
        v = w_m * cdot
        u_i = u_run + jax.lax.dot_general(
            utri_strict, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dl_da = mask * t_i * cdot - u_i / one_minus

        gate = (cond & (a_unc < ALPHA_MAX)).astype(jnp.float32)
        dl_da_g = dl_da * gate
        d_opac = jnp.sum(dl_da_g * g_exp, axis=1)
        dl_dpower = dl_da_g * a_unc
        d_cxx = jnp.sum(dl_dpower * (-0.5 * dx * dx), axis=1)
        d_cxy = jnp.sum(dl_dpower * (-dx * dy), axis=1)
        d_cyy = jnp.sum(dl_dpower * (-0.5 * dy * dy), axis=1)
        d_px = jnp.sum(
            dl_dpower
            * (-(d[ROW_CXX, :][:, None] * dx + d[ROW_CXY, :][:, None] * dy)),
            axis=1,
        )
        d_py = jnp.sum(
            dl_dpower
            * (-(d[ROW_CYY, :][:, None] * dy + d[ROW_CXY, :][:, None] * dx)),
            axis=1,
        )
        d_r = jnp.sum(w_m * dC[0:1, :], axis=1)
        d_g = jnp.sum(w_m * dC[1:2, :], axis=1)
        d_b = jnp.sum(w_m * dC[2:3, :], axis=1)
        zeros = jnp.zeros_like(d_r)
        grads = jnp.stack(
            [d_px, d_py, d_cxx, d_cxy, d_cyy, d_opac, d_r, d_g, d_b,
             zeros, zeros, zeros, zeros, zeros, zeros, zeros],
            axis=0,
        )
        off = pl.multiple_of(off0 + c * PAIR_CHUNK, PAIR_CHUNK)
        boundary = (c == 0) | (c == n_chunks - 1)

        @pl.when(boundary)
        def _():
            rd = pltpu.make_async_copy(
                pair_grad_hbm.at[:, pl.ds(off, PAIR_CHUNK)], rbuf, gsem
            )
            rd.start()
            rd.wait()
            gbuf[:] = rbuf[...] + grads
            wr = pltpu.make_async_copy(
                gbuf, pair_grad_hbm.at[:, pl.ds(off, PAIR_CHUNK)], gsem
            )
            wr.start()
            wr.wait()

        @pl.when(jnp.logical_not(boundary))
        def _():
            gbuf[:] = grads
            wr = pltpu.make_async_copy(
                gbuf, pair_grad_hbm.at[:, pl.ds(off, PAIR_CHUNK)], gsem
            )
            wr.start()
            wr.wait()

        t_run = t_run / p_suffix[0:1, :]
        u_run = u_run + jnp.sum(v, axis=0, keepdims=True)
        return k + 1, t_run, u_run

    def chunk_cond(state):
        return state[0] < n_chunks

    u0 = t_final * bg_dot_dC - g_alpha * t_final
    jax.lax.while_loop(chunk_cond, chunk_body, (jnp.int32(0), t_final, u0))


def _run_backward(pair_data, tile_start, tile_count, cend, tfinal, dcolor,
                  dalpha, background, tiles_x, tiles_y, interpret):
    num_tiles = tiles_x * tiles_y
    A = pair_data.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((TILE_H, TILE_W), lambda t, *_: (t // tiles_x, t % tiles_x)),
            pl.BlockSpec(
                (3, TILE_H, TILE_W), lambda t, *_: (0, t // tiles_x, t % tiles_x)
            ),
            pl.BlockSpec((TILE_H, TILE_W), lambda t, *_: (t // tiles_x, t % tiles_x)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),),
        scratch_shapes=[
            pltpu.VMEM((2, N_ROWS, PAIR_CHUNK), jnp.float32),
            pltpu.VMEM((N_ROWS, PAIR_CHUNK), jnp.float32),
            pltpu.VMEM((N_ROWS, PAIR_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(_bwd_kernel, tiles_x=tiles_x)
    grad_init = jnp.zeros((N_ROWS, A), jnp.float32)
    (pair_grad,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((N_ROWS, A), jnp.float32),),
        interpret=interpret,
        input_output_aliases={8: 0},  # grad_init -> pair_grad (index incl. prefetch args)
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        tile_start,
        tile_count,
        cend.reshape(-1),
        pair_data,
        tfinal,
        dcolor,
        dalpha,
        background.reshape(1, 3).astype(jnp.float32),
        grad_init,
    )
    return pair_grad


# --------------------------------------------------------------------------
# differentiable core (custom VJP around the kernels)
# --------------------------------------------------------------------------
@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _raster_core(pair_data, tile_start, tile_count, background,
                 tiles_x, tiles_y, with_stats, interpret):
    return _run_forward(pair_data, tile_start, tile_count, background,
                        tiles_x, tiles_y, with_stats, interpret)


def _raster_core_fwd(pair_data, tile_start, tile_count, background,
                     tiles_x, tiles_y, with_stats, interpret):
    out = _run_forward(pair_data, tile_start, tile_count, background,
                       tiles_x, tiles_y, with_stats, interpret)
    color, tfinal, pid, pwp, pair_w, cend = out
    residuals = (pair_data, tile_start, tile_count, background, tfinal,
                 cend)
    return out, residuals


def _zero_if_float0(ct, shape):
    if ct is None or (hasattr(ct, "dtype") and ct.dtype == jax.dtypes.float0):
        return jnp.zeros(shape, jnp.float32)
    return ct


def _raster_core_bwd(tiles_x, tiles_y, with_stats, interpret, residuals, cts):
    pair_data, tile_start, tile_count, background, tfinal, cend = residuals
    d_color, d_tfinal, _d_pid, _d_pwp, _d_pairw, _d_cend = cts
    d_color = _zero_if_float0(d_color, (3,) + tfinal.shape)
    d_tfinal = _zero_if_float0(d_tfinal, tfinal.shape)
    # public alpha output = 1 - tfinal, so its cotangent is -d_tfinal here
    pair_grad = _run_backward(
        pair_data, tile_start, tile_count, cend, tfinal, d_color, -d_tfinal,
        background, tiles_x, tiles_y, interpret,
    )
    d_bg = jnp.stack([
        jnp.sum(tfinal * d_color[0]),
        jnp.sum(tfinal * d_color[1]),
        jnp.sum(tfinal * d_color[2]),
    ])
    return pair_grad, None, None, d_bg


_raster_core.defvjp(_raster_core_fwd, _raster_core_bwd)


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------
@partial(
    jax.jit,
    static_argnames=(
        "image_height",
        "image_width",
        "mode",
        "use_filter",
        "max_pairs",
        "with_stats",
        "interpret",
        "tight_radius",
        "runs_tail_only",
    ),
)
def rasterize_tiled(
    xyz,
    colors,
    opacity,
    scaling,
    rotation,
    means2d_offset,
    world_view,
    full_proj,
    focal_x,
    focal_y,
    tan_fovx,
    tan_fovy,
    background,
    image_height: int,
    image_width: int,
    active_mask=None,
    mode: str = "antialias",
    use_filter: bool = True,
    max_pairs: int = 1 << 20,
    with_stats: bool = True,
    interpret: bool | None = None,
    tight_radius: bool = False,
    runs_tail_only: bool = False,
    prefix_mask=None,
    gid_ids=None,
):
    """Same output contract as rasterize_ref.rasterize.

    gid_ids: optional (P,) int32 — caller ids for the per-gaussian stat
    rows (must be < P, out-of-range drops); stats then land directly in
    the caller's index space (used by the compacted check render).

    runs_tail_only: promise that the lanes bearing pairs form a PREFIX
    (compacted caller slices) — routes the pair expansion to the Pallas
    MXU kernel. When active_mask has interior holes (e.g. a post-
    compaction weight cull), pass the pure compaction prefix separately
    as prefix_mask; holed lanes then emit one sanitized zero-alpha pair
    so zero-count runs stay tail-only.
    """
    if interpret is None:
        interpret = _interpret_default()
    splats = project_gaussians(
        xyz, scaling, rotation, opacity, world_view, full_proj,
        focal_x, focal_y, tan_fovx, tan_fovy, image_height, image_width,
        mode=mode, use_filter=use_filter, means2d_offset=means2d_offset,
        active_mask=active_mask, tight_radius=tight_radius,
    )
    pairs = build_pairs(
        splats, colors, image_height, image_width, max_pairs,
        runs_tail_only=runs_tail_only,
        active_prefix=prefix_mask if prefix_mask is not None else active_mask,
        interpret=interpret, gid_ids=gid_ids,
    )
    color, tfinal, pid_pair, pwp, pair_w, _cend = _raster_core(
        pairs["pair_data"],
        pairs["tile_start"],
        pairs["tile_count"],
        background,
        pairs["tiles_x"],
        pairs["tiles_y"],
        with_stats,
        interpret,
    )
    H, W = image_height, image_width
    A = pairs["pair_gid"].shape[0]
    color = color[:, :H, :W]
    tfinal = tfinal[:H, :W]
    pwp = pwp[:H, :W]
    P = xyz.shape[0]
    # pid_pair holds the argmax contributor's caller gaussian id directly
    # (the kernel reads it from pair_data ROW_GID — no pair->gid gather).
    pid_pair = pid_pair[:H, :W]
    if with_stats:
        if with_stats is True:
            pid = jnp.where((pid_pair >= 0) & (pid_pair < P), pid_pair, -1)
        else:  # "weights": per-point weights only, no pixel ownership map
            pid = jnp.full((H, W), -1, jnp.int32)
        # per-gaussian max blend weight: segment-max of pair weights by gid
        point_weight = (
            jnp.zeros((P + 1,), jnp.float32)
            .at[jnp.clip(pairs["pair_gid"], 0, P)]
            .max(pair_w[0, :A], mode="drop")[:P]
        )
    else:
        # pure-render path: the pair->gaussian mapping is an H*W gather
        # (XLA TPU serializes gathers, ~9 ms/M pixels) for outputs no
        # renderer consumes — skip it.
        pid = jnp.full((H, W), -1, jnp.int32)
        point_weight = jnp.zeros((P,), jnp.float32)
    radii = jnp.where(pairs["valid"], pairs["radius"], 0.0)
    return {
        "render": color,
        "radii": radii.astype(jnp.int32),
        "point_id_pixel": pid,
        "point_weight_pixel": pwp,
        "point_weight": point_weight,
        "alpha": 1.0 - tfinal,
        "depth_cam": splats.depth,
    }
