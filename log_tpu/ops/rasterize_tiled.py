"""Tiled Pallas rasterizer — the production render path.

Replaces the CUDA diff-gaussian-rasterization fork (SURVEY.md §2.9) with a
TPU-native pipeline:

  1. **Projection** (jnp, fused elementwise): shared `project_gaussians`.
  2. **Depth ordering** (XLA sort over gaussians, N keys).
  3. **Pair expansion** (jnp): each gaussian emits one record per overlapped
     16x16 tile via `jnp.repeat(..., total_repeat_length=MAX_PAIRS)` with a
     sentinel tail; a single *stable* sort by tile id then yields per-tile
     depth-ordered runs (gaussians were pre-sorted by depth).
  4. **Per-tile compositing** (Pallas): sequential grid over tiles; each tile
     streams its pair run from HBM in chunks (double-buffered DMA), evaluates
     alphas for (chunk, 256) pixel lanes on the VPU, does the front-to-back
     recurrence with a cumprod along the chunk axis, accumulates color with a
     (256, chunk) x (chunk, 3) MXU matmul, and early-exits once every pixel
     saturates. Side outputs (argmax contributor id, per-pixel max blend
     weight, per-pair max weight) feed densification statistics
     (LoG/model/counter.py:36-68).
  5. **Backward** (Pallas, custom VJP): back-to-front recomputation per tile
     (the Inria recipe) emitting *per-pair* gradients; the cotangent flows
     back through the jnp pair-gather, so XLA's scatter-add performs the
     per-gaussian segment reduction — no atomics needed.

Pair records are packed lane-major as (12, MAX_PAIRS) f32 so a chunk load is a
(12, G) tile with G on the 128-wide lane axis.
"""
from __future__ import annotations

import functools
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .projection import ALPHA_MAX, ALPHA_MIN, T_EPS, project_gaussians

# Tile geometry: (8, 128) pixels — exactly one f32 VPU register tile, and the
# minimum legal Mosaic output block. Bigger tiles also mean FEWER pairs for
# large splats (the sort is the scaling cost, VPU lanes are cheap).
TILE_H = 8
TILE_W = 128
TILE_PIX = TILE_H * TILE_W  # 1024 pixel lanes per tile
# PAIR_CHUNK must equal the 128-lane HBM tiling: every tile's pair run is
# padded to a 128-aligned start/length so chunk DMAs are tiling-aligned.
PAIR_CHUNK = 128
# pair record rows in the packed (N_ROWS, A) array; 16 rows = 2 sublane tiles
ROW_PX, ROW_PY, ROW_CXX, ROW_CXY, ROW_CYY, ROW_OPAC = 0, 1, 2, 3, 4, 5
ROW_R, ROW_G, ROW_B, ROW_DEPTH = 6, 7, 8, 9
N_ROWS = 16


def _is_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _interpret_default() -> bool:
    return not _is_tpu()


# --------------------------------------------------------------------------
# Stage 2+3: binning
# --------------------------------------------------------------------------
def aligned_capacity(max_pairs: int, num_tiles: int) -> int:
    """Static capacity of the aligned pair array."""
    return max_pairs + num_tiles * PAIR_CHUNK


def build_pairs(splats, colors, image_height, image_width, max_pairs):
    """Depth-sort, expand (gaussian, tile) pairs, stable-sort by tile.

    Returns dict with packed pair data, per-tile (start, count) tables, and
    the depth-sort permutation (for mapping outputs back to input slots).
    """
    P = splats.opacity.shape[0]
    tiles_x = pl.cdiv(image_width, TILE_W)
    tiles_y = pl.cdiv(image_height, TILE_H)
    num_tiles = tiles_x * tiles_y

    depth_key = jnp.where(splats.valid, splats.depth, jnp.inf)
    order = jnp.argsort(depth_key)  # depth-ascending gaussian slots

    px = splats.pix_xy[order]
    conic = splats.conic[order]
    opac = splats.opacity[order]
    cols = colors[order]
    radius = splats.radius[order]
    depth = splats.depth[order]
    valid = splats.valid[order] & (radius > 0)

    # tile rectangle (Inria getRect semantics)
    x0 = jnp.clip(((px[:, 0] - radius) / TILE_W).astype(jnp.int32), 0, tiles_x)
    y0 = jnp.clip(((px[:, 1] - radius) / TILE_H).astype(jnp.int32), 0, tiles_y)
    x1 = jnp.clip(
        ((px[:, 0] + radius + TILE_W - 1) / TILE_W).astype(jnp.int32), 0, tiles_x
    )
    y1 = jnp.clip(
        ((px[:, 1] + radius + TILE_H - 1) / TILE_H).astype(jnp.int32), 0, tiles_y
    )
    rect_w = jnp.maximum(x1 - x0, 0)
    n_tiles_g = jnp.where(valid, rect_w * jnp.maximum(y1 - y0, 0), 0)

    offsets = jnp.cumsum(n_tiles_g) - n_tiles_g  # exclusive
    total = offsets[-1] + n_tiles_g[-1]
    total_c = jnp.minimum(total, max_pairs)
    # sentinel tail fills [total_c, max_pairs)
    counts_ext = jnp.concatenate(
        [n_tiles_g, jnp.maximum(max_pairs - total_c, 0)[None]]
    )
    gid_ext = jnp.arange(P + 1, dtype=jnp.int32)
    pair_gid = jnp.repeat(gid_ext, counts_ext, total_repeat_length=max_pairs)
    offsets_ext = jnp.concatenate([offsets, total_c[None]])
    k = jnp.arange(max_pairs, dtype=jnp.int32) - offsets_ext[pair_gid]
    is_real = pair_gid < P
    g_safe = jnp.minimum(pair_gid, P - 1)
    w_safe = jnp.maximum(rect_w[g_safe], 1)
    tx = x0[g_safe] + k % w_safe
    ty = y0[g_safe] + k // w_safe
    tile_id = jnp.where(is_real, ty * tiles_x + tx, num_tiles)

    tile_id_sorted, pair_gid_sorted = jax.lax.sort(
        (tile_id, pair_gid), num_keys=1, is_stable=True
    )

    tile_start = jnp.searchsorted(
        tile_id_sorted, jnp.arange(num_tiles, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    tile_end = jnp.searchsorted(
        tile_id_sorted, jnp.arange(num_tiles, dtype=jnp.int32), side="right"
    ).astype(jnp.int32)
    tile_count = tile_end - tile_start

    # Re-pack each tile's run at a PAIR_CHUNK-aligned start so every chunk
    # DMA in the kernel is aligned to the (8, 128) HBM tiling. Formulated as
    # a GATHER from the sorted pair list (dest -> src), never a scatter —
    # XLA TPU serializes scatters (~8.7 s for 2M rows) but gathers run at
    # memory bandwidth. Padding lanes read out-of-range -> zero (inert).
    A = aligned_capacity(max_pairs, num_tiles)
    padded_count = ((tile_count + PAIR_CHUNK - 1) // PAIR_CHUNK) * PAIR_CHUNK
    aligned_start = (jnp.cumsum(padded_count) - padded_count).astype(jnp.int32)
    dest_tile = jnp.repeat(
        jnp.arange(num_tiles + 1, dtype=jnp.int32),
        jnp.concatenate(
            [padded_count, (A - jnp.sum(padded_count))[None]]
        ),
        total_repeat_length=A,
    )
    dt_safe = jnp.minimum(dest_tile, num_tiles - 1)
    j = jnp.arange(A, dtype=jnp.int32) - aligned_start[dt_safe]
    src = jnp.where(
        (dest_tile < num_tiles) & (j < tile_count[dt_safe]),
        tile_start[dt_safe] + j,
        max_pairs,  # out-of-range -> fill
    )

    g_src = pair_gid_sorted.at[src].get(mode="fill", fill_value=P)
    g2 = jnp.minimum(g_src, P - 1)
    real = g_src < P
    # Every row masked by `real` USING where(): padding slots must be zero
    # records forward (inert alpha), and in the VJP where() *selects* the
    # cotangent (a multiply-mask would turn the grad kernel's unwritten-tail
    # garbage — possibly NaN — into 0*NaN=NaN and poison real gaussians).
    def msk(v):
        return jnp.where(real, v, 0.0)

    pair_data = jnp.stack(
        [
            msk(px[g2, 0]),
            msk(px[g2, 1]),
            msk(conic[g2, 0]),
            msk(conic[g2, 1]),
            msk(conic[g2, 2]),
            msk(opac[g2]),
            msk(cols[g2, 0]),
            msk(cols[g2, 1]),
            msk(cols[g2, 2]),
            msk(depth[g2]),
            jnp.zeros((A,), jnp.float32),
            jnp.zeros((A,), jnp.float32),
            jnp.zeros((A,), jnp.float32),
            jnp.zeros((A,), jnp.float32),
            jnp.zeros((A,), jnp.float32),
            jnp.zeros((A,), jnp.float32),
        ],
        axis=0,
    )
    pair_gid = jnp.where(real, g2, P).astype(jnp.int32)
    return {
        "pair_data": pair_data,  # (N_ROWS, A) f32, tile runs 128-aligned
        "pair_gid": pair_gid,  # (A,) depth-sorted slot ids, P = padding
        "tile_start": aligned_start,
        "tile_count": padded_count.astype(jnp.int32),
        "order": order,
        "tiles_x": tiles_x,
        "tiles_y": tiles_y,
        "radius": radius,
        "valid": valid,
    }


# --------------------------------------------------------------------------
# Stage 4: forward kernel
# --------------------------------------------------------------------------
def _fwd_kernel(
    # scalar prefetch
    tile_start_ref,
    tile_count_ref,
    # inputs
    pair_hbm,  # (12, MAX_PAIRS) in ANY/HBM
    background_ref,  # (1, 3) VMEM
    # outputs (per-tile blocks)
    color_ref,  # (3, TILE, TILE)
    tfinal_ref,  # (TILE, TILE)
    pid_ref,  # (TILE, TILE) int32 — argmax PAIR slot (-1 empty)
    pwp_ref,  # (TILE, TILE)
    # hbm pair output
    pair_w_hbm,  # (1, MAX_PAIRS) per-pair max blend weight
    # scratch
    buf,  # (2, 12, PAIR_CHUNK) pair staging
    wbuf,  # (1, PAIR_CHUNK) per-pair weight staging
    sems,  # DMA semaphores (2,)
    wsem,
    *,
    tiles_x: int,
    with_stats: bool,
):
    t = pl.program_id(0)
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    n_chunks = pl.cdiv(count, PAIR_CHUNK)

    tile_y = t // tiles_x
    tile_x = t - tile_y * tiles_x
    # pixel coordinates of this tile, flattened (1, 256)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_PIX), 1)
    pix_x = (tile_x * TILE_W + lane % TILE_W).astype(jnp.float32)
    pix_y = (tile_y * TILE_H + lane // TILE_W).astype(jnp.float32)

    def get_dma(slot, c):
        off = pl.multiple_of(start + c * PAIR_CHUNK, PAIR_CHUNK)
        return pltpu.make_async_copy(
            pair_hbm.at[:, pl.ds(off, PAIR_CHUNK)], buf.at[slot], sems.at[slot]
        )

    @pl.when(n_chunks > 0)
    def _():
        get_dma(0, 0).start()

    def chunk_body(state):
        c, color, trans, best_w, best_id = state
        slot = c % 2

        @pl.when(c + 1 < n_chunks)
        def _():
            get_dma((c + 1) % 2, c + 1).start()

        get_dma(slot, c).wait()
        d = buf[slot]  # (12, PAIR_CHUNK)

        # alpha: (PAIR_CHUNK, TILE_PIX)
        dx = d[ROW_PX, :][:, None] - pix_x  # (G, 256)
        dy = d[ROW_PY, :][:, None] - pix_y
        power = (
            -0.5
            * (d[ROW_CXX, :][:, None] * dx * dx + d[ROW_CYY, :][:, None] * dy * dy)
            - d[ROW_CXY, :][:, None] * dx * dy
        )
        alpha = jnp.minimum(ALPHA_MAX, d[ROW_OPAC, :][:, None] * jnp.exp(power))
        # mask tail lanes beyond `count`
        g_idx = jax.lax.broadcasted_iota(jnp.int32, (PAIR_CHUNK, 1), 0)
        in_range = (c * PAIR_CHUNK + g_idx) < count
        alpha = jnp.where(
            (power <= 0.0) & (alpha >= ALPHA_MIN) & in_range, alpha, 0.0
        )

        one_minus = 1.0 - alpha
        # inclusive cumprod along the chunk axis via the MXU:
        # exp(L @ log(x)) with L lower-triangular ones (alpha <= 0.99 so
        # log stays finite)
        row = jax.lax.broadcasted_iota(jnp.int32, (PAIR_CHUNK, PAIR_CHUNK), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (PAIR_CHUNK, PAIR_CHUNK), 1)
        ltri = (row >= col).astype(jnp.float32)
        cp_incl = jnp.exp(
            jax.lax.dot_general(
                ltri,
                jnp.log(one_minus),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
        cp_excl = cp_incl / one_minus
        t_after = trans * cp_incl  # trans: (1, 256)
        w = trans * cp_excl * alpha
        w = jnp.where(t_after >= T_EPS, w, 0.0)

        rgb = jnp.concatenate(
            [d[ROW_R, :][:, None], d[ROW_G, :][:, None], d[ROW_B, :][:, None]],
            axis=1,
        )  # (G, 3)
        color = color + jax.lax.dot_general(
            w,
            rgb,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (256, 3)
        trans = trans * cp_incl[-1:, :]

        cw = jnp.max(w, axis=0, keepdims=True)  # (1, 256)
        if with_stats:
            # chunk-local argmax PAIR slot via masked max over the row iota
            # (ties -> later pair); global pair index = start + c*G + slot
            pos = jnp.max(
                jnp.where((w == cw) & (cw > 0.0), g_idx, -1), axis=0,
                keepdims=True,
            )
            cid = jnp.where(pos >= 0, start + c * PAIR_CHUNK + pos, -1)
            take = cw > best_w
            best_w = jnp.where(take, cw, best_w)
            best_id = jnp.where(take, cid, best_id)
            # per-pair max weight over this tile's pixels -> HBM
            wbuf[:] = jnp.max(w, axis=1)[None, :]
            off = pl.multiple_of(start + c * PAIR_CHUNK, PAIR_CHUNK)
            out_dma = pltpu.make_async_copy(
                wbuf, pair_w_hbm.at[:, pl.ds(off, PAIR_CHUNK)], wsem
            )
            out_dma.start()
            out_dma.wait()
        return c + 1, color, trans, best_w, best_id

    def chunk_cond(state):
        c, _, trans, _, _ = state
        in_bounds = c < n_chunks
        if with_stats:
            # stats mode writes per-pair weights: every chunk must run
            return in_bounds
        return in_bounds & (jnp.max(trans) >= T_EPS)

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
    # drain any in-flight DMA for the chunk that the early exit skipped
    @pl.when(c_end < n_chunks)
    def _():
        get_dma(c_end % 2, c_end).wait()

    bg = background_ref[0, :]  # (3,)
    final = color + trans[0, :][:, None] * bg[None, :]
    color_ref[:] = final.T.reshape(3, TILE_H, TILE_W)
    tfinal_ref[:] = trans.reshape(TILE_H, TILE_W)
    pid_ref[:] = best_id.reshape(TILE_H, TILE_W)
    pwp_ref[:] = best_w.reshape(TILE_H, TILE_W)


def _run_forward(pair_data, tile_start, tile_count, background,
                 tiles_x, tiles_y, with_stats, interpret):
    num_tiles = tiles_x * tiles_y
    A = pair_data.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (3, TILE_H, TILE_W),
                lambda t, *_: (0, t // tiles_x, t % tiles_x),
            ),
            pl.BlockSpec((TILE_H, TILE_W), lambda t, *_: (t // tiles_x, t % tiles_x)),
            pl.BlockSpec((TILE_H, TILE_W), lambda t, *_: (t // tiles_x, t % tiles_x)),
            pl.BlockSpec((TILE_H, TILE_W), lambda t, *_: (t // tiles_x, t % tiles_x)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, N_ROWS, PAIR_CHUNK), jnp.float32),
            pltpu.VMEM((1, PAIR_CHUNK), jnp.float32),
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
        jax.ShapeDtypeStruct((1, A), jnp.float32),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        tile_start,
        tile_count,
        pair_data,
        background.reshape(1, 3).astype(jnp.float32),
    )


# --------------------------------------------------------------------------
# Stage 5: backward kernel (per-pair gradients, back-to-front recompute)
# --------------------------------------------------------------------------
def _bwd_kernel(
    # scalar prefetch
    tile_start_ref,
    tile_count_ref,
    # inputs
    pair_hbm,  # (N_ROWS, A)
    tfinal_ref,  # (TILE_H, TILE_W) block — final transmittance of this tile
    dcolor_ref,  # (3, TILE_H, TILE_W) block — cotangent of the color image
    dalpha_ref,  # (TILE_H, TILE_W) block — cotangent of the (1 - T) map
    background_ref,  # (1, 3)
    # outputs
    pair_grad_hbm,  # (N_ROWS, A): rows 0..8 = d[px,py,cxx,cxy,cyy,opac,r,g,b]
    # scratch
    buf,
    gbuf,
    sems,
    gsem,
    *,
    tiles_x: int,
):
    t = pl.program_id(0)
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    n_chunks = count // PAIR_CHUNK  # counts are chunk-padded

    tile_y = t // tiles_x
    tile_x = t - tile_y * tiles_x
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_PIX), 1)
    pix_x = (tile_x * TILE_W + lane % TILE_W).astype(jnp.float32)
    pix_y = (tile_y * TILE_H + lane // TILE_W).astype(jnp.float32)

    t_final = tfinal_ref[...].reshape(1, TILE_PIX)
    dC = dcolor_ref[...].reshape(3, TILE_PIX)  # (3, 1024)
    g_alpha = dalpha_ref[...].reshape(1, TILE_PIX)
    bg = background_ref[0, :]
    bg_dot_dC = (
        bg[0] * dC[0:1, :] + bg[1] * dC[1:2, :] + bg[2] * dC[2:3, :]
    )  # (1, 1024)

    def get_dma(slot, c):
        off = pl.multiple_of(start + c * PAIR_CHUNK, PAIR_CHUNK)
        return pltpu.make_async_copy(
            pair_hbm.at[:, pl.ds(off, PAIR_CHUNK)], buf.at[slot], sems.at[slot]
        )

    @pl.when(n_chunks > 0)
    def _():
        get_dma(0, n_chunks - 1).start()

    row = jax.lax.broadcasted_iota(jnp.int32, (PAIR_CHUNK, PAIR_CHUNK), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (PAIR_CHUNK, PAIR_CHUNK), 1)
    utri_incl = (col >= row).astype(jnp.float32)  # suffix product matrix
    utri_strict = (col > row).astype(jnp.float32)  # strict suffix sum

    def chunk_body(state):
        k, t_run, u_run = state  # k counts processed chunks (from the back)
        c = n_chunks - 1 - k
        slot = k % 2

        @pl.when(k + 1 < n_chunks)
        def _():
            get_dma((k + 1) % 2, c - 1).start()

        get_dma(slot, c).wait()
        d = buf[slot]

        dx = d[ROW_PX, :][:, None] - pix_x
        dy = d[ROW_PY, :][:, None] - pix_y
        power = (
            -0.5
            * (d[ROW_CXX, :][:, None] * dx * dx + d[ROW_CYY, :][:, None] * dy * dy)
            - d[ROW_CXY, :][:, None] * dx * dy
        )
        g_exp = jnp.exp(power)
        a_unc = d[ROW_OPAC, :][:, None] * g_exp
        alpha = jnp.minimum(ALPHA_MAX, a_unc)
        cond = (power <= 0.0) & (alpha >= ALPHA_MIN)
        alpha = jnp.where(cond, alpha, 0.0)
        one_minus = 1.0 - alpha

        # T before each pair: T_i = t_run / P_i, P_i = prod_{j>=i}(1 - a_j)
        log_p = jax.lax.dot_general(
            utri_incl, jnp.log(one_minus),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        p_suffix = jnp.exp(log_p)
        t_i = t_run / p_suffix
        w = alpha * t_i
        t_after = t_i * one_minus
        mask = (t_after >= T_EPS).astype(jnp.float32)
        w_m = w * mask

        cdot = (
            d[ROW_R, :][:, None] * dC[0:1, :]
            + d[ROW_G, :][:, None] * dC[1:2, :]
            + d[ROW_B, :][:, None] * dC[2:3, :]
        )  # (G, 1024) c_i . dC per pixel
        v = w_m * cdot
        u_i = u_run + jax.lax.dot_general(
            utri_strict, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dl_da = mask * t_i * cdot - u_i / one_minus

        # chain rule to pair parameters (gated like the forward min/cutoffs)
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
        gbuf[:] = jnp.stack(
            [d_px, d_py, d_cxx, d_cxy, d_cyy, d_opac, d_r, d_g, d_b,
             zeros, zeros, zeros, zeros, zeros, zeros, zeros],
            axis=0,
        )
        off = pl.multiple_of(start + c * PAIR_CHUNK, PAIR_CHUNK)
        out_dma = pltpu.make_async_copy(
            gbuf, pair_grad_hbm.at[:, pl.ds(off, PAIR_CHUNK)], gsem
        )
        out_dma.start()
        out_dma.wait()

        t_run = t_run / p_suffix[0:1, :]  # T before this chunk
        u_run = u_run + jnp.sum(v, axis=0, keepdims=True)
        return k + 1, t_run, u_run

    def chunk_cond(state):
        k, _, _ = state
        return k < n_chunks

    # U starts with the background + alpha-map terms:
    #   dL/da_i -= (T_N (bg.dC) - g_alpha T_N) / (1 - a_i)
    u0 = t_final * bg_dot_dC - g_alpha * t_final
    jax.lax.while_loop(
        chunk_cond, chunk_body, (jnp.int32(0), t_final, u0)
    )


def _run_backward(pair_data, tile_start, tile_count, tfinal, dcolor, dalpha,
                  background, tiles_x, tiles_y, interpret):
    num_tiles = tiles_x * tiles_y
    A = pair_data.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((TILE_H, TILE_W), lambda t, *_: (t // tiles_x, t % tiles_x)),
            pl.BlockSpec(
                (3, TILE_H, TILE_W), lambda t, *_: (0, t // tiles_x, t % tiles_x)
            ),
            pl.BlockSpec((TILE_H, TILE_W), lambda t, *_: (t // tiles_x, t % tiles_x)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.ANY),),
        scratch_shapes=[
            pltpu.VMEM((2, N_ROWS, PAIR_CHUNK), jnp.float32),
            pltpu.VMEM((N_ROWS, PAIR_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(_bwd_kernel, tiles_x=tiles_x)
    (pair_grad,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((N_ROWS, A), jnp.float32),),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        tile_start,
        tile_count,
        pair_data,
        tfinal,
        dcolor,
        dalpha,
        background.reshape(1, 3).astype(jnp.float32),
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
    color, tfinal, pid, pwp, pair_w = out
    residuals = (pair_data, tile_start, tile_count, background, tfinal)
    return out, residuals


def _raster_core_bwd(tiles_x, tiles_y, with_stats, interpret, residuals, cts):
    pair_data, tile_start, tile_count, background, tfinal = residuals
    d_color, d_tfinal, _d_pid, _d_pwp, _d_pairw = cts
    d_color = _zero_if_float0(d_color, (3,) + tfinal.shape)
    d_tfinal = _zero_if_float0(d_tfinal, tfinal.shape)
    # our public output is alpha = 1 - tfinal; the core returns tfinal, so a
    # cotangent on tfinal maps to -g_alpha: d_alpha used in the kernel is
    # the cotangent of (1 - T), i.e. -d_tfinal.
    pair_grad = _run_backward(
        pair_data, tile_start, tile_count, tfinal, d_color, -d_tfinal,
        background, tiles_x, tiles_y, interpret,
    )
    # background cotangent: sum_pix T_N * dC  (cheap, in jnp)
    d_bg = jnp.stack([
        jnp.sum(tfinal * d_color[0]),
        jnp.sum(tfinal * d_color[1]),
        jnp.sum(tfinal * d_color[2]),
    ]) + jnp.sum(-d_tfinal) * 0.0
    return pair_grad, None, None, d_bg


def _zero_if_float0(ct, shape):
    if ct is None or (hasattr(ct, "dtype") and ct.dtype == jax.dtypes.float0):
        return jnp.zeros(shape, jnp.float32)
    return ct


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
):
    """Same output contract as rasterize_ref.rasterize (forward only for now;
    gradients via the reference path until the backward kernel lands)."""
    if interpret is None:
        interpret = _interpret_default()
    splats = project_gaussians(
        xyz, scaling, rotation, opacity, world_view, full_proj,
        focal_x, focal_y, tan_fovx, tan_fovy, image_height, image_width,
        mode=mode, use_filter=use_filter, means2d_offset=means2d_offset,
        active_mask=active_mask,
    )
    pairs = build_pairs(splats, colors, image_height, image_width, max_pairs)
    color, tfinal, pid_pair, pwp, pair_w = _raster_core(
        pairs["pair_data"],
        pairs["tile_start"],
        pairs["tile_count"],
        background,
        pairs["tiles_x"],
        pairs["tiles_y"],
        with_stats,
        interpret,
    )
    A = pairs["pair_data"].shape[1]
    H, W = image_height, image_width
    color = color[:, :H, :W]
    tfinal = tfinal[:H, :W]
    pwp = pwp[:H, :W]
    P = xyz.shape[0]
    order = pairs["order"]
    # pid_pair holds the argmax PAIR index; map pair -> depth-sorted slot ->
    # caller id
    pid_pair = pid_pair[:H, :W]
    slot = pairs["pair_gid"][jnp.clip(pid_pair, 0, A - 1)]
    pid = jnp.where(
        (pid_pair >= 0) & (slot < P),
        order.astype(jnp.int32)[jnp.clip(slot, 0, P - 1)],
        -1,
    )
    # per-gaussian max blend weight: segment-max of pair weights by sorted slot
    pw_sorted = (
        jnp.zeros((P + 1,), jnp.float32)
        .at[pairs["pair_gid"]]
        .max(pair_w[0], mode="drop")[:P]
    )
    point_weight = jnp.zeros((P,), jnp.float32).at[order].set(pw_sorted)
    if not with_stats:  # pair_w buffer is not fully written without stats
        point_weight = jnp.zeros((P,), jnp.float32)
    radii = jnp.zeros((P,), jnp.float32).at[order].set(
        jnp.where(pairs["valid"], pairs["radius"], 0.0)
    )
    return {
        "render": color,
        "radii": radii.astype(jnp.int32),
        "point_id_pixel": pid,
        "point_weight_pixel": pwp,
        "point_weight": point_weight,
        "alpha": 1.0 - tfinal,
        "depth_cam": splats.depth,
    }
