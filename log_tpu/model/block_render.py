"""Block-pruned inference render: per-frame cost scales with the VISIBLE
working set instead of the point capacity.

The reference achieves cut-bound per-frame cost hierarchically — its tree
traversal only descends visible roots and stops at the LoD cut
(LoG/model/tensor_tree.py:131-186), so a street-level camera in a huge
scene touches a tiny fraction of the state. The repo's flat_slice cut is
the TPU-shaped replacement (sorts over the capacity axis instead of
data-dependent BFS), but every dense stage — projection, cut predicate,
compaction sort — was CAPACITY-bound: ~30+ ms at 3.4M rows no matter how
coarse the cut or how narrow the frustum.

This module restores the hierarchy with TPU-native block pruning:

  * rows are kept in a DEPTH-MAJOR, MORTON-MINOR layout
    (LoG.optimize_render_layout), so both LoD coarseness (deep levels) and
    camera frustum (spatial cells) map to contiguous row blocks;
  * a per-block metadata table (bbox, 3-sigma extents, parent extents,
    flags) refreshed at densify cadence gives a CONSERVATIVE per-frame
    eligibility test: a block is skipped only if no row in it can pass the
    flat cut for this camera (frustum reject, or every non-root row's
    parent projects below min_resolution_pixel);
  * eligible blocks are compacted to the front (one (B,)-row sort) and the
    frame inputs are fetched with ONE axis-1 block take of a prepacked
    (C, B, S) tensor — per-index cost amortizes over S*C elements, so the
    fetch is DMA-bound, unlike general row gathers (~9 ms/M rows);
  * everything downstream (projection, cut, compaction-by-sort, pair
    pipeline) runs over the K_b*S-row working set.

Frame inputs are prepacked once per densify: xyz stays f32 (position
precision is visually load-bearing), cov3d / rgb / opacity / parent and
root attributes ride bf16 pairs in u32 lanes — the same rounding class the
packed pair pipeline already carries (<=0.4% relative; threshold flips at
the LoD cut swap a splat for its children, which the reference itself
randomizes by design via rand-radius training jitter).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import gaussian_math as gm
from ..ops.rasterize_tiled import _pack2_bf16, _unpack2_bf16
from ..ops.sh import sh_to_rgb

# frame-input column ids in the (C, B, S) prepack (all f32-typed; packed
# columns are u32 bitcasts)
C_X, C_Y, C_Z = 0, 1, 2                    # world position, f32
C_SXX_SXY, C_SXZ_SYY, C_SYZ_SZZ = 3, 4, 5  # cov3d, bf16 pairs
C_OP_R, C_G_B = 6, 7                       # activated opacity + rgb, bf16
C_PX_PY, C_PZ_PXX, C_PXY_PXZ, C_PYY_PYZ, C_PZZ = 8, 9, 10, 11, 12  # parent
C_RX_RY, C_RZ = 13, 14                     # root center, bf16 pairs
C_FLAGS = 15                               # depth | leaf<<8 | root<<9 |
#                                            leaf_opt<<10 | alive<<11 (u32)
C_ROOT_ID = 16                             # root row id (u32)
N_COLS = 17

FLAG_LEAF = 1 << 8
FLAG_ROOT = 1 << 9
FLAG_LEAF_OPT = 1 << 10
FLAG_ALIVE = 1 << 11


def block_size_for(cap: int, target: int = 4096) -> int:
    """Largest power of two <= target dividing cap (capacities are 2^k or
    3*2^(k-1), so at least cap's largest 2-power divisor)."""
    s = 1
    while s * 2 <= target and cap % (s * 2) == 0:
        s *= 2
    return s


@partial(jax.jit, static_argnames=("S",))
def build_block_cache(params: dict, tree_arrays: dict, is_leaf_opt,
                      n_alive, S: int):
    """Prepack the (N_COLS, B, S) frame-input tensor + per-block metadata.

    Runs on device at densify cadence (LoG._refresh_device_caches). All
    bf16 rounding happens here, once, not per frame.
    """
    cap = params["xyz"].shape[0]
    B = cap // S
    alive = jnp.arange(cap) < n_alive

    xyz = params["xyz"]
    scaling = jnp.exp(params["scaling"])
    cov = gm.build_cov3d_c(scaling, params["rotation"])
    op = jax.nn.sigmoid(params["opacity"][:, 0])
    rgb = sh_to_rgb(params["colors"])

    pscal = jnp.exp(tree_arrays["parent_scaling"])
    pcov = gm.build_cov3d_c(pscal, tree_arrays["parent_rotation"])
    pxyz = tree_arrays["parent_xyz"]
    rxyz = tree_arrays["root_xyz"]

    is_leaf = tree_arrays["node_index"] == -1
    is_root = tree_arrays["index_parent"] == -1
    flags = (
        jnp.clip(tree_arrays["depth"], 0, 255).astype(jnp.uint32)
        | jnp.where(is_leaf, jnp.uint32(FLAG_LEAF), 0)
        | jnp.where(is_root, jnp.uint32(FLAG_ROOT), 0)
        | jnp.where(is_leaf_opt, jnp.uint32(FLAG_LEAF_OPT), 0)
        | jnp.where(alive, jnp.uint32(FLAG_ALIVE), 0)
    )

    f32 = lambda u: jax.lax.bitcast_convert_type(u, jnp.float32)  # noqa: E731
    cols = jnp.stack(
        [
            xyz[:, 0], xyz[:, 1], xyz[:, 2],
            f32(_pack2_bf16(cov[0], cov[1])),
            f32(_pack2_bf16(cov[2], cov[3])),
            f32(_pack2_bf16(cov[4], cov[5])),
            f32(_pack2_bf16(op, rgb[:, 0])),
            f32(_pack2_bf16(rgb[:, 1], rgb[:, 2])),
            f32(_pack2_bf16(pxyz[:, 0], pxyz[:, 1])),
            f32(_pack2_bf16(pxyz[:, 2], pcov[0])),
            f32(_pack2_bf16(pcov[1], pcov[2])),
            f32(_pack2_bf16(pcov[3], pcov[4])),
            f32(_pack2_bf16(pcov[5], jnp.zeros_like(op))),
            f32(_pack2_bf16(rxyz[:, 0], rxyz[:, 1])),
            f32(_pack2_bf16(rxyz[:, 2], jnp.zeros_like(op))),
            f32(flags),
            f32(tree_arrays["root_id"].astype(jnp.uint32)),
        ],
        axis=0,
    ).reshape(N_COLS, B, S)

    # ---- per-block conservative metadata ----
    big = jnp.float32(3.4e38)
    x3 = xyz.reshape(B, S, 3)
    am = alive.reshape(B, S, 1)
    bbox_min = jnp.min(jnp.where(am, x3, big), axis=1)      # (B, 3)
    bbox_max = jnp.max(jnp.where(am, x3, -big), axis=1)
    smax = jnp.max(scaling, axis=-1)                         # (cap,)
    s3d = 3.0 * jnp.max(
        jnp.where(alive, smax, 0.0).reshape(B, S), axis=1
    )                                                        # (B,)
    psmax = jnp.max(pscal, axis=-1)
    ps3d = 3.0 * jnp.max(
        jnp.where(alive, psmax, 0.0).reshape(B, S), axis=1
    )
    any_root = jnp.any((is_root & alive).reshape(B, S), axis=1)
    any_alive = jnp.any(alive.reshape(B, S), axis=1)
    meta = {
        "bbox_min": bbox_min,
        "bbox_max": bbox_max,
        "s3d": s3d,
        "parent_s3d": ps3d,
        "any_root": any_root,
        "any_alive": any_alive,
    }
    return cols, meta


def block_eligibility(meta: dict, cam: dict, min_resolution_pixel,
                      pad: float = 0.5, slack: float = 2.0):
    """Conservative per-block keep test for the flat cut.

    A block is dropped only when (a) its bbox lies fully outside the
    padded frustum (clip-space plane test on the 8 corners — a block
    straddling any plane is kept), or (b) no row can satisfy the cut's
    `parent_big` condition: the parents' max projected radius bound
    3*sigma_parent*focal*slack/z_min falls below min_resolution_pixel and
    the block holds no roots (roots bypass parent_big). `slack` absorbs
    the EWA Jacobian / dilation excess over the pinhole bound. A camera
    inside the bbox (z_min <= 0) keeps the block.
    """
    # bbox inflated by the block's 3-sigma splat extent: a splat centered
    # outside the padded frustum still renders its on-screen tail, so the
    # geometric support (center +- 3 sigma), not the center, must clear
    # the planes before a block may be dropped
    bmin = meta["bbox_min"] - meta["s3d"][:, None]
    bmax = meta["bbox_max"] + meta["s3d"][:, None]
    B = bmin.shape[0]
    # 8 corners (B, 8, 3)
    sel = jnp.array(
        [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
         [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]], jnp.float32
    )
    corners = bmin[:, None, :] * (1 - sel)[None] + bmax[:, None, :] * sel[None]
    cx, cy, cz = corners[..., 0], corners[..., 1], corners[..., 2]
    # clip space (w-positive test avoids the NDC divide's sign flip)
    fp = cam["full_proj"]
    px = cx * fp[0, 0] + cy * fp[1, 0] + cz * fp[2, 0] + fp[3, 0]
    py = cx * fp[0, 1] + cy * fp[1, 1] + cz * fp[2, 1] + fp[3, 1]
    pz = cx * fp[0, 2] + cy * fp[1, 2] + cz * fp[2, 2] + fp[3, 2]
    pw = cx * fp[0, 3] + cy * fp[1, 3] + cz * fp[2, 3] + fp[3, 3]
    # reject only when ALL corners violate the SAME plane with w > 0 — a
    # corner behind the camera (w <= 0) keeps the block (conservative; the
    # per-row NDC test downstream handles it exactly). Mirrors
    # frustum_flag_c's pz in (0, 1), px/py in +-(1 + pad).
    wpos = pw > 1e-6
    lim = pw * (1.0 + pad)
    out = (
        jnp.all((px > lim) & wpos, axis=1)
        | jnp.all((px < -lim) & wpos, axis=1)
        | jnp.all((py > lim) & wpos, axis=1)
        | jnp.all((py < -lim) & wpos, axis=1)
        | jnp.all((pz < 0.0) & wpos, axis=1)
        | jnp.all((pz > pw) & wpos, axis=1)
    )
    # min camera-space depth over corners; camera inside bbox -> z_min <= 0.
    # The parent-radius bound divides by the PARENT's z, and a row's parent
    # sits up to ~its own sigma outside the block bbox (children are
    # jittered inside the parent footprint) — shrink z by half the parent
    # extent on top of the s3d inflation already in the corners.
    wv = cam["world_view"]
    tz = cx * wv[0, 2] + cy * wv[1, 2] + cz * wv[2, 2] + wv[3, 2]
    z_min = jnp.min(tz, axis=1) - 0.5 * meta["parent_s3d"]
    focal = jnp.maximum(cam["focal_x"], cam["focal_y"])
    proj_parent = jnp.where(
        z_min > 1e-6,
        meta["parent_s3d"] * focal * slack / jnp.maximum(z_min, 1e-6) + 1.0,
        jnp.float32(3.4e38),
    )
    return (
        meta["any_alive"]
        & ~out
        & (meta["any_root"] | (proj_parent >= min_resolution_pixel))
    )


def select_blocks(eligible, k_blocks: int):
    """Compact eligible block ids to the front (one tiny sort). Returns
    (blk_ids (k_blocks,) int32 with B as the overflow/pad sentinel,
    n_eligible)."""
    B = eligible.shape[0]
    pos = jnp.arange(B, dtype=jnp.uint32)
    key = jnp.where(eligible, pos, jnp.uint32(B) + pos)
    key_s = jax.lax.sort(key)[:k_blocks]
    valid = key_s < jnp.uint32(B)
    blk_ids = jnp.where(valid, key_s, jnp.uint32(B)).astype(jnp.int32)
    return blk_ids, jnp.sum(eligible.astype(jnp.int32))


@partial(
    jax.jit,
    static_argnames=(
        "image_height", "image_width", "k_blocks", "k_visible", "max_pairs",
        "mode", "use_filter",
    ),
)
def render_blocks(
    cols,            # (N_COLS, B, S) prepack from build_block_cache
    meta: dict,
    cam: dict,
    min_resolution_pixel,
    current_depth,
    background,
    image_height: int,
    image_width: int,
    k_blocks: int,
    k_visible: int,
    max_pairs: int,
    w_full=None,     # optional (cap,) cached weight-cull mask
    mode: str = "antialias",
    use_filter: bool = False,
):
    """Block-pruned fused inference frame (packed pipeline only).

    Weight cull: pass the cached capacity-axis mask (fused_root_cull) —
    the per-frame slice-gather variant intentionally has no block path
    (model.render_fused keeps the unpruned fused_prepare_render for it).
    Returns (render, alpha, counts (4,): [leaf, node, pair_demand,
    n_eligible_blocks]).
    """
    from ..ops.projection import NEAR_Z, SplatCols
    from .train_step import _compact_flat_cols, _render_tiled_cols

    S = cols.shape[2]
    B = cols.shape[1]
    W_rows = k_blocks * S

    eligible = block_eligibility(meta, cam, min_resolution_pixel)
    if w_full is not None:
        # occlusion-based block pruning: a block whose EVERY row's root was
        # weight-culled (< 1e-8 max blend weight, fused_root_cull) cannot
        # contribute — drop it before the working-set take. Conservative:
        # keep on any surviving row.
        eligible = eligible & jnp.any(w_full.reshape(B, S), axis=1)
    blk_ids, n_elig = select_blocks(eligible, k_blocks)

    g = jnp.take(cols, blk_ids, axis=1, mode="fill", fill_value=0.0)
    g = g.reshape(N_COLS, W_rows)

    u32 = lambda r: jax.lax.bitcast_convert_type(r, jnp.uint32)  # noqa: E731
    x, y, z = g[C_X], g[C_Y], g[C_Z]
    sxx, sxy = _unpack2_bf16(u32(g[C_SXX_SXY]))
    sxz, syy = _unpack2_bf16(u32(g[C_SXZ_SYY]))
    syz, szz = _unpack2_bf16(u32(g[C_SYZ_SZZ]))
    op, col_r = _unpack2_bf16(u32(g[C_OP_R]))
    col_g, col_b = _unpack2_bf16(u32(g[C_G_B]))
    pxx_, pyy_ = _unpack2_bf16(u32(g[C_PX_PY]))
    pz_, pcxx = _unpack2_bf16(u32(g[C_PZ_PXX]))
    pcxy, pcxz = _unpack2_bf16(u32(g[C_PXY_PXZ]))
    pcyy, pcyz = _unpack2_bf16(u32(g[C_PYY_PYZ]))
    pczz, _ = _unpack2_bf16(u32(g[C_PZZ]))
    rx_, ry_ = _unpack2_bf16(u32(g[C_RX_RY]))
    rz_, _ = _unpack2_bf16(u32(g[C_RZ]))
    flags = u32(g[C_FLAGS])
    root_id = u32(g[C_ROOT_ID]).astype(jnp.int32)

    depth_lvl = (flags & jnp.uint32(255)).astype(jnp.int32)
    is_leaf = (flags & FLAG_LEAF) != 0
    is_root = (flags & FLAG_ROOT) != 0
    leaf_opt = (flags & FLAG_LEAF_OPT) != 0
    alive = (flags & FLAG_ALIVE) != 0

    # ---- projection (own splat + cut radius from one cov2d eval) ----
    tx, ty, tz = gm.transform_point_c(x, y, z, cam["world_view"])
    ndc_x, ndc_y, ndc_z, _ = gm.project_ndc_c(x, y, z, cam["full_proj"])
    pix_x = gm.ndc_to_pix(ndc_x, image_width)
    pix_y = gm.ndc_to_pix(ndc_y, image_height)
    cov3d_c = (sxx, sxy, sxz, syy, syz, szz)
    cxx, cxy, cyy = gm.ewa_cov2d_c(
        cov3d_c, tx, ty, tz, cam["world_view"], cam["focal_x"],
        cam["focal_y"], cam["tan_fovx"], cam["tan_fovy"],
    )
    kxx, kxy, kyy = gm.dilate_cov2d(cxx, cxy, cyy, mode="clamp")
    cut_vis = gm.frustum_flag_c(ndc_x, ndc_y, ndc_z, padding=0.3)
    cut_det = kxx * kyy - kxy * kxy
    radius2d = jnp.where(
        cut_vis & (cut_det > 0), gm.cov2d_radius(kxx, kxy, kyy), 0.0
    )
    if mode == "antialias" and not use_filter:
        ucxx, ucxy, ucyy = cxx, cxy, cyy
        comp = 1.0
    else:
        det_raw = cxx * cyy - cxy * cxy
        ucxx, ucxy, ucyy = gm.dilate_cov2d(cxx, cxy, cyy, mode="add")
        if mode == "antialias":
            det_f = ucxx * ucyy - ucxy * ucxy
            comp = jnp.sqrt(
                jnp.maximum(det_raw, 1e-12)
                / jnp.where(det_f != 0.0, det_f, 1.0)
            )
        else:
            comp = 1.0
    icxx, icxy, icyy, det = gm.inverse_cov2d(ucxx, ucxy, ucyy)
    radius = gm.cov2d_radius(ucxx, ucxy, ucyy)
    op_eff = op * comp
    lim = jnp.sqrt(jnp.maximum(2.0 * jnp.log(255.0 * op_eff), 0.0))
    radius = jnp.ceil(radius * jnp.minimum(lim * (1.0 / 3.0), 1.0))
    valid = (tz > NEAR_Z) & (det > 0.0) & alive
    radius = jnp.where(valid, radius, 0.0)
    op_eff = jnp.where(valid, op_eff, 0.0)

    # ---- parent radius (cached parent attrs; roots carry themselves) ----
    ptx, pty, ptz = gm.transform_point_c(pxx_, pyy_, pz_, cam["world_view"])
    pcxx2, pcxy2, pcyy2 = gm.ewa_cov2d_c(
        (pcxx, pcxy, pcxz, pcyy, pcyz, pczz), ptx, pty, ptz,
        cam["world_view"], cam["focal_x"], cam["focal_y"],
        cam["tan_fovx"], cam["tan_fovy"],
    )
    pkxx, pkxy, pkyy = gm.dilate_cov2d(pcxx2, pcxy2, pcyy2, mode="clamp")
    pnx, pny, pnz, _ = gm.project_ndc_c(pxx_, pyy_, pz_, cam["full_proj"])
    p_vis = gm.frustum_flag_c(pnx, pny, pnz, padding=0.3)
    p_det = pkxx * pkyy - pkxy * pkxy
    radius2d_parent = jnp.where(
        p_vis & (p_det > 0), gm.cov2d_radius(pkxx, pkxy, pkyy), 0.0
    )

    # ---- flat cut predicate (flat_cut_pre on flag columns) ----
    rnx, rny, rnz, _ = gm.project_ndc_c(rx_, ry_, rz_, cam["full_proj"])
    root_frus = gm.frustum_flag_c(rnx, rny, rnz, padding=0.5) & alive
    small = radius2d < min_resolution_pixel
    parent_big = radius2d_parent >= min_resolution_pixel
    reach = root_frus & jnp.where(
        is_root, True, parent_big & (depth_lvl <= current_depth)
    )
    keep = alive & reach & (small | is_leaf | (depth_lvl >= current_depth))
    if w_full is not None:
        wb = jnp.take(
            w_full.reshape(B, S), blk_ids, axis=0,
            mode="fill", fill_value=False,
        ).reshape(W_rows)
        keep = keep & wb
    counts2 = jnp.stack(
        [jnp.sum(keep & leaf_opt), jnp.sum(keep & ~leaf_opt)]
    )

    # ---- pack + compact + packed pair pipeline (same as flat_slice) ----
    rad_up = radius * (1.0 + 2.0 ** -7)
    sort_cols = {
        "px": pix_x,
        "py": pix_y,
        "depth": tz,
        "p1": _pack2_bf16(icxx, icxy),
        "p2": _pack2_bf16(icyy, op_eff),
        "p3": _pack2_bf16(col_r, col_g),
        "p4": _pack2_bf16(col_b, rad_up),
    }
    cols_s, _index, lane_prefix = _compact_flat_cols(
        sort_cols, keep, k_visible
    )
    cxx_sl, cxy_sl = _unpack2_bf16(cols_s["p1"])
    cyy_sl, op_sl = _unpack2_bf16(cols_s["p2"])
    r_sl, g_sl = _unpack2_bf16(cols_s["p3"])
    b_sl, rad_sl = _unpack2_bf16(cols_s["p4"])
    v = lane_prefix & (rad_sl > 0)
    splat_cols = SplatCols(
        px=cols_s["px"], py=cols_s["py"], cxx=cxx_sl, cxy=cxy_sl,
        cyy=cyy_sl, opacity=jnp.where(v, op_sl, 0.0),
        depth=cols_s["depth"], radius=jnp.where(v, rad_sl, 0.0), valid=v,
    )
    render, alpha, pair_total = _render_tiled_cols(
        splat_cols, (r_sl, g_sl, b_sl), background, image_height,
        image_width, max_pairs, lane_prefix, pack_pairs=True,
    )
    counts = jnp.concatenate([counts2, pair_total[None], n_elig[None]])
    return render, alpha, counts
