"""Multi-chip point-sharded RENDER: the urban-scale 30 FPS path.

The single-chip kernel-floor analysis (ARCHITECTURE.md) concluded that a
lone TPU chip cannot brute-force a 4090's scatter hardware at multi-million
-pair 1080p frames; the remaining factor comes from the slice. This module
renders ONE camera per frame with every per-point and per-pair stage sharded
over the mesh's point axis, and the compositing kernel sharded over IMAGE
BANDS (contiguous tile rows) — the classic sort-middle hybrid, expressed as
explicit shard_map collectives:

  1. **local cut** — each device runs the gather-free flat pre-cut
     (model/tensor_tree.flat_cut_pre) over its own 1/n of the capacity axis;
     the per-point caches it reads (root_xyz, parent attrs, tree ints) are
     per-point arrays, so they shard with zero communication.
  2. **local compact + activate + project** — compaction-by-sort over cap/n
     rows to a k_local slice; activation and EWA projection are elementwise.
  3. **local expansion + sort** — the same gather-free pair construction as
     the single-chip path (ops/rasterize_tiled.expand_sort_pairs) on the
     local slice: Pallas one-hot expand + ONE sort by (tile, depth, gid),
     then a second sort by the INTERLEAVED band key (below).
  4. **band exchange** — an (n, bucket) all_to_all hands every band owner
     its pairs from all shards (fixed-capacity buckets sliced at
     searchsorted band boundaries; overflow truncates and is reported).
     Band ownership is ROUND-ROBIN over tile rows (owner = tile_row mod n),
     not contiguous blocks: real frames concentrate pairs in the middle of
     the screen, and contiguous bands overflowed fixed buckets ~4x at bench
     scale (scripts/check_sharded_fullscale.py, round 5) while interleaved
     rows spread every screen region 1/n to each owner.
  5. **band merge + kernel** — the owner re-sorts its ~A/n received pairs
     by (tile, depth, gid) (a merge of n sorted runs, done as one sort —
     TPU sort IS the merge primitive), packs, and runs the unmodified
     forward kernel over its band's tiles; pixel rows are rebased PER PAIR
     (each pair renders exactly one tile, so a per-pair constant shift to
     that tile's local coordinates is exact).
  6. **image assembly** — bands concatenate along the row axis via the
     shard_map output spec (an all_gather of 3*H*W/n floats each), then one
     cheap on-device de-interleave restores global row order.

Point-shard layout: `cfg.layout="strided"` expects capacity rows permuted
round-robin (`interleave_shard_rows`) so each shard holds a spatially
uniform point sample — spatially-contiguous (root_major / Morton) rows
give some shards the whole visible set (one shard saturated its ENTIRE
local pair budget at bench scale) and others none. The executor applies
the permutation once at upload; it is a bijection on rows, and every
per-point stage is elementwise (flat_cut_pre reads only per-point caches).

Every stage's cost is ~1/n of the single-chip frame; the only cross-device
traffic is the pair exchange (~A * 13 rows * 4 B spread over the mesh) and
the final image gather, both far under ICI bandwidth at 30 FPS.

Correctness contract: identical pair ordering to the single-chip sort
(ties under the exact 3-key CPU sort are impossible — one pair per
(gaussian, tile)), so the composited image matches the single-chip
`fused_prepare_render(check_cull=False)` frame to fp tolerance
(chunk-boundary regrouping only). The root weight cull
(render_to_check, LoG/model/level_of_gaussian.py:207-241) is a
conservative <1e-8-weight occlusion cull; the sharded path omits it
(image delta below 8-bit visibility), trading a slightly larger live set
for zero extra collectives.

Reference capability matched: real-time urban-scale rendering
(/root/reference/README.md:13; timed loop /root/reference/apps/train.py:41-83).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

try:  # jax >= 0.4.35
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..model.tensor_tree import flat_cut_pre
from ..model.train_step import (
    _compact_cols_sort,
    _compact_slices_sort,
    eval_sh,
    sh_to_rgb,
)
from ..ops import gaussian_math as gm
from ..ops.projection import project_gaussians, project_gaussians_cols
from ..ops.rasterize_tiled import (
    N_VAL_ROWS,
    PAIR_CHUNK,
    ROW_DEPTH,
    ROW_PY,
    TILE_H,
    TILE_W,
    _interpret_default,
    _run_forward,
    expand_sort_pairs,
    pack_sorted_pairs,
    sort_pairs,
)
from .sharded_step import AXIS, make_flat_mesh


@dataclass(frozen=True)
class ShardedRenderConfig:
    image_height: int
    image_width: int
    n_devices: int
    k_local: int           # per-shard visible-slice budget
    max_pairs_local: int   # per-shard pair budget (multiple of 512)
    bucket_pairs: int      # per-(src, dst) exchange capacity
    sh_degree: int = 0
    mode: str = "antialias"
    min_res_pixel: float = 3.0
    layout: str = "contiguous"  # capacity-row layout: "contiguous" |
    #   "strided" (rows pre-permuted by interleave_shard_rows; shard s
    #   local row j holds global row j*n + s, so alive = j*n + s < n_alive)

    @property
    def tiles_x(self) -> int:
        return -(-self.image_width // TILE_W)

    @property
    def band_ty(self) -> int:
        tiles_y = -(-self.image_height // TILE_H)
        return -(-tiles_y // self.n_devices)

    @property
    def tiles_y_pad(self) -> int:
        return self.band_ty * self.n_devices

    @property
    def height_pad(self) -> int:
        # padded so every band owns an equal tile-row count
        return self.tiles_y_pad * TILE_H

    @property
    def band_tiles(self) -> int:
        return self.band_ty * self.tiles_x

    @property
    def merge_pairs(self) -> int:
        return self.bucket_pairs * self.n_devices


def interleave_shard_rows(arrays: dict, n: int) -> dict:
    """Permute capacity rows for cfg.layout="strided": shard s's local row
    j holds global row j*n + s, so every 1/n shard is a round-robin
    (spatially uniform) sample of the point set. One-time relayout applied
    by the caller/executor at upload; bijective on rows, safe for every
    per-point stage (the flat cut reads only per-point caches)."""
    out = {}
    for k, v in arrays.items():
        cap = v.shape[0]
        assert cap % n == 0, (k, cap, n)
        capl = cap // n
        idx = jnp.arange(cap)
        perm = (idx % capl) * n + idx // capl
        out[k] = v[perm]
    return out


def _local_cut(params_l, tree_l, cam, n_alive, alive, min_res,
               current_depth):
    """flat_cut_pre over the local shard — all inputs per-point, zero comms."""
    rx = tree_l["root_xyz"]
    rpx, rpy, rpz, _ = gm.project_ndc_c(
        rx[..., 0], rx[..., 1], rx[..., 2], cam["full_proj"]
    )
    root_frus = gm.frustum_flag_c(rpx, rpy, rpz, padding=0.5) & alive
    scaling = jnp.exp(params_l["scaling"])
    rotation = params_l["rotation"] / jnp.maximum(
        jnp.linalg.norm(params_l["rotation"], axis=-1, keepdims=True), 1e-12
    )
    radius2d = gm.compute_radius2d(
        params_l["xyz"], scaling, rotation, cam["world_view"],
        cam["full_proj"], cam["focal_x"], cam["focal_y"],
        cam["tan_fovx"], cam["tan_fovy"],
    )
    radius2d_parent = gm.compute_radius2d(
        tree_l["parent_xyz"], jnp.exp(tree_l["parent_scaling"]),
        tree_l["parent_rotation"] / jnp.maximum(
            jnp.linalg.norm(
                tree_l["parent_rotation"], axis=-1, keepdims=True
            ), 1e-12,
        ),
        cam["world_view"], cam["full_proj"], cam["focal_x"],
        cam["focal_y"], cam["tan_fovx"], cam["tan_fovy"],
    )
    return flat_cut_pre(
        tree_l["index_parent"], tree_l["node_index"], tree_l["depth"],
        root_frus, radius2d, radius2d_parent, alive, min_res, current_depth,
    )


def _shard_render(params_l, tree_l, cam, n_alive, min_res, current_depth,
                  background, cfg: ShardedRenderConfig, interpret: bool):
    n = cfg.n_devices
    dev = jax.lax.axis_index(AXIS)
    capl = params_l["xyz"].shape[0]
    if cfg.layout == "strided":
        # rows pre-permuted by interleave_shard_rows: local j <- global j*n+s
        global_row = jnp.arange(capl) * n + dev
    else:
        global_row = jnp.arange(capl) + dev * capl
    alive = global_row < n_alive

    # ---- 1+2: local cut, compact, activate, project ---------------------
    keep = _local_cut(
        params_l, tree_l, cam, n_alive, alive, min_res, current_depth
    )
    count_local = jnp.sum(keep)
    need = ["xyz", "colors", "scaling", "opacity", "rotation"]
    use_cols = not (cfg.sh_degree > 0 and "shs" in params_l)
    if use_cols:
        # column-native flow (see ops/projection.SplatCols): sort payloads
        # stay 1-D through activation/projection/pair rows
        cols, _index, lane_valid = _compact_cols_sort(
            {k: params_l[k] for k in need}, keep, cfg.k_local
        )
        x, yy, zz = cols["xyz"]
        sx, sy, sz = (jnp.exp(c) for c in cols["scaling"])
        opacity_c = jax.nn.sigmoid(cols["opacity"][0])
        qw, qx, qy, qz = cols["rotation"]
        colors = tuple(sh_to_rgb(c) for c in cols["colors"])
        splats = project_gaussians_cols(
            x, yy, zz, sx, sy, sz, qw, qx, qy, qz, opacity_c,
            cam["world_view"], cam["full_proj"], cam["focal_x"],
            cam["focal_y"], cam["tan_fovx"], cam["tan_fovy"],
            cfg.height_pad, cfg.image_width, mode=cfg.mode,
            use_filter=False, active_mask=lane_valid, tight_radius=True,
        )
    else:
        if cfg.sh_degree > 0 and "shs" in params_l:
            need.append("shs")
        slices, _index, lane_valid = _compact_slices_sort(
            {k: params_l[k] for k in need}, keep, cfg.k_local
        )
        scaling = jnp.exp(slices["scaling"])
        opacity = jax.nn.sigmoid(slices["opacity"][:, 0])
        rotation = slices["rotation"] / jnp.linalg.norm(
            slices["rotation"], axis=-1, keepdims=True
        )
        colors = sh_to_rgb(slices["colors"])
        if cfg.sh_degree > 0 and "shs" in slices:
            dirs = slices["xyz"] - cam["camera_center"][None]
            dirs = dirs / jnp.maximum(
                jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12
            )
            colors = colors + eval_sh(
                dirs, slices["shs"], degree=cfg.sh_degree
            )
        splats = project_gaussians(
            slices["xyz"], scaling, rotation, opacity, cam["world_view"],
            cam["full_proj"], cam["focal_x"], cam["focal_y"],
            cam["tan_fovx"], cam["tan_fovy"], cfg.height_pad,
            cfg.image_width, mode=cfg.mode, use_filter=False,
            means2d_offset=jnp.zeros((cfg.k_local, 2), jnp.float32),
            active_mask=lane_valid, tight_radius=True,
        )

    # ---- 3: local expansion + one sort by (tile, depth, gid) ------------
    es = expand_sort_pairs(
        splats, colors, cfg.height_pad, cfg.image_width,
        cfg.max_pairs_local, runs_tail_only=True, active_prefix=lane_valid,
        interpret=interpret,
    )
    tile_s = es["tile_s"]          # ascending; tail sentinel = num_tiles
    gid_s = es["gid_s"]
    values_s = es["values_s"]      # 10-tuple of (A_l,) rows
    num_tiles = es["num_tiles"]
    band_tiles = cfg.band_tiles

    # ---- 3b: remap to the INTERLEAVED band key and re-sort ---------------
    # owner(tile) = tile_row mod n; owner d's local tile grid is row-major
    # over (band_ty, tiles_x) with local row j = tile_row // n. The remap
    # rk = owner * band_tiles + local_tile is a bijection on tile ids, so
    # bands are again contiguous runs of the re-sorted table and the
    # per-tile ordering contract (depth, gid) is untouched.
    trow = tile_s // cfg.tiles_x
    tcol = tile_s - trow * cfg.tiles_x
    rk = (trow % n) * band_tiles + (trow // n) * cfg.tiles_x + tcol
    rk = jnp.where(tile_s >= num_tiles, num_tiles, rk)
    tile_s, gid_s, values_s, _perm_rk = sort_pairs(
        rk, values_s[ROW_DEPTH], gid_s, tuple(values_s), num_tiles
    )

    # ---- 4: fixed-bucket band exchange ----------------------------------
    Bcap = cfg.bucket_pairs
    bounds = (jnp.arange(n + 1, dtype=jnp.int32) * band_tiles)
    starts = jnp.searchsorted(tile_s, bounds, side="left").astype(jnp.int32)
    lens = starts[1:] - starts[:-1]          # (n,) pairs per dst band
    overflow = jnp.max(jnp.maximum(lens - Bcap, 0))

    iota_b = jnp.arange(Bcap, dtype=jnp.int32)

    def slice_buckets(row, fill):
        rp = jnp.concatenate(
            [row, jnp.full((Bcap,), fill, row.dtype)]
        )
        return jnp.stack([
            jax.lax.dynamic_slice(rp, (starts[b],), (Bcap,))
            for b in range(n)
        ])  # (n, Bcap)

    tile_b = slice_buckets(tile_s, num_tiles)
    gid_b = slice_buckets(gid_s, 0)
    vals_b = [slice_buckets(v, 0.0) for v in values_s]
    # mask lanes beyond each band's run
    in_run = iota_b[None, :] < lens[:, None]
    tile_b = jnp.where(in_run, tile_b, num_tiles)

    def xchg(x):
        return jax.lax.all_to_all(
            x, AXIS, split_axis=0, concat_axis=0, tiled=True
        )

    tile_r = xchg(tile_b).reshape(-1)           # (n * Bcap,)
    gid_r = xchg(gid_b).reshape(-1)
    vals_r = [xchg(v).reshape(-1) for v in vals_b]

    # ---- 5: rebase to the band, merge-sort, pack, kernel ----------------
    band_start_tile = dev * band_tiles
    tl = tile_r - band_start_tile
    in_band = (tl >= 0) & (tl < band_tiles)
    tl = jnp.where(in_band, tl, band_tiles)
    dkey = jnp.where(in_band, vals_r[ROW_DEPTH], jnp.inf)
    # pixel rows are global; owner dev's local tile row j is global tile
    # row j*n + dev, so shift each pair's splat-center y into the band's
    # local frame. Exact: a pair renders exactly one tile, and within that
    # tile local y = global y - (j*(n-1) + dev)*TILE_H for every pixel.
    jrow = (tl // cfg.tiles_x).astype(jnp.float32)
    vals_r[ROW_PY] = vals_r[ROW_PY] - (
        jrow * (n - 1) + dev
    ) * float(TILE_H)

    tile_s2, gid_s2, values_s2, _perm = sort_pairs(
        tl, dkey, gid_r, tuple(vals_r), band_tiles
    )
    packed = pack_sorted_pairs(
        tile_s2, gid_s2, values_s2, cfg.tiles_x, cfg.band_ty,
        interpret=interpret,
    )
    color, tfinal, _pid, _pwp, _pair_w, _cend = _run_forward(
        packed["pair_data"], packed["tile_start"], packed["tile_count"],
        background, cfg.tiles_x, cfg.band_ty, False, interpret,
    )
    # stats[3:] is the full (n_src, n_dst) exchange-length matrix flattened
    # row-major — the measured per-band exchange volume (multiply by the
    # per-pair wire size to get bytes; ARCHITECTURE.md multi-chip table)
    lens_all = jax.lax.all_gather(lens, AXIS).reshape(-1)
    stats = jnp.concatenate([
        jnp.stack([
            jax.lax.psum(count_local, AXIS),
            jax.lax.psum(jnp.sum(lens), AXIS),
            jax.lax.pmax(overflow, AXIS),
        ]),
        lens_all,
    ])
    return color, 1.0 - tfinal, stats


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def sharded_render_frame(
    params, tree_arrays, cam, n_alive, min_res, current_depth, background,
    cfg: ShardedRenderConfig, interpret: bool | None = None,
):
    """One camera, full frame, every stage sharded over the point axis.

    params/tree_arrays: capacity-padded dicts (capacity divisible by
    cfg.n_devices); cam: camera_device dict (replicated). Returns
    (render (3, H, W), alpha (H, W), stats (3 + n^2,) [cut total, pairs
    exchanged, max bucket overflow, then the (n_src, n_dst)
    exchange-length matrix flattened row-major — pairs each shard hands
    each band owner, the measured ICI exchange volume]).
    """
    if interpret is None:
        interpret = _interpret_default()
    mesh = make_flat_mesh(cfg.n_devices)
    sh, rep = P(AXIS), P()
    need = {"xyz", "colors", "scaling", "opacity", "rotation", "shs"}
    params = {k: v for k, v in params.items() if k in need}
    tree_keys = {
        "index_parent", "node_index", "depth", "root_xyz", "parent_xyz",
        "parent_scaling", "parent_rotation",
    }
    tree_arrays = {k: v for k, v in tree_arrays.items() if k in tree_keys}
    fn = shard_map(
        partial(_shard_render, cfg=cfg, interpret=interpret),
        mesh=mesh,
        in_specs=(sh, sh, rep, rep, rep, rep, rep),
        out_specs=(P(None, AXIS, None), P(AXIS, None), rep),
        check_vma=False,
    )
    color, alpha, stats = fn(
        params, tree_arrays, cam, jnp.asarray(n_alive, jnp.int32),
        jnp.asarray(min_res, jnp.float32),
        jnp.asarray(current_depth, jnp.int32),
        jnp.asarray(background, jnp.float32),
    )
    # de-interleave: owner d's band rows are global tile rows d, d+n, ...
    # assembled d-major; restore (j, d) order
    n, bty = cfg.n_devices, cfg.band_ty
    Wk = color.shape[-1]
    color = color.reshape(3, n, bty, TILE_H, Wk).transpose(0, 2, 1, 3, 4)
    color = color.reshape(3, cfg.height_pad, Wk)
    alpha = alpha.reshape(n, bty, TILE_H, Wk).transpose(1, 0, 2, 3)
    alpha = alpha.reshape(cfg.height_pad, Wk)
    H, W = cfg.image_height, cfg.image_width
    return color[:, :H, :W], alpha[:H, :W], stats
