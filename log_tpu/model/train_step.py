"""The fused training step: ONE jit for gather -> render -> loss -> grads ->
counter stats -> sparse Adam -> scatter.

The reference splits this across renderer.forward / loss.backward /
Counter.update_by_output / SparseOptimizer.step with multiple kernel launches
and CPU<->GPU index traffic (LoG/utils/trainer.py:144-165). On TPU everything
lives in a single XLA executable: the only host sync per step is the visible
count (to pick the padded slice bucket) and any metrics the trainer chooses to
read. Recompiles are bounded by quantizing (k_leaf, k_node) to capacity
buckets.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp

from ..ops import rasterize_ref
from ..ops.sh import eval_sh, sh_to_rgb
from ..ops.ssim import ssim_loss, ssim_map
from .counter import update_counter
from .sparse_optimizer import dense_adam_step, sparse_adam_step


@dataclass(frozen=True)
class StepConfig:
    image_height: int
    image_width: int
    k_leaf: int
    k_node: int
    sh_degree: int  # active SH degree
    mode: str = "antialias"  # 'antialias' | 'original'
    use_correction: bool = False
    has_mask: bool = False
    opt_keys: tuple = ("xyz", "colors", "scaling", "opacity", "rotation", "shs")
    backend: str = "reference"  # 'reference' | 'tiled'
    max_pairs: int = 1 << 18  # tiled backend pair capacity
    chunk: int = 32
    render_depth: bool = False  # add SSI monocular-depth loss
    # foreground-mask training (MaskForeground; LoG/render/renderer.py:328-
    # 368): GT composites over the step background inside the mask, and the
    # loss is restricted to the mask's bounding box. The reference CROPS
    # both images to the (padded) bbox; here shapes stay static — the L1
    # mean and the SSIM map are masked to the bbox instead, which matches
    # the crop exactly (valid-padding SSIM windows fully inside the bbox).
    crop_loss: bool = False
    # visible-slice compaction: 'sort' (auto-selects payload sort vs
    # index-sort + k-row gathers at k <= cap/16 — the round-5 measured
    # crossover; identity when k == cap) or 'nonzero' (the original
    # nonzero + gather construction, kept for reference)
    compact_method: str = "sort"
    # moment kinds spilled to host (the reference's 50M/100M CPU offload,
    # LoG/model/splitter.py:198-204): their slices arrive as step inputs
    # and leave as step outputs instead of living in HBM
    spilled: tuple = ()
    # identity fast path opt-out (LOG_TPU_IDENTITY_STEP=0). Captured at
    # cfg CONSTRUCTION so it participates in the jit cache key — reading
    # the env inside the traced fn made the decision invisible to the
    # cache and test-order dependent.
    identity_ok: bool = field(
        default_factory=lambda: os.environ.get(
            "LOG_TPU_IDENTITY_STEP", "1"
        ) != "0"
    )


UNIT_QUAT = (1.0, 0.0, 0.0, 0.0)


def _gather_slices(params: dict, index: jax.Array, lane_valid: jax.Array) -> dict:
    out = {}
    for key, val in params.items():
        s = val.at[index].get(mode="fill", fill_value=0.0)
        if key == "rotation":
            s = jnp.where(lane_valid[:, None], s, jnp.asarray(UNIT_QUAT))
        out[key] = s
    return out


def _compact_slices_gather(params: dict, keep: jax.Array, k: int):
    """Compaction for SMALL slice buckets: single-operand index sort +
    k-sized row gathers. Same output contract as _compact_slices_sort.

    The payload sort moves cap x n_cols elements through every sort pass
    (~304 ms at 12.58M rows x 23 columns — the dominant cost of the 10M
    tree-stage step, scripts/bench_trainstep_dissect.py round 5); when
    k << cap it is far cheaper to sort ONLY the position key and gather
    the k winning rows (gather cost scales with k, not cap).
    _train_step_core picks this automatically for k <= cap // 16."""
    cap = keep.shape[0]
    pos = jnp.arange(cap, dtype=jnp.uint32)
    skey = jnp.where(keep, pos, jnp.uint32(cap) + pos)
    (key_s,) = jax.lax.sort((skey,), num_keys=1, is_stable=False)
    key_s = key_s[:k]
    lane_valid = key_s < jnp.uint32(cap)
    index = jnp.where(lane_valid, key_s, jnp.uint32(cap)).astype(jnp.int32)
    slices = _gather_slices(params, index, lane_valid)
    return slices, index, lane_valid


def _compact_slices_sort(params: dict, keep: jax.Array, k: int):
    """Compaction-by-sort: kept rows to the front, in index order.

    Replaces nonzero + row gather on the TPU hot path: sort cost is FLAT
    in payload count (measured ~9 ms at 4.2M rows for 1..27 f32 payloads)
    while the row gather alone costs ~91 ms at 786k x 27 cols and
    nonzero ~21 ms at 4.2M (XLA TPU serializes gathers; sorts are fast —
    see ARCHITECTURE.md cost model). One unstable variadic sort with key
    (kept ? pos : cap + pos) carries every param column as a payload; the
    first k lanes are then exactly the nonzero+gather result.

    Returns (slices, index, lane_valid) — bit-identical layout to
    jnp.nonzero(size=k) + _gather_slices (invalid lanes zeroed, rotation
    = unit quaternion, index = cap so downstream scatters drop).
    """
    cap = keep.shape[0]
    pos = jnp.arange(cap, dtype=jnp.uint32)
    skey = jnp.where(keep, pos, jnp.uint32(cap) + pos)
    cols = []
    layout = []  # (name, ncol)
    for name, v in params.items():
        v2 = v.reshape(cap, -1)
        layout.append((name, v2.shape[1], v.shape[1:]))
        for c in range(v2.shape[1]):
            cols.append(v2[:, c])
    out = jax.lax.sort((skey,) + tuple(cols), num_keys=1, is_stable=False)
    key_s = out[0][:k]
    lane_valid = key_s < jnp.uint32(cap)
    index = jnp.where(lane_valid, key_s, jnp.uint32(cap)).astype(jnp.int32)
    slices = {}
    i = 1
    for name, ncol, tail_shape in layout:
        block = jnp.stack([out[i + c][:k] for c in range(ncol)], axis=1)
        i += ncol
        if name == "rotation":
            block = jnp.where(
                lane_valid[:, None], block, jnp.asarray(UNIT_QUAT)
            )
        else:
            block = jnp.where(
                lane_valid[:, None], block, jnp.zeros((), block.dtype)
            )
        slices[name] = block.reshape((k,) + tuple(tail_shape))
    return slices, index, lane_valid


def _compact_cols_sort(params: dict, keep: jax.Array, k: int):
    """_compact_slices_sort returning COLUMN tuples (no (k, d) stacks).

    jnp.stack of sort-output rows into (k, d) arrays costs ~0.8 ns/element
    in strided sublane writes (~30 ms/frame at the r3 bench sizes when the
    stacks cannot be DCE'd); the column-native inference path keeps every
    per-point quantity a flat (k,) array from the sort payloads through
    activation, projection, and the pair expansion's Pallas row-pack.

    Returns (cols: name -> tuple of (k,) arrays, index, lane_valid)."""
    cap = keep.shape[0]
    pos = jnp.arange(cap, dtype=jnp.uint32)
    skey = jnp.where(keep, pos, jnp.uint32(cap) + pos)
    flat_cols = []
    layout = []
    for name, v in params.items():
        v2 = v.reshape(cap, -1)
        layout.append((name, v2.shape[1]))
        for c in range(v2.shape[1]):
            flat_cols.append(v2[:, c])
    out = jax.lax.sort((skey,) + tuple(flat_cols), num_keys=1,
                       is_stable=False)
    key_s = out[0][:k]
    lane_valid = key_s < jnp.uint32(cap)
    index = jnp.where(lane_valid, key_s, jnp.uint32(cap)).astype(jnp.int32)
    cols = {}
    i = 1
    for name, ncol in layout:
        cs = []
        for c in range(ncol):
            col = out[i + c][:k]
            if name == "rotation":
                col = jnp.where(lane_valid, col, UNIT_QUAT[c])
            else:
                col = jnp.where(lane_valid, col, jnp.zeros((), col.dtype))
            cs.append(col)
        i += ncol
        cols[name] = tuple(cs)
    return cols, index, lane_valid


def _compact_flat_cols(cols: dict, keep: jax.Array, k: int):
    """Flat-column compaction dispatcher for the render frame.

    LOG_TPU_COMPACT=pallas routes to the single-pass stream-compaction
    kernel (ops/compact_pallas.py) when the capacity axis satisfies its
    contract (1024-multiple, < 2^24 rows); otherwise the payload-sort /
    index-sort+gather forms below."""
    cap = keep.shape[0]
    if (
        os.environ.get("LOG_TPU_COMPACT") == "pallas"
        and cap % 8192 == 0
        and cap < (1 << 24)
    ):
        from ..ops.compact_pallas import stream_compact_cols
        from ..ops.rasterize_tiled import _interpret_default

        return stream_compact_cols(
            cols, keep, k, interpret=_interpret_default()
        )
    return _compact_flat_cols_sort(cols, keep, k)


def _compact_flat_cols_sort(cols: dict, keep: jax.Array, k: int):
    """Compaction-by-sort over ALREADY-FLAT 1-D columns of mixed dtype
    (f32 screen coords + u32 bf16-packed pairs). Invalid lanes zero-fill —
    a zero u32 unpacks to (0.0, 0.0), i.e. opacity 0 / radius 0, so packed
    payloads need no special sentinel. Returns (slices, index, lane_valid)
    with the same contract as _compact_cols_sort.

    When k <= cap // 16 the payload sort is replaced by a single-key
    index sort + k-sized column gathers (same tradeoff as
    _compact_slices_gather). Threshold measured on-chip (round 5): at
    k/cap = 2.9%% the gathers win big (69 -> 57.5 ms realistic frame), at
    11.5%% they lose big (85 -> 117 ms headline) — serialized gather cost
    crosses the payload-sort cost between those."""
    cap = keep.shape[0]
    pos = jnp.arange(cap, dtype=jnp.uint32)
    skey = jnp.where(keep, pos, jnp.uint32(cap) + pos)
    names = list(cols)
    if k <= cap // 16:
        (key_s,) = jax.lax.sort((skey,), num_keys=1, is_stable=False)
        key_s = key_s[:k]
        lane_valid = key_s < jnp.uint32(cap)
        index = jnp.where(lane_valid, key_s, jnp.uint32(cap)).astype(
            jnp.int32
        )
        slices = {
            n: jnp.where(
                lane_valid,
                cols[n].at[index].get(mode="fill", fill_value=0),
                jnp.zeros((), cols[n].dtype),
            )
            for n in names
        }
        return slices, index, lane_valid
    out = jax.lax.sort(
        (skey,) + tuple(cols[n] for n in names), num_keys=1, is_stable=False
    )
    key_s = out[0][:k]
    lane_valid = key_s < jnp.uint32(cap)
    index = jnp.where(lane_valid, key_s, jnp.uint32(cap)).astype(jnp.int32)
    slices = {
        n: jnp.where(lane_valid, out[1 + i][:k], jnp.zeros((), out[1 + i].dtype))
        for i, n in enumerate(names)
    }
    return slices, index, lane_valid


def _use_packed_pairs() -> bool:
    env = os.environ.get("LOG_TPU_PACK_PAIRS")
    if env is not None:
        return env not in ("0", "false", "")
    return True


def _render_tiled_cols(splat_cols, colors_cols, background, image_height,
                       image_width, max_pairs, prefix_mask, interpret=None,
                       pack_pairs=None):
    """Column-native inference render: build_pairs(SplatCols) ->
    forward kernel, with_stats off. Returns (render, alpha).

    Default path packs the pair payloads (6 rows: f32 px/py + bf16-pair
    conic/opacity/rgb) — the pair sort scales ~3.2 ms/payload at bench
    sizes (scripts/bench_sortcost.py) and the packed kernel DMAs half the
    bytes. <=0.4% relative error on conic/color, below one 8-bit LSB.
    LOG_TPU_PACK_PAIRS=0 restores the full-precision rows."""
    from ..ops.rasterize_tiled import (
        _interpret_default, _raster_core, build_pairs, render_pairs_packed,
    )

    if interpret is None:
        interpret = _interpret_default()
    H, W = image_height, image_width
    if pack_pairs is None:
        pack_pairs = _use_packed_pairs()
    if pack_pairs:
        color, tfinal, total = render_pairs_packed(
            splat_cols, colors_cols, background, image_height, image_width,
            max_pairs, prefix_mask, interpret=interpret,
        )
        return color[:, :H, :W], 1.0 - tfinal[:H, :W], total
    pairs = build_pairs(
        splat_cols, colors_cols, image_height, image_width, max_pairs,
        runs_tail_only=True, active_prefix=prefix_mask, interpret=interpret,
    )
    color, tfinal, _pid, _pwp, _pair_w, _cend = _raster_core(
        pairs["pair_data"], pairs["tile_start"], pairs["tile_count"],
        background, pairs["tiles_x"], pairs["tiles_y"], False, interpret,
    )
    return color[:, :H, :W], 1.0 - tfinal[:H, :W], pairs["total"]


def _activate_and_rasterize(slices, offset, cam, background, lane_valid, cfg):
    """Param-space slice -> physical -> rasterize. Differentiable."""
    scaling = jnp.exp(slices["scaling"])
    opacity = jax.nn.sigmoid(slices["opacity"][:, 0])
    rotation = slices["rotation"] / jnp.linalg.norm(
        slices["rotation"], axis=-1, keepdims=True
    )
    colors = sh_to_rgb(slices["colors"])
    if cfg.sh_degree > 0 and "shs" in slices:
        xyz_d = jax.lax.stop_gradient(slices["xyz"])
        dirs = xyz_d - cam["camera_center"][None]
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12
        )
        colors = colors + eval_sh(dirs, slices["shs"], degree=cfg.sh_degree)
    kwargs = dict(
        xyz=slices["xyz"],
        colors=colors,
        opacity=opacity,
        scaling=scaling,
        rotation=rotation,
        means2d_offset=offset,
        world_view=cam["world_view"],
        full_proj=cam["full_proj"],
        focal_x=cam["focal_x"],
        focal_y=cam["focal_y"],
        tan_fovx=cam["tan_fovx"],
        tan_fovy=cam["tan_fovy"],
        background=background,
        image_height=cfg.image_height,
        image_width=cfg.image_width,
        active_mask=lane_valid,
        mode=cfg.mode,
        use_filter=True,
    )
    if cfg.backend == "tiled":
        from ..ops.rasterize_tiled import rasterize_tiled

        out = rasterize_tiled(
            **kwargs, max_pairs=cfg.max_pairs, with_stats=True
        )
    else:
        out = rasterize_ref.rasterize(**kwargs, chunk=cfg.chunk)
    return out


def _activate_and_rasterize_colors(slices, offset, colors, cam, background,
                                   lane_valid, cfg):
    """Aux rasterization with precomputed per-point colors (depth pass)."""
    scaling = jnp.exp(slices["scaling"])
    opacity = jax.nn.sigmoid(slices["opacity"][:, 0])
    rotation = slices["rotation"] / jnp.linalg.norm(
        slices["rotation"], axis=-1, keepdims=True
    )
    kwargs = dict(
        xyz=slices["xyz"],
        colors=colors,
        opacity=opacity,
        scaling=scaling,
        rotation=rotation,
        means2d_offset=offset,
        world_view=cam["world_view"],
        full_proj=cam["full_proj"],
        focal_x=cam["focal_x"],
        focal_y=cam["focal_y"],
        tan_fovx=cam["tan_fovx"],
        tan_fovy=cam["tan_fovy"],
        background=background,
        image_height=cfg.image_height,
        image_width=cfg.image_width,
        active_mask=lane_valid,
        mode=cfg.mode,
        use_filter=True,
    )
    if cfg.backend == "tiled":
        from ..ops.rasterize_tiled import rasterize_tiled

        return rasterize_tiled(**kwargs, max_pairs=cfg.max_pairs,
                               with_stats=False)
    return rasterize_ref.rasterize(**kwargs, chunk=cfg.chunk)


def _train_step_core(
    params: dict,
    moments: dict,
    counter: dict,
    keep_leaf: jax.Array,
    keep_node: jax.Array,
    cam: dict,
    gt: jax.Array,
    background: jax.Array,
    lrs: dict,
    global_step: jax.Array,
    corr_state: dict,  # per-view gain Adam state ({} entries ignored if off)
    view_index: jax.Array,  # () int32 current training view
    mask_ignore: jax.Array,  # (1, H, W) or (1, 1, 1) ones if unused
    gt_depth: jax.Array,  # (H, W) monocular depth (ones if unused)
    rng_key: jax.Array,  # PRNG key for depth patches
    cfg: StepConfig,
    fg_mask: jax.Array | None = None,  # (1, H, W) foreground mask (crop_loss)
    bbox: jax.Array | None = None,  # (4,) int32 [top, bottom, left, right]
    m_slices: dict | None = None,  # spilled-moment (K, ...) slices
):
    """Returns (params, moments, counter, corr_state, metrics, aux)."""
    cap = params["xyz"].shape[0]
    opt_params = {k: params[k] for k in cfg.opt_keys if k in params}
    # identity fast path: when the leaf bucket covers the whole capacity
    # (init stage at full visibility), compaction is the identity — the
    # dense rows ARE the slice. Skips the compaction sort AND (below) the
    # sparse Adam's 3 capacity-sized gathers + 3 scatters; row-for-row
    # equal to the sparse path (tests/test_train_step_identity.py) up to
    # XLA refusing the two executables the same fusion order.
    # LOG_TPU_IDENTITY_STEP=0 opts out (A/B tests that need the sparse
    # executable on both sides, e.g. spill-vs-device equality).
    identity_fast = (
        cfg.k_node == 0 and cfg.k_leaf == cap and not cfg.spilled
        and cfg.identity_ok
    )
    if identity_fast:
        index = jnp.arange(cap, dtype=jnp.int32)
        lane_valid = keep_leaf
        slices = dict(opt_params)
        # dead/padding rows may hold zero quaternions; the compacted path
        # sanitizes them to the unit quat (normalize below divides by 0)
        slices["rotation"] = jnp.where(
            lane_valid[:, None], slices["rotation"], jnp.asarray(UNIT_QUAT)
        )
    elif cfg.compact_method == "sort":
        # small buckets: index-sort + gather (cost ~k); large buckets:
        # payload sort (cost ~cap x cols but no serialized gathers)
        _compact = (
            _compact_slices_gather
            if (cfg.k_leaf + cfg.k_node) <= cap // 16
            else _compact_slices_sort
        )
        slices, index, lane_valid = _compact(
            opt_params, keep_leaf, cfg.k_leaf
        )
        if cfg.k_node > 0:
            sl_n, idx_n, lv_n = _compact(
                opt_params, keep_node, cfg.k_node
            )
            slices = {
                k: jnp.concatenate([slices[k], sl_n[k]]) for k in slices
            }
            index = jnp.concatenate([index, idx_n])
            lane_valid = jnp.concatenate([lane_valid, lv_n])
    else:
        idx_leaf = jnp.nonzero(keep_leaf, size=cfg.k_leaf, fill_value=cap)[0]
        if cfg.k_node > 0:
            idx_node = jnp.nonzero(
                keep_node, size=cfg.k_node, fill_value=cap
            )[0]
            index = jnp.concatenate([idx_leaf, idx_node])
        else:
            index = idx_leaf
        lane_valid = index < cap
        slices = _gather_slices(opt_params, index, lane_valid)
    K = index.shape[0]
    offset0 = jnp.zeros((K, 2), jnp.float32)
    if cfg.use_correction:
        correction = corr_state["values"][view_index]
    else:
        correction = jnp.ones(3, jnp.float32)

    def loss_fn(slices_, offset_, corr_):
        out = _activate_and_rasterize(
            slices_, offset_, cam, background, lane_valid, cfg
        )
        render = out["render"]
        # GT may arrive as uint8 (host->device transfer is 4x cheaper and
        # lossless for 8-bit image sources); normalize on device
        gt_f = (
            gt.astype(jnp.float32) * (1.0 / 255.0)
            if gt.dtype == jnp.uint8
            else gt
        )
        if cfg.use_correction:
            render_l1 = render * corr_[:, None, None]
        else:
            render_l1 = render
        if cfg.crop_loss:
            # MaskForeground: composite GT over the (possibly random) step
            # background inside the foreground mask
            fm = fg_mask.astype(jnp.float32)
            gt_f = gt_f * fm + (1 - fm) * background[:, None, None]
        if cfg.has_mask:
            m = mask_ignore  # (1, H, W); 1 = ignore
            if m.dtype != jnp.float32:
                m = m.astype(jnp.float32)
            gt_eff = gt_f * m + (1 - m) * background[:, None, None]
            render_ssim = gt_eff * m + render * (1 - m)
            render_l1 = gt_eff * m + render_l1 * (1 - m)
        else:
            gt_eff = gt_f
            render_ssim = render
        if cfg.crop_loss:
            # bbox-restricted loss with static shapes: weight the L1 mean by
            # the bbox indicator, and average only SSIM windows that lie
            # FULLY inside the bbox — identical to the reference's crop
            # (valid-padding windows of the crop are exactly those windows)
            t_, b_, l_, r_ = bbox[0], bbox[1], bbox[2], bbox[3]
            Hh = render.shape[1]
            Ww = render.shape[2]
            ri = jnp.arange(Hh)[None, :, None]
            ci = jnp.arange(Ww)[None, None, :]
            inb = (
                (ri >= t_) & (ri <= b_) & (ci >= l_) & (ci <= r_)
            ).astype(jnp.float32)
            cnt = jnp.maximum(jnp.sum(inb), 1.0)
            l1 = jnp.sum(jnp.abs(render_l1 - gt_eff) * inb) / (3.0 * cnt)
            win = 11
            smap = ssim_map(render_ssim, gt_eff, win)
            rim = jnp.arange(Hh - win + 1)[None, :, None]
            cim = jnp.arange(Ww - win + 1)[None, None, :]
            inw = (
                (rim >= t_) & (rim + win - 1 <= b_)
                & (cim >= l_) & (cim + win - 1 <= r_)
            ).astype(jnp.float32)
            cntw = jnp.maximum(jnp.sum(inw), 1.0)
            ssim = 1.0 - jnp.sum(smap * inw) / (3.0 * cntw)
        else:
            l1 = jnp.mean(jnp.abs(render_l1 - gt_eff))
            ssim = ssim_loss(render_ssim, gt_eff)
        loss = 0.8 * l1 + 0.2 * ssim
        if cfg.render_depth:
            # second rasterization with (camera depth, world z, 1) as colors
            # (LoG/render/renderer.py:186-201) + SSI patch loss (:268-292)
            from ..render.loss import depth_patch_loss

            depth_cols = jnp.stack(
                [
                    out["depth_cam"],
                    slices_["xyz"][:, 2],
                    jnp.ones_like(out["depth_cam"]),
                ],
                axis=-1,
            )
            aux_out = _activate_and_rasterize_colors(
                slices_, offset_, depth_cols, cam, background, lane_valid, cfg
            )
            d_loss = depth_patch_loss(
                aux_out["render"][0],
                gt_depth,
                aux_out["render"][2],
                rng_key,
            )
            loss = loss + 1.0 * d_loss
        aux = {
            "render": render,
            "radii": out["radii"],
            "point_weight": out["point_weight"],
            "point_id_pixel": out["point_id_pixel"],
            "l1": l1,
            "ssim": ssim,
        }
        return loss, aux

    (loss, aux), grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)(
        slices, offset0, correction
    )
    g_slices, g_offset, g_corr = grads
    # non-finite guard: one bad step (degenerate splat, overflow) must not
    # poison the whole model through Adam moments — zero the gradients and
    # mask the update instead (the loss metric still reports the NaN so
    # the trainer's log shows the event)
    loss_ok = jnp.isfinite(loss)
    g_slices = jax.tree.map(
        lambda g: jnp.where(loss_ok, g, jnp.zeros((), g.dtype)), g_slices
    )
    g_offset = jnp.where(loss_ok, g_offset, 0.0)
    g_corr = jnp.where(loss_ok, g_corr, 0.0)

    counter = update_counter(
        counter,
        index,
        aux["radii"],
        aux["point_weight"],
        aux["point_id_pixel"],
        g_offset,
        identity=identity_fast,
    )

    flag_vis = aux["radii"] > 0
    update_mask = (
        lane_valid & flag_vis & (jnp.arange(K) < cfg.k_leaf) & loss_ok
    )
    if cfg.spilled:
        params, moments, out_m_slices = sparse_adam_step(
            params, moments, g_slices, index, update_mask, global_step,
            lrs, spilled=cfg.spilled, m_slices=m_slices,
        )
    elif identity_fast:
        params, moments = dense_adam_step(
            params, moments, g_slices, update_mask, global_step, lrs
        )
        out_m_slices = {}
    else:
        params, moments = sparse_adam_step(
            params, moments, g_slices, index, update_mask, global_step, lrs
        )
        out_m_slices = {}

    # clamp scaling into [radius3d_min, radius3d_max]
    # (LoG/model/level_of_gaussian.py:367-377)
    params = dict(params)
    if identity_fast:
        s_all = params["scaling"]
        s_cl = jnp.clip(
            s_all,
            jnp.log(jnp.maximum(counter["radius3d_min"], 1e-12))[:, None],
            jnp.log(jnp.maximum(counter["radius3d_max"], 1e-12))[:, None],
        )
        params["scaling"] = jnp.where(update_mask[:, None], s_cl, s_all)
    else:
        sentinel_idx = jnp.where(update_mask, index, cap)
        r3min = counter["radius3d_min"].at[sentinel_idx].get(mode="fill", fill_value=1e-6)
        r3max = counter["radius3d_max"].at[sentinel_idx].get(mode="fill", fill_value=1e6)
        s = params["scaling"].at[sentinel_idx].get(mode="fill", fill_value=0.0)
        s = jnp.clip(
            s,
            jnp.log(jnp.maximum(r3min, 1e-12))[:, None],
            jnp.log(jnp.maximum(r3max, 1e-12))[:, None],
        )
        params["scaling"] = params["scaling"].at[sentinel_idx].set(s, mode="drop")

    if cfg.use_correction:
        # per-view AMSGrad Adam on the 3-channel gain
        # (LoG/model/corrector.py:35-62: log-lerp LR 0.1->0.001 over 100
        # per-view steps, eps=1e-15)
        vsteps = corr_state["steps"].at[view_index].add(1)
        st = vsteps[view_index].astype(jnp.float32)
        t = jnp.clip(st / 100.0, 0.0, 1.0)
        lr = jnp.exp(jnp.log(0.1) * (1 - t) + jnp.log(0.001) * t)
        m1 = 0.9 * corr_state["m1"][view_index] + 0.1 * g_corr
        m2 = 0.999 * corr_state["m2"][view_index] + 0.001 * g_corr * g_corr
        vmax = jnp.maximum(corr_state["vmax"][view_index], m2)
        bias1 = 1 - 0.9**st
        bias2 = 1 - 0.999**st
        denom = jnp.sqrt(vmax) / jnp.sqrt(bias2) + 1e-15
        new_val = corr_state["values"][view_index] - (lr / bias1) * (m1 / denom)
        corr_state = {
            "values": corr_state["values"].at[view_index].set(new_val),
            "m1": corr_state["m1"].at[view_index].set(m1),
            "m2": corr_state["m2"].at[view_index].set(m2),
            "vmax": corr_state["vmax"].at[view_index].set(vmax),
            "steps": vsteps,
        }

    metrics = {
        "loss": loss,
        "l1": aux["l1"],
        "ssim": aux["ssim"],
        "num_rendered": jnp.sum(flag_vis & lane_valid),
    }
    step_aux = {
        "render": aux["render"],
        "radii": aux["radii"],
        "index": index,
    }
    if cfg.spilled:
        step_aux["m_slices"] = out_m_slices
        step_aux["update_mask"] = update_mask
    return params, moments, counter, corr_state, metrics, step_aux


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0, 1, 2))
def fused_train_step(
    params,
    moments,
    counter,
    keep_leaf,
    keep_node,
    cam,
    gt,
    background,
    lrs,
    global_step,
    corr_state,
    view_index,
    mask_ignore,
    gt_depth,
    rng_key,
    cfg: StepConfig,
    fg_mask=None,
    bbox=None,
    m_slices=None,
):
    return _train_step_core(
        params, moments, counter, keep_leaf, keep_node, cam, gt, background,
        lrs, global_step, corr_state, view_index, mask_ignore, gt_depth,
        rng_key, cfg, fg_mask=fg_mask, bbox=bbox, m_slices=m_slices,
    )


def _prepare_core(
    params,
    tree_arrays,
    cam,
    n_alive,
    is_leaf_opt,
    min_resolution_pixel,
    current_depth,
    image_height,
    image_width,
    stage_has_tree,
    num_levels,
    mode,
    backend,
    max_pairs,
    check_scale,
    cut_method="traverse",
    n_roots=0,
):
    return prepare_visibility.__wrapped__(
        params, tree_arrays, cam, n_alive, is_leaf_opt, min_resolution_pixel,
        current_depth, image_height, image_width, stage_has_tree, num_levels,
        mode, backend, max_pairs, check_scale, cut_method, n_roots,
    )


@partial(
    jax.jit,
    static_argnames=(
        "stage_has_tree",
        "num_levels",
        "prep_backend",
        "prep_max_pairs",
        "check_scale",
        "cut_method",
        "n_roots",
        "cfg",
    ),
    donate_argnums=(0, 1, 2),
)
def fused_prepare_train_step(
    params,
    moments,
    counter,
    tree_arrays,
    n_alive,
    is_leaf_opt,
    min_resolution_pixel,
    current_depth,
    cam,
    gt,
    background,
    lrs,
    global_step,
    corr_state,
    view_index,
    mask_ignore,
    gt_depth,
    rng_key,
    stage_has_tree: bool,
    num_levels: int,
    prep_backend: str,
    prep_max_pairs: int,
    check_scale: int,
    cfg: StepConfig,
    fg_mask=None,
    bbox=None,
    cut_method: str = "traverse",
    n_roots: int = 0,
):
    """Visibility + LoD cut + the whole training step in ONE executable.

    The (k_leaf, k_node) bucket in `cfg` comes from the PREVIOUS step's
    counts (temporal coherence); this step's counts are returned so the host
    can grow the bucket for the next step. A transient overflow truncates the
    cut for one step — the same points render next step.
    """
    keep_leaf, keep_node, counts = _prepare_core(
        params, tree_arrays, cam, n_alive, is_leaf_opt, min_resolution_pixel,
        current_depth, cfg.image_height, cfg.image_width, stage_has_tree,
        num_levels, cfg.mode, prep_backend, prep_max_pairs, check_scale,
        cut_method, n_roots,
    )
    params, moments, counter, corr_state, metrics, aux = _train_step_core(
        params, moments, counter, keep_leaf, keep_node, cam, gt, background,
        lrs, global_step, corr_state, view_index, mask_ignore, gt_depth,
        rng_key, cfg, fg_mask=fg_mask, bbox=bbox,
    )
    metrics = dict(metrics)
    metrics["counts"] = counts
    aux = dict(aux)
    aux["keep_mask"] = keep_leaf | keep_node
    return params, moments, counter, corr_state, metrics, aux


@partial(
    jax.jit,
    static_argnames=(
        "image_height",
        "image_width",
        "k_visible",
        "sh_degree",
        "stage_has_tree",
        "num_levels",
        "mode",
        "backend",
        "max_pairs",
        "check_scale",
        "cut_method",
        "n_roots",
        "prep_backend",
        "prep_max_pairs",
        "use_filter",
        "check_cull",
        "pack_pairs",
        "cap_sort",
    ),
)
def fused_prepare_render(
    params: dict,
    tree_arrays: dict,
    cam: dict,
    n_alive: jax.Array,
    is_leaf_opt: jax.Array,
    min_resolution_pixel: jax.Array,
    current_depth: jax.Array,
    background: jax.Array,
    image_height: int,
    image_width: int,
    k_visible: int,
    sh_degree: int,
    stage_has_tree: bool,
    num_levels: int,
    mode: str = "antialias",
    backend: str = "tiled",
    max_pairs: int = 1 << 20,
    check_scale: int = 1,
    cut_method: str = "flat",
    n_roots: int = 0,
    prep_backend: str = "tiled",
    prep_max_pairs: int = 1 << 20,
    use_filter: bool = False,
    check_cull: bool = True,
    pack_pairs: bool | None = None,
    cap_sort: int = 0,
    w_full=None,
):
    """Inference: LoD cut + slice gather + activation + render in ONE
    executable — zero per-frame host syncs (the demo/viewer/bench hot path;
    reference timing loop: /root/reference/apps/train.py:41-83). k_visible
    is a static cut budget; overflow truncates the cut for that frame.
    Returns (render (3,H,W), alpha (H,W), counts (2,)).

    cut_method='flat_slice': gather-free pre-cut (flat_cut_pre via the
    per-point cached root center, tree_arrays['root_xyz']) + the weight
    cull applied AFTER compaction as a k-sized gather — moves the ~38 ms
    root_visible[root_id] capacity-axis gather onto the slice axis.
    Weight-culled lanes become interior holes in the active mask, so the
    rasterizer receives the pure compaction prefix separately
    (prefix_mask) to keep the Pallas expansion's tail-only-zeros contract.

    w_full: optional (cap,) bool — a cached capacity-axis weight-cull mask
    (weight_ok[root_id], refreshed every `check_render_every` frames by the
    caller). When given, it folds into `keep` ELEMENTWISE before compaction
    and the per-frame check render + slice-axis gather are skipped entirely
    (the cull is conservative — it only drops roots whose max blend weight
    is < 1e-8 — so a few frames of staleness change the image below 8-bit
    visibility; the reference recomputes it per frame,
    LoG/model/level_of_gaussian.py:238-241).
    """
    cap = params["xyz"].shape[0]
    if w_full is not None and w_full.shape[0] == cap and 0 < cap_sort < cap:
        w_full = w_full[:cap_sort]
    if 0 < cap_sort < cap:
        # every dense stage (radius passes, cut, compaction sort) is
        # linear in the capacity axis; points past the alive bucket are
        # dead by construction (alive = arange < n_alive <= cap_sort), so
        # slicing to a static n_alive bucket is exact. Caller picks the
        # bucket (model.render_fused: next_capacity(num_points)) to bound
        # recompiles to densification cadence.
        assert cap_sort >= k_visible, (cap_sort, k_visible)
        params = {k: v[:cap_sort] for k, v in params.items()}
        tree_arrays = {
            k: (v[:cap_sort] if v.ndim >= 1 and v.shape[0] == cap else v)
            for k, v in tree_arrays.items()
        }
        is_leaf_opt = is_leaf_opt[:cap_sort]
        cap = cap_sort
    need = ["xyz", "colors", "scaling", "opacity", "rotation"]
    if sh_degree > 0 and "shs" in params:
        need.append("shs")
    if cut_method == "flat_slice" and stage_has_tree:
        from ..ops import gaussian_math as gm
        from .tensor_tree import flat_cut_pre

        alive = jnp.arange(cap) < n_alive
        rx = tree_arrays["root_xyz"]
        rpx, rpy, rpz, _ = gm.project_ndc_c(
            rx[..., 0], rx[..., 1], rx[..., 2], cam["full_proj"]
        )
        root_frus = gm.frustum_flag_c(rpx, rpy, rpz, padding=0.5) & alive
        radius2d_parent = gm.compute_radius2d(
            tree_arrays["parent_xyz"],
            jnp.exp(tree_arrays["parent_scaling"]),
            tree_arrays["parent_rotation"] / jnp.maximum(
                jnp.linalg.norm(
                    tree_arrays["parent_rotation"], axis=-1, keepdims=True
                ),
                1e-12,
            ),
            cam["world_view"], cam["full_proj"], cam["focal_x"],
            cam["focal_y"], cam["tan_fovx"], cam["tan_fovy"],
        )
        use_cols = backend == "tiled"
        packed_compact = (
            pack_pairs if pack_pairs is not None else _use_packed_pairs()
        )
        if use_cols and packed_compact:
            # packed fast path: project the FULL capacity axis first (one
            # cov2d evaluation feeds both the LoD-cut radius and the render
            # splats), bf16-pack the splat columns, and run the compaction
            # sort over 7-8 payloads instead of 16 raw param columns (sort
            # cost ~2.6 ms/payload at 3.4M rows — the single largest stage
            # of the round-3 frame profile). Precision is identical to the
            # packed pair pipeline: conic/opacity/rgb were already rounded
            # to bf16 at the pair stage; packing them before compaction
            # moves the rounding earlier, px/py/depth stay f32.
            from ..ops.projection import SplatCols, project_gaussians_cols
            from ..ops.rasterize_tiled import _pack2_bf16, _unpack2_bf16

            op_full = jax.nn.sigmoid(params["opacity"][:, 0])
            splat_full, radius2d = project_gaussians_cols(
                params["xyz"][:, 0], params["xyz"][:, 1],
                params["xyz"][:, 2],
                jnp.exp(params["scaling"][:, 0]),
                jnp.exp(params["scaling"][:, 1]),
                jnp.exp(params["scaling"][:, 2]),
                params["rotation"][:, 0], params["rotation"][:, 1],
                params["rotation"][:, 2], params["rotation"][:, 3],
                op_full, cam["world_view"], cam["full_proj"],
                cam["focal_x"], cam["focal_y"], cam["tan_fovx"],
                cam["tan_fovy"], image_height, image_width, mode=mode,
                use_filter=use_filter, active_mask=alive,
                tight_radius=True, with_cut_radius=True,
            )
            keep = flat_cut_pre(
                tree_arrays["index_parent"], tree_arrays["node_index"],
                tree_arrays["depth"], root_frus, radius2d, radius2d_parent,
                alive, min_resolution_pixel, current_depth,
            )
            if w_full is not None:
                keep = keep & w_full
            counts = jnp.stack(
                [jnp.sum(keep & is_leaf_opt), jnp.sum(keep & ~is_leaf_opt)]
            )
            # radius inflated by 2^-7 before the bf16 round so rounding can
            # only GROW the tile rect (a shrunk rect could clip a tile row)
            rad_up = splat_full.radius * (1.0 + 2.0 ** -7)
            col_r = sh_to_rgb(params["colors"][:, 0])
            col_g = sh_to_rgb(params["colors"][:, 1])
            col_b = sh_to_rgb(params["colors"][:, 2])
            if sh_degree > 0 and "shs" in params:
                # view-dependent SH color evaluated on the FULL capacity
                # axis BEFORE compaction (directions are per-point; the
                # pair pipeline then carries plain rgb like the sh=0 path;
                # reference evaluates on the visible slice,
                # LoG/model/level_of_gaussian.py:293-294 — same math)
                dirs = params["xyz"] - cam["camera_center"][None]
                dirs = dirs / jnp.maximum(
                    jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12
                )
                sh_rgb = eval_sh(dirs, params["shs"], degree=sh_degree)
                col_r = col_r + sh_rgb[:, 0]
                col_g = col_g + sh_rgb[:, 1]
                col_b = col_b + sh_rgb[:, 2]
            sort_cols = {
                "px": splat_full.px,
                "py": splat_full.py,
                "depth": splat_full.depth,
                "p1": _pack2_bf16(splat_full.cxx, splat_full.cxy),
                "p2": _pack2_bf16(splat_full.cyy, splat_full.opacity),
                "p3": _pack2_bf16(col_r, col_g),
                "p4": _pack2_bf16(col_b, rad_up),
            }
            per_frame_cull = check_cull and w_full is None
            if per_frame_cull:
                sort_cols["root_id"] = tree_arrays["root_id"]
            cols_s, index, lane_prefix = _compact_flat_cols(
                sort_cols, keep, k_visible
            )
            if per_frame_cull:
                R = n_roots if 0 < n_roots <= cap else cap
                cand = (
                    gm.frustum_flag_c(rpx[:R], rpy[:R], rpz[:R], padding=0.5)
                    & (tree_arrays["index_parent"][:R] == -1)
                    & alive[:R]
                )
                rot_r = params["rotation"][:R]
                weight_ok = _check_root_weights(
                    params["xyz"][:R], op_full[:R],
                    jnp.exp(params["scaling"][:R]),
                    rot_r / jnp.maximum(
                        jnp.linalg.norm(rot_r, axis=-1, keepdims=True), 1e-12
                    ),
                    cand, cam, image_height, image_width, mode, prep_backend,
                    prep_max_pairs, check_scale,
                )
                w_sl = jnp.take(
                    weight_ok,
                    jnp.clip(cols_s["root_id"].astype(jnp.int32), 0, R - 1),
                )
                lane_valid = lane_prefix & w_sl
            else:
                lane_valid = lane_prefix
            cxx_sl, cxy_sl = _unpack2_bf16(cols_s["p1"])
            cyy_sl, op_sl = _unpack2_bf16(cols_s["p2"])
            r_sl, g_sl = _unpack2_bf16(cols_s["p3"])
            b_sl, rad_sl = _unpack2_bf16(cols_s["p4"])
            valid = lane_valid & (rad_sl > 0)
            splat_cols = SplatCols(
                px=cols_s["px"], py=cols_s["py"], cxx=cxx_sl, cxy=cxy_sl,
                cyy=cyy_sl, opacity=jnp.where(valid, op_sl, 0.0),
                depth=cols_s["depth"],
                radius=jnp.where(valid, rad_sl, 0.0), valid=valid,
            )
            render, alpha, pair_total = _render_tiled_cols(
                splat_cols, (r_sl, g_sl, b_sl), background, image_height,
                image_width, max_pairs, lane_prefix, pack_pairs=True,
            )
            # counts row 2: the frame's UNCLAMPED pair demand — callers
            # (model.render_fused) right-size the next frames' max_pairs
            # bucket from it instead of the k_visible*6 worst case
            return render, alpha, jnp.concatenate(
                [counts, pair_total[None]]
            )
        scaling_full = jnp.exp(params["scaling"])
        rotation_full = params["rotation"] / jnp.maximum(
            jnp.linalg.norm(params["rotation"], axis=-1, keepdims=True),
            1e-12,
        )
        radius2d = gm.compute_radius2d(
            params["xyz"], scaling_full, rotation_full, cam["world_view"],
            cam["full_proj"], cam["focal_x"], cam["focal_y"],
            cam["tan_fovx"], cam["tan_fovy"],
        )
        keep = flat_cut_pre(
            tree_arrays["index_parent"], tree_arrays["node_index"],
            tree_arrays["depth"], root_frus, radius2d, radius2d_parent,
            alive, min_resolution_pixel, current_depth,
        )
        if w_full is not None:
            keep = keep & w_full
        counts = jnp.stack(
            [jnp.sum(keep & is_leaf_opt), jnp.sum(keep & ~is_leaf_opt)]
        )
        if use_cols and "shs" not in need:
            # column-native fast path: the compaction sort's outputs stay
            # 1-D columns through activation/projection/pair rows — the
            # (k, d) stacks they replace cost ~30 ms/frame at bench sizes
            # (strided sublane writes; ARCHITECTURE.md round-3 notes)
            from ..ops.projection import project_gaussians_cols

            cols_in = {kk: params[kk] for kk in need}
            cols_in["root_id"] = tree_arrays["root_id"][:, None]
            cols, index, lane_prefix = _compact_cols_sort(
                cols_in, keep, k_visible
            )
            root_id_sl = cols.pop("root_id")[0]
            if check_cull and w_full is None:
                R = n_roots if 0 < n_roots <= cap else cap
                cand = (
                    gm.frustum_flag_c(rpx[:R], rpy[:R], rpz[:R], padding=0.5)
                    & (tree_arrays["index_parent"][:R] == -1)
                    & alive[:R]
                )
                weight_ok = _check_root_weights(
                    params["xyz"][:R],
                    jax.nn.sigmoid(params["opacity"][:R, 0]),
                    scaling_full[:R], rotation_full[:R], cand, cam,
                    image_height, image_width, mode, prep_backend,
                    prep_max_pairs, check_scale,
                )
                w_sl = jnp.take(
                    weight_ok,
                    jnp.clip(root_id_sl.astype(jnp.int32), 0, R - 1),
                )
                lane_valid = lane_prefix & w_sl
            else:
                lane_valid = lane_prefix
            x, yy, zz = cols["xyz"]
            sx, sy, sz = (jnp.exp(c) for c in cols["scaling"])
            opacity_c = jax.nn.sigmoid(cols["opacity"][0])
            qw, qx, qy, qz = cols["rotation"]
            col_rgb = tuple(sh_to_rgb(c) for c in cols["colors"])
            splat_cols = project_gaussians_cols(
                x, yy, zz, sx, sy, sz, qw, qx, qy, qz, opacity_c,
                cam["world_view"], cam["full_proj"], cam["focal_x"],
                cam["focal_y"], cam["tan_fovx"], cam["tan_fovy"],
                image_height, image_width, mode=mode,
                use_filter=use_filter, active_mask=lane_valid,
                tight_radius=True,
            )
            render, alpha, pair_total = _render_tiled_cols(
                splat_cols, col_rgb, background, image_height, image_width,
                max_pairs, lane_prefix, pack_pairs=pack_pairs,
            )
            return render, alpha, jnp.concatenate(
                [counts, pair_total[None]]
            )
        cols = {kk: params[kk] for kk in need}
        cols["root_id"] = tree_arrays["root_id"][:, None]
        slices, index, lane_prefix = _compact_slices_sort(
            cols, keep, k_visible
        )
        root_id_sl = slices.pop("root_id")[:, 0]
        if check_cull and w_full is None:
            R = n_roots if 0 < n_roots <= cap else cap
            xyz_r = params["xyz"][:R]
            cand = (
                gm.frustum_flag_c(rpx[:R], rpy[:R], rpz[:R], padding=0.5)
                & (tree_arrays["index_parent"][:R] == -1)
                & alive[:R]
            )
            weight_ok = _check_root_weights(
                xyz_r, jax.nn.sigmoid(params["opacity"][:R, 0]),
                scaling_full[:R], rotation_full[:R], cand, cam,
                image_height, image_width, mode, prep_backend,
                prep_max_pairs, check_scale,
            )
            w_sl = jnp.take(weight_ok, jnp.clip(root_id_sl, 0, R - 1))
            lane_valid = lane_prefix & w_sl
        else:
            # check_cull=False skips the weight-render cull (a conservative
            # occlusion cull: it only drops roots whose max blend weight is
            # < 1e-8, so the image changes below 8-bit visibility) — both a
            # perf knob and the contract of the multi-chip sharded render
            lane_valid = lane_prefix
    else:
        keep_leaf, keep_node, counts = _prepare_core(
            params, tree_arrays, cam, n_alive, is_leaf_opt,
            min_resolution_pixel, current_depth, image_height, image_width,
            stage_has_tree, num_levels, mode, prep_backend, prep_max_pairs,
            check_scale, cut_method, n_roots,
        )
        keep = keep_leaf | keep_node
        slices, index, lane_valid = _compact_slices_sort(
            {kk: params[kk] for kk in need}, keep, k_visible
        )
        lane_prefix = lane_valid
    cfg = StepConfig(
        image_height=image_height,
        image_width=image_width,
        k_leaf=k_visible,
        k_node=0,
        sh_degree=sh_degree,
        mode=mode,
        backend=backend,
        max_pairs=max_pairs,
    )
    scaling = jnp.exp(slices["scaling"])
    opacity = jax.nn.sigmoid(slices["opacity"][:, 0])
    rotation = slices["rotation"] / jnp.linalg.norm(
        slices["rotation"], axis=-1, keepdims=True
    )
    colors = sh_to_rgb(slices["colors"])
    if sh_degree > 0 and "shs" in slices:
        dirs = slices["xyz"] - cam["camera_center"][None]
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12
        )
        colors = colors + eval_sh(dirs, slices["shs"], degree=sh_degree)
    kwargs = dict(
        xyz=slices["xyz"],
        colors=colors,
        opacity=opacity,
        scaling=scaling,
        rotation=rotation,
        means2d_offset=jnp.zeros((k_visible, 2), jnp.float32),
        world_view=cam["world_view"],
        full_proj=cam["full_proj"],
        focal_x=cam["focal_x"],
        focal_y=cam["focal_y"],
        tan_fovx=cam["tan_fovx"],
        tan_fovy=cam["tan_fovy"],
        background=background,
        image_height=image_height,
        image_width=image_width,
        active_mask=lane_valid,
        mode=mode,
        use_filter=use_filter,
    )
    if backend == "tiled":
        from ..ops.rasterize_tiled import rasterize_tiled

        out = rasterize_tiled(
            **kwargs, max_pairs=max_pairs, with_stats=False,
            tight_radius=True, runs_tail_only=True,
            prefix_mask=lane_prefix,
        )
    else:
        out = rasterize_ref.rasterize(**kwargs)
    return out["render"], out["alpha"], jnp.concatenate(
        [counts, jnp.full((1,), -1, counts.dtype)]
    )


def _check_root_weights(
    xyz, opacity, scaling, rotation, root_candidate, cam,
    image_height, image_width, mode, backend, max_pairs, check_scale,
):
    """Weight-render cull of ROOT rows (render_to_check;
    LoG/model/level_of_gaussian.py:207-241): low-res render of candidate
    roots, keep those with max blend weight > 1e-8. Inputs are the root
    PREFIX rows (activated); returns (R,) bool."""
    # the weight-cull render may run at reduced resolution (the 1e-8
    # threshold is a coarse occlusion test; urban configs set check_scale=4)
    chk_h = max(image_height // check_scale, 8)
    chk_w = max(image_width // check_scale, 128)
    if backend == "tiled":
        from ..ops.rasterize_tiled import rasterize_tiled

        # Compact the candidates to a prefix first: the binning then rides
        # the Pallas tail-only expansion instead of the (P + A)-row
        # merge-by-sort construction (~11 ms at R=1M), and gid_ids carries
        # the ORIGINAL row ids so point_weight lands directly in row space
        # (no un-compaction scatter; sorts >> scatters on TPU).
        R = xyz.shape[0]
        cols = {
            "xyz": xyz, "opacity": opacity[:, None], "scaling": scaling,
            "rotation": rotation,
        }
        slices, index, lane_valid = _compact_slices_sort(
            cols, root_candidate, R
        )
        check = rasterize_tiled(
            xyz=slices["xyz"],
            colors=jnp.ones_like(slices["xyz"]),
            opacity=slices["opacity"][:, 0],
            scaling=slices["scaling"],
            rotation=slices["rotation"],
            means2d_offset=jnp.zeros((R, 2), jnp.float32),
            world_view=cam["world_view"],
            full_proj=cam["full_proj"],
            focal_x=cam["focal_x"] / check_scale,
            focal_y=cam["focal_y"] / check_scale,
            tan_fovx=cam["tan_fovx"],
            tan_fovy=cam["tan_fovy"],
            background=jnp.zeros(3),
            image_height=chk_h,
            image_width=chk_w,
            active_mask=lane_valid,
            mode=mode,
            use_filter=True,
            max_pairs=max_pairs,
            # "weights": the cull only needs point_weight — skip the
            # per-pixel argmax bookkeeping of full stats mode.
            # tight_radius: the 1e-8 weight cull only drops invisible
            # points; truncating rects at the 1/255 contribution contour
            # culls the same set while shrinking the pair workload
            with_stats="weights",
            tight_radius=True,
            runs_tail_only=True,
            prefix_mask=lane_valid,
            gid_ids=index,
        )
        return check["point_weight"] > 1e-8
    check = rasterize_ref.rasterize(
        xyz=xyz,
        colors=jnp.ones_like(xyz),
        opacity=opacity,
        scaling=scaling,
        rotation=rotation,
        means2d_offset=jnp.zeros_like(xyz[:, :2]),
        world_view=cam["world_view"],
        full_proj=cam["full_proj"],
        focal_x=cam["focal_x"] / check_scale,
        focal_y=cam["focal_y"] / check_scale,
        tan_fovx=cam["tan_fovx"],
        tan_fovy=cam["tan_fovy"],
        background=jnp.zeros(3),
        image_height=chk_h,
        image_width=chk_w,
        active_mask=root_candidate,
        mode=mode,
        use_filter=True,
        chunk=64,
    )
    return check["point_weight"] > 1e-8


@partial(
    jax.jit,
    static_argnames=(
        "image_height",
        "image_width",
        "mode",
        "prep_backend",
        "prep_max_pairs",
        "check_scale",
        "n_roots",
        "cap_sort",
    ),
)
def fused_root_cull(
    params: dict,
    tree_arrays: dict,
    cam: dict,
    n_alive: jax.Array,
    image_height: int,
    image_width: int,
    mode: str = "antialias",
    prep_backend: str = "tiled",
    prep_max_pairs: int = 1 << 20,
    check_scale: int = 1,
    n_roots: int = 0,
    cap_sort: int = 0,
):
    """Capacity-axis weight-cull mask: run the root check render
    (render_to_check semantics, LoG/model/level_of_gaussian.py:207-241)
    and expand weight_ok to every point via its cached root_id — ONE
    capacity-axis gather. The result feeds fused_prepare_render(w_full=...)
    which folds it into the LoD cut ELEMENTWISE, so frames between
    refreshes pay neither the check render nor the per-frame slice gather
    (the cull is conservative: threshold 1e-8 max blend weight).
    Returns (cap_sort,) bool."""
    from ..ops import gaussian_math as gm

    cap = params["xyz"].shape[0]
    if 0 < cap_sort < cap:
        params = {k: v[:cap_sort] for k, v in params.items()}
        tree_arrays = {
            k: (v[:cap_sort] if v.ndim >= 1 and v.shape[0] == cap else v)
            for k, v in tree_arrays.items()
        }
        cap = cap_sort
    alive = jnp.arange(cap) < n_alive
    R = n_roots if 0 < n_roots <= cap else cap
    x = params["xyz"][:R]
    px, py, pz, _ = gm.project_ndc_c(
        x[:, 0], x[:, 1], x[:, 2], cam["full_proj"]
    )
    cand = (
        gm.frustum_flag_c(px, py, pz, padding=0.5)
        & (tree_arrays["index_parent"][:R] == -1)
        & alive[:R]
    )
    rot_r = params["rotation"][:R]
    weight_ok = _check_root_weights(
        x,
        jax.nn.sigmoid(params["opacity"][:R, 0]),
        jnp.exp(params["scaling"][:R]),
        rot_r / jnp.maximum(
            jnp.linalg.norm(rot_r, axis=-1, keepdims=True), 1e-12
        ),
        cand, cam, image_height, image_width, mode, prep_backend,
        prep_max_pairs, check_scale,
    )
    return expand_weight_full(weight_ok, tree_arrays, cap, R)


def expand_weight_full(weight_ok, tree_arrays, cap: int, R: int):
    """Expand the per-root weight-cull verdict (R,) to every row (cap,).

    Default: one capacity-axis gather w[root_id] (~9.8 ms/M rows on v5e).
    When the layout provides root-contiguous TAIL segments
    (tree_arrays["cull_seg_starts"], see synth_tree.padded_model_device /
    LoG.optimize_render_layout root_major), the expansion is gather-free:
    scatter-max of rank-encoded codes at the R static segment starts +
    one cummax segment broadcast (~6 ms at 3.4M rows — measured in
    scripts/probe_prims.py). Duplicate starts (empty segments) resolve
    correctly because scatter-max picks the LARGEST rank sharing a
    position, which is exactly the owning (first non-empty) segment."""
    seg = tree_arrays.get("cull_seg_starts")
    if seg is None:
        return jnp.take(
            weight_ok,
            jnp.clip(tree_arrays["root_id"].astype(jnp.int32), 0, R - 1),
        )
    ranks = jnp.arange(R, dtype=jnp.int32)
    code = (ranks << 2) | (weight_ok.astype(jnp.int32) << 1) | 1
    b = jnp.zeros(cap, jnp.int32).at[seg[:R]].max(code, mode="drop")
    m = jax.lax.cummax(b)
    w_tail = ((m >> 1) & 1).astype(jnp.bool_)
    is_root_row = tree_arrays["index_parent"] == -1
    w_prefix = jnp.pad(weight_ok, (0, cap - R)) if cap > R else weight_ok[:cap]
    row_in_prefix = jnp.arange(cap) < R
    return jnp.where(row_in_prefix & is_root_row, w_prefix, w_tail)


@partial(
    jax.jit,
    static_argnames=(
        "image_height",
        "image_width",
        "stage_has_tree",
        "num_levels",
        "mode",
        "backend",
        "max_pairs",
        "check_scale",
        "cut_method",
        "n_roots",
    ),
)
def prepare_visibility(
    params: dict,
    tree_arrays: dict,
    cam: dict,
    n_alive: jax.Array,
    is_leaf_opt: jax.Array,  # per-point flag: belongs to the optimized set
    min_resolution_pixel: jax.Array,
    current_depth: jax.Array,
    image_height: int,
    image_width: int,
    stage_has_tree: bool,
    num_levels: int,
    mode: str = "antialias",
    backend: str = "reference",
    max_pairs: int = 1 << 18,
    check_scale: int = 1,
    cut_method: str = "traverse",
    n_roots: int = 0,
):
    """Per-camera visibility + LoD cut. Returns (keep_leaf, keep_node, counts).

    Reproduces LoG/model/level_of_gaussian.py:223-256: frustum cull (padding
    0.5) -> weight-render cull of roots (point_weight > 1e-8) -> tree cut ->
    leaf/node split. For the treeless init stage: frustum only.

    cut_method='flat' uses the one-gather predicate (tensor_tree.flat_cut);
    tree_arrays must then also carry root_id + parent_{xyz,scaling,rotation}
    (the LoG model's parent-attribute cache). n_roots>0 restricts the
    weight-cull render to the root PREFIX rows [0, n_roots) — valid because
    roots always occupy the first rows (children are only ever appended) —
    so its pair-binning cost scales with the root count, not capacity.
    """
    from ..ops import gaussian_math as gm
    from .tensor_tree import flat_cut, traverse_cut

    cap = params["xyz"].shape[0]
    alive = jnp.arange(cap) < n_alive
    xyz = params["xyz"]
    px, py, pz, _ = gm.project_ndc_c(
        xyz[..., 0], xyz[..., 1], xyz[..., 2], cam["full_proj"]
    )
    in_frustum = gm.frustum_flag_c(px, py, pz, padding=0.5) & alive

    if not stage_has_tree:
        keep_leaf = in_frustum
        keep_node = jnp.zeros_like(keep_leaf)
        counts = jnp.stack([jnp.sum(keep_leaf), jnp.sum(keep_node)])
        return keep_leaf, keep_node, counts

    is_root = tree_arrays["index_parent"] == -1
    root_candidate = is_root & in_frustum
    # weight-render cull of roots (render_to_check;
    # LoG/model/level_of_gaussian.py:207-241)
    scaling = jnp.exp(params["scaling"])
    rotation = params["rotation"] / jnp.linalg.norm(
        params["rotation"], axis=-1, keepdims=True
    )
    opacity = jax.nn.sigmoid(params["opacity"][:, 0])
    R = n_roots if 0 < n_roots <= cap else cap

    def pfx(a):
        return a[:R]

    root_weight_ok = _check_root_weights(
        pfx(xyz), pfx(opacity), pfx(scaling), pfx(rotation),
        pfx(root_candidate), cam, image_height, image_width, mode, backend,
        max_pairs, check_scale,
    )
    if R < cap:
        root_weight_ok = jnp.concatenate(
            [root_weight_ok, jnp.zeros((cap - R,), bool)]
        )
    root_visible = root_candidate & root_weight_ok

    radius2d = gm.compute_radius2d(
        xyz,
        scaling,
        rotation,
        cam["world_view"],
        cam["full_proj"],
        cam["focal_x"],
        cam["focal_y"],
        cam["tan_fovx"],
        cam["tan_fovy"],
    )
    if cut_method == "flat":
        p_scaling = jnp.exp(tree_arrays["parent_scaling"])
        p_rotation = tree_arrays["parent_rotation"] / jnp.maximum(
            jnp.linalg.norm(
                tree_arrays["parent_rotation"], axis=-1, keepdims=True
            ),
            1e-12,
        )
        radius2d_parent = gm.compute_radius2d(
            tree_arrays["parent_xyz"],
            p_scaling,
            p_rotation,
            cam["world_view"],
            cam["full_proj"],
            cam["focal_x"],
            cam["focal_y"],
            cam["tan_fovx"],
            cam["tan_fovy"],
        )
        keep = flat_cut(
            tree_arrays["index_parent"],
            tree_arrays["node_index"],
            tree_arrays["depth"],
            tree_arrays["root_id"],
            radius2d,
            radius2d_parent,
            root_visible,
            alive,
            min_resolution_pixel,
            current_depth,
        )
    else:
        keep = traverse_cut(
            tree_arrays["node_index"],
            tree_arrays["index_parent"],
            tree_arrays["depth"],
            radius2d,
            root_visible,
            alive,
            min_resolution_pixel,
            current_depth,
            num_levels,
        )
    keep_leaf = keep & is_leaf_opt
    keep_node = keep & ~is_leaf_opt
    counts = jnp.stack([jnp.sum(keep_leaf), jnp.sum(keep_node)])
    return keep_leaf, keep_node, counts
