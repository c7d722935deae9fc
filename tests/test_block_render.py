"""Block-pruned inference render (log_tpu/model/block_render.py):

1. the block path must reproduce the flat_slice fused frame (inputs ride
   bf16 prepacks, so equality is PSNR-grade, not bitwise);
2. pruning must be SOUND: rendering with only the eligible blocks equals
   rendering with every block force-eligible;
3. a partial-view camera must actually prune blocks.
"""
import math

import numpy as np
import jax
import jax.numpy as jnp

from log_tpu.dataset.base import prepare_camera
from log_tpu.model.block_render import (
    block_eligibility, block_size_for, build_block_cache, render_blocks,
)
from log_tpu.model.gaussian import next_capacity
from log_tpu.model.train_step import fused_prepare_render
from log_tpu.render.renderer import camera_device
from log_tpu.utils.synth_tree import padded_model_device, tree_sizes

H, W = 64, 128


def make_cam(theta, radius=22.0, height=18.0, focal=80.0):
    pos = np.array(
        [radius * math.cos(theta), radius * math.sin(theta), height]
    )
    fwd = -pos / np.linalg.norm(pos)
    right = np.cross(fwd, np.array([0, 0, 1.0]))
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    R = np.stack([right, up, fwd])
    T = (-R @ pos).reshape(3, 1)
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]])
    return camera_device(
        prepare_camera(
            {"K": K, "R": R, "T": T, "H": H, "W": W,
             "center": pos.reshape(3, 1)},
            1, 0.01, 1000.0,
        )
    )


def _scene(n_roots=3000, seed=0):
    _, _, n = tree_sizes(n_roots)
    cap = next_capacity(n)
    params, tree_dev, is_leaf_opt = padded_model_device(
        jax.random.PRNGKey(seed), n_roots, cap
    )
    return params, tree_dev, is_leaf_opt, n, cap


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return 10.0 * math.log10(1.0 / max(mse, 1e-12))


def test_block_render_matches_flat_slice():
    params, tree_dev, is_leaf_opt, n, cap = _scene()
    S = block_size_for(cap, target=512)
    B = cap // S
    cols, meta = build_block_cache(
        params, tree_dev, is_leaf_opt, jnp.int32(n), S
    )
    cam = make_cam(0.4)
    k_vis = next_capacity(n, 256)
    img_b, alpha_b, counts_b = render_blocks(
        cols, meta, cam, jnp.float32(3.0), jnp.int32(20),
        jnp.zeros(3, jnp.float32), H, W,
        k_blocks=B, k_visible=k_vis, max_pairs=1 << 16,
    )
    img_f, alpha_f, counts_f = fused_prepare_render(
        params, tree_dev, cam,
        n_alive=jnp.int32(n), is_leaf_opt=is_leaf_opt,
        min_resolution_pixel=jnp.float32(3.0), current_depth=jnp.int32(20),
        background=jnp.zeros(3, jnp.float32),
        image_height=H, image_width=W, k_visible=k_vis,
        sh_degree=0, stage_has_tree=True, num_levels=3,
        backend="tiled", max_pairs=1 << 16, check_scale=4,
        cut_method="flat_slice", n_roots=min(next_capacity(3000, 256), cap),
        prep_backend="tiled", prep_max_pairs=1 << 15,
        check_cull=False,
    )
    # bf16 prepack (cov3d/rgb/opacity/parent/root) vs f32 params: PSNR-
    # grade equality; borderline LoD-threshold flips swap a splat for its
    # children (both approximate the same region)
    cut_b = int(np.asarray(counts_b)[:2].sum())
    cut_f = int(np.asarray(counts_f)[:2].sum())
    assert cut_b > 0
    assert abs(cut_b - cut_f) <= max(64, int(0.02 * cut_f))
    assert _psnr(img_b, img_f) > 35.0, _psnr(img_b, img_f)
    assert _psnr(alpha_b, alpha_f) > 35.0


def test_block_pruning_is_sound():
    """Eligible-only rendering == all-blocks rendering, on a close-up
    camera that prunes a real fraction of the blocks."""
    params, tree_dev, is_leaf_opt, n, cap = _scene(seed=3)
    S = block_size_for(cap, target=256)
    B = cap // S
    cols, meta = build_block_cache(
        params, tree_dev, is_leaf_opt, jnp.int32(n), S
    )
    # close-in, narrow view: most of the scene is outside the frustum
    cam = make_cam(1.0, radius=6.0, height=3.0, focal=220.0)
    elig = np.asarray(block_eligibility(meta, cam, jnp.float32(3.0)))
    n_elig = int(elig.sum())
    k_vis = next_capacity(n, 256)

    def run(kb):
        img, alpha, counts = render_blocks(
            cols, meta, cam, jnp.float32(3.0), jnp.int32(20),
            jnp.zeros(3, jnp.float32), H, W,
            k_blocks=kb, k_visible=k_vis, max_pairs=1 << 16,
        )
        return np.asarray(img), np.asarray(alpha), np.asarray(counts)

    img_all, alpha_all, counts_all = run(B)
    kb = max(1, next_capacity(n_elig, 16))
    if kb < B:
        img_p, alpha_p, counts_p = run(kb)
        assert counts_p[3] == n_elig == counts_all[3]
        # same cut, same image: pruning only removes rows the flat cut
        # rejects anyway (pair-sort tie-breaks allow tiny noise)
        assert counts_p[0] == counts_all[0]
        assert counts_p[1] == counts_all[1]
        np.testing.assert_allclose(img_p, img_all, atol=5e-3)
        np.testing.assert_allclose(alpha_p, alpha_all, atol=5e-3)


def test_partial_view_prunes_blocks():
    params, tree_dev, is_leaf_opt, n, cap = _scene(seed=5)
    S = block_size_for(cap, target=256)
    B = cap // S
    cols, meta = build_block_cache(
        params, tree_dev, is_leaf_opt, jnp.int32(n), S
    )
    # a camera OUTSIDE the scene (z_min > 0 for every block) at a coarse
    # min_res must prune deep non-root blocks regardless of spatial order
    # (synth_tree's layout is level-ordered); a camera INSIDE a block's
    # bbox conservatively keeps it (z_min <= 0 => unbounded radius)
    cam_far = make_cam(2.2, radius=80.0, height=40.0, focal=220.0)
    elig = np.asarray(block_eligibility(meta, cam_far, jnp.float32(3.0)))
    elig_coarse = np.asarray(
        block_eligibility(meta, cam_far, jnp.float32(1e6))
    )
    assert elig_coarse.sum() <= elig.sum()
    assert elig_coarse.sum() < B  # deep non-root blocks pruned at coarse LoD


def test_optimize_render_layout_model_level(tmp_path):
    """render_fused must produce the same image before and after
    optimize_render_layout (row permutation + block-pruned path), and the
    permuted tree must stay structurally valid."""
    from tests.test_parallel import _cameras, _toy_tree_model

    model = _toy_tree_model(tmp_path, n=300, seed=11)
    model.tree.cut_method = "flat_slice"
    model.optimizer = None  # inference (demo-load) mode
    model.eval()
    model.set_state(active_sh_degree=0, check_render_every=2)
    model._refresh_device_caches()
    cam = _cameras(2)[1]
    bg = np.zeros(3, np.float32)
    before = np.asarray(model.render_fused(cam, bg)["render"])

    model.optimize_render_layout()  # default mode: root_major
    assert model._layout_optimized and model._block_cache is not None
    # tree invariants survive the permutation
    t = model.tree
    n = model.num_points
    depth = t.depth[:n]
    is_root = t.index_parent[:n] == -1
    n_roots = int(is_root.sum())
    assert is_root[:n_roots].all()  # roots are a prefix
    nonroot = ~is_root
    assert (depth[nonroot] == depth[t.index_parent[:n][nonroot]] + 1).all()
    rid = t.root_id[:n]
    assert (t.index_parent[:n][rid] == -1).all()  # root ids point at roots
    # root_major: tail rows grouped contiguously per root, seg starts valid
    tail_rids = rid[n_roots:]
    assert (np.diff(tail_rids) >= 0).all()
    seg = model._cull_seg_starts
    assert seg is not None and seg.shape[0] == n_roots
    for j in (0, n_roots // 2, n_roots - 1):
        lo, hi = int(seg[j]), int(seg[j + 1]) if j + 1 < n_roots else n
        assert (tail_rids[lo - n_roots:hi - n_roots] == j).all()
    # the gather-free cull expansion must equal the w[root_id] take
    import jax.numpy as jnp

    from log_tpu.model.gaussian import next_capacity
    from log_tpu.model.train_step import expand_weight_full

    cap = model.capacity
    R = min(next_capacity(n_roots), cap)
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.random(R) > 0.5)
    td = dict(model.tree_device())
    td_take = dict(td)
    td_take.pop("cull_seg_starts")
    full_seg = np.asarray(expand_weight_full(w, td, cap, R))
    full_take = np.asarray(expand_weight_full(w, td_take, cap, R))
    alive = np.arange(cap) < n
    np.testing.assert_array_equal(full_seg[alive], full_take[alive])

    model._render_bucket = None  # re-size buckets for the new path
    out = model.render_fused(cam, bg)
    # warm a second frame so block/k_vis buckets settle, same camera
    after = np.asarray(model.render_fused(cam, bg)["render"])
    mse = float(np.mean((after - before) ** 2))
    psnr = 10 * math.log10(1.0 / max(mse, 1e-12))
    assert psnr > 35.0, psnr
