"""flat_slice cut (gather-free pre-cut + slice-axis weight cull) must
render the same image as the 'flat' cut (capacity-axis cull)."""
import math

import numpy as np
import jax
import jax.numpy as jnp

from log_tpu.dataset.base import prepare_camera
from log_tpu.model.gaussian import next_capacity
from log_tpu.model.train_step import fused_prepare_render
from log_tpu.render.renderer import camera_device
from log_tpu.utils.synth_tree import padded_model_device, tree_sizes

H, W = 64, 128


def make_cam(theta, radius=22.0, height=18.0):
    pos = np.array(
        [radius * math.cos(theta), radius * math.sin(theta), height]
    )
    fwd = -pos / np.linalg.norm(pos)
    right = np.cross(fwd, np.array([0, 0, 1.0]))
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    R = np.stack([right, up, fwd])
    T = (-R @ pos).reshape(3, 1)
    K = np.array([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]])
    return camera_device(
        prepare_camera(
            {"K": K, "R": R, "T": T, "H": H, "W": W,
             "center": pos.reshape(3, 1)},
            1, 0.01, 1000.0,
        )
    )


def test_flat_slice_matches_flat():
    n_roots = 3000
    _, _, n = tree_sizes(n_roots)
    cap = next_capacity(n)
    params, tree_dev, is_leaf_opt = padded_model_device(
        jax.random.PRNGKey(0), n_roots, cap
    )
    n_roots_bucket = min(next_capacity(n_roots, 256), cap)
    cam = make_cam(0.4)
    common = dict(
        n_alive=jnp.int32(n),
        is_leaf_opt=is_leaf_opt,
        min_resolution_pixel=jnp.float32(3.0),
        current_depth=jnp.int32(20),
        background=jnp.zeros(3, jnp.float32),
        image_height=H, image_width=W,
        k_visible=next_capacity(n, 256),
        sh_degree=0, stage_has_tree=True, num_levels=3,
        backend="tiled", max_pairs=1 << 16, check_scale=4,
        n_roots=n_roots_bucket,
        prep_backend="tiled", prep_max_pairs=1 << 15,
    )
    img_flat, alpha_flat, counts_flat = fused_prepare_render(
        params, tree_dev, cam, cut_method="flat", **common
    )
    img_sl, alpha_sl, counts_sl = fused_prepare_render(
        params, tree_dev, cam, cut_method="flat_slice", **common
    )
    # the pre-cut counts are a superset of the culled counts
    assert int(counts_sl[:2].sum()) >= int(counts_flat[:2].sum()) > 0
    # bulk atol 1e-2 (~2.6 LSB at 8 bit): the two paths compact different
    # lane sets (superset with holes vs exact), so equal-key pairs
    # tie-break differently under the unstable pair sort; the flat_slice
    # path additionally rounds conic/opacity/rgb/radius to bf16 before the
    # compaction sort (packed payloads), so ISOLATED rect-fringe pixels
    # near the 1/255 alpha threshold flip inclusion — allow <=0.1% of
    # pixels past the bulk tolerance, bounded at 3e-2 (fast-exp2 is
    # default-off and not exercised here)
    for got, want in ((img_sl, img_flat), (alpha_sl, alpha_flat)):
        d = np.abs(np.asarray(got) - np.asarray(want))
        assert float(d.max()) < 3e-2, d.max()
        assert float((d > 1e-2).mean()) < 1e-3, (d > 1e-2).mean()


def test_w_full_cached_cull_matches_per_frame():
    """fused_prepare_render(w_full=fused_root_cull(...)) — the amortized
    capacity-axis cull — must render the same image as the per-frame
    slice-axis cull (same camera => same cull decision; only compaction
    lane sets / pair tie-breaks differ)."""
    from log_tpu.model.train_step import fused_root_cull

    n_roots = 3000
    _, _, n = tree_sizes(n_roots)
    cap = next_capacity(n)
    params, tree_dev, is_leaf_opt = padded_model_device(
        jax.random.PRNGKey(1), n_roots, cap
    )
    n_roots_bucket = min(next_capacity(n_roots, 256), cap)
    cam = make_cam(1.1)
    common = dict(
        n_alive=jnp.int32(n),
        is_leaf_opt=is_leaf_opt,
        min_resolution_pixel=jnp.float32(3.0),
        current_depth=jnp.int32(20),
        background=jnp.zeros(3, jnp.float32),
        image_height=H, image_width=W,
        k_visible=next_capacity(n, 256),
        sh_degree=0, stage_has_tree=True, num_levels=3,
        backend="tiled", max_pairs=1 << 16, check_scale=4,
        n_roots=n_roots_bucket, cut_method="flat_slice",
        prep_backend="tiled", prep_max_pairs=1 << 15,
    )
    img_pf, alpha_pf, counts_pf = fused_prepare_render(
        params, tree_dev, cam, **common
    )
    w_full = fused_root_cull(
        params, tree_dev, cam, jnp.int32(n), H, W,
        prep_backend="tiled", prep_max_pairs=1 << 15, check_scale=4,
        n_roots=n_roots_bucket,
    )
    assert w_full.shape == (cap,) and w_full.dtype == jnp.bool_
    img_wf, alpha_wf, counts_wf = fused_prepare_render(
        params, tree_dev, cam, w_full=w_full, **common
    )
    # the w_full cut folds the cull BEFORE compaction => counts shrink
    assert 0 < int(counts_wf[:2].sum()) <= int(counts_pf[:2].sum())
    np.testing.assert_allclose(
        np.asarray(img_wf), np.asarray(img_pf), atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(alpha_wf), np.asarray(alpha_pf), atol=1e-2
    )


def test_packed_path_with_sh_matches_unpacked():
    """sh_degree > 0 on the packed flat_slice path (full-axis SH eval
    before packing) must match the unpacked slices path."""
    n_roots = 2000
    _, _, n = tree_sizes(n_roots)
    cap = next_capacity(n)
    params, tree_dev, is_leaf_opt = padded_model_device(
        jax.random.PRNGKey(2), n_roots, cap
    )
    params = dict(params)
    params["shs"] = 0.3 * jax.random.normal(
        jax.random.PRNGKey(7), params["shs"].shape
    )
    cam = make_cam(0.9)
    common = dict(
        n_alive=jnp.int32(n), is_leaf_opt=is_leaf_opt,
        min_resolution_pixel=jnp.float32(3.0), current_depth=jnp.int32(20),
        background=jnp.zeros(3, jnp.float32),
        image_height=H, image_width=W, k_visible=next_capacity(n, 256),
        sh_degree=1, stage_has_tree=True, num_levels=3,
        backend="tiled", max_pairs=1 << 16, check_scale=4,
        cut_method="flat_slice", n_roots=min(next_capacity(n_roots, 256), cap),
        prep_backend="tiled", prep_max_pairs=1 << 15, check_cull=False,
    )
    img_p, _, counts_p = fused_prepare_render(
        params, tree_dev, cam, pack_pairs=True, **common
    )
    img_u, _, counts_u = fused_prepare_render(
        params, tree_dev, cam, pack_pairs=False, **common
    )
    assert int(np.asarray(counts_p)[:2].sum()) > 0
    # bf16-packed conic/rgb vs full precision: ~1 LSB-grade noise
    np.testing.assert_allclose(
        np.asarray(img_p), np.asarray(img_u), atol=2e-2
    )
    # SH must actually affect the image (nonzero coefficients)
    img_nosh, _, _ = fused_prepare_render(
        params, tree_dev, cam, pack_pairs=True,
        **{**common, "sh_degree": 0},
    )
    assert float(np.abs(np.asarray(img_p) - np.asarray(img_nosh)).max()) > 0.01
