"""Tiled Pallas rasterizer vs the pure-jnp reference oracle.

Runs in Pallas interpret mode on CPU; the same code path compiles with Mosaic
on TPU (exercised by bench.py / the driver).
"""
import math

import numpy as np
import pytest

import jax.numpy as jnp

from log_tpu.dataset.base import prepare_camera
from log_tpu.dataset.synthetic import random_gaussians, ring_cameras
from log_tpu.ops.rasterize_ref import rasterize as rasterize_ref
from log_tpu.ops.rasterize_tiled import rasterize_tiled

H, W = 32, 48


def scene_and_args(n=60, seed=3):
    rng = np.random.default_rng(seed)
    scene = random_gaussians(n, rng, extent=0.8)
    cam = ring_cameras(3, H, W)[1]
    pc = prepare_camera(cam, 1, 0.01, 100.0)
    tan_fovx = math.tan(pc["FoVx"] * 0.5)
    tan_fovy = math.tan(pc["FoVy"] * 0.5)
    args = dict(
        xyz=jnp.asarray(scene["xyz"]),
        colors=jnp.asarray(scene["colors"]),
        opacity=jnp.asarray(scene["opacity"]),
        scaling=jnp.asarray(scene["scaling"]),
        rotation=jnp.asarray(scene["rotation"]),
        means2d_offset=jnp.zeros((n, 2), jnp.float32),
        world_view=jnp.asarray(pc["world_view_transform"]),
        full_proj=jnp.asarray(pc["full_proj_transform"]),
        focal_x=W / (2 * tan_fovx),
        focal_y=H / (2 * tan_fovy),
        tan_fovx=tan_fovx,
        tan_fovy=tan_fovy,
        background=jnp.asarray([0.1, 0.2, 0.3], jnp.float32),
        image_height=H,
        image_width=W,
    )
    return args


@pytest.mark.slow
def test_tiled_matches_reference():
    args = scene_and_args()
    ref = rasterize_ref(**args)
    tiled = rasterize_tiled(**args, max_pairs=4096)

    # Tolerance note: the tiled path culls at the 3-sigma tile rectangle
    # (like the CUDA rasterizer), while the jnp oracle evaluates every
    # (gaussian, pixel) pair; gaussians with opacity > ~0.35 can contribute
    # up to opacity*exp(-4.5) ~ 1e-2 just outside the rectangle.
    np.testing.assert_allclose(
        np.asarray(tiled["render"]), np.asarray(ref["render"]), atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(tiled["alpha"]), np.asarray(ref["alpha"]), atol=1e-2
    )
    np.testing.assert_array_equal(
        np.asarray(tiled["radii"]), np.asarray(ref["radii"])
    )
    # argmax contributor map: identical except where weights tie numerically
    pid_t = np.asarray(tiled["point_id_pixel"])
    pid_r = np.asarray(ref["point_id_pixel"])
    mismatch = (pid_t != pid_r).mean()
    assert mismatch < 0.02, f"pid mismatch fraction {mismatch}"
    np.testing.assert_allclose(
        np.asarray(tiled["point_weight_pixel"]),
        np.asarray(ref["point_weight_pixel"]),
        atol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(tiled["point_weight"]),
        np.asarray(ref["point_weight"]),
        atol=1e-2,
    )


@pytest.mark.slow
def test_tiled_empty_scene():
    args = scene_and_args(n=4)
    args["opacity"] = jnp.zeros(4)
    tiled = rasterize_tiled(**args, max_pairs=512)
    img = np.asarray(tiled["render"])
    np.testing.assert_allclose(img[0], 0.1, atol=1e-6)
    assert np.all(np.asarray(tiled["point_id_pixel"]) == -1)


@pytest.mark.slow
def test_tiled_gradients_match_reference():
    """Backward kernel vs autodiff of the jnp oracle on a smooth scene
    (all gaussians cover the image above the alpha cutoff so rect-cull
    differences don't pollute the comparison)."""
    import jax

    rng = np.random.default_rng(5)
    n = 8
    cam = ring_cameras(3, H, W)[1]
    from log_tpu.dataset.base import prepare_camera

    pc = prepare_camera(cam, 1, 0.01, 100.0)
    tan_fovx = math.tan(pc["FoVx"] * 0.5)
    tan_fovy = math.tan(pc["FoVy"] * 0.5)
    base = dict(
        world_view=jnp.asarray(pc["world_view_transform"]),
        full_proj=jnp.asarray(pc["full_proj_transform"]),
        focal_x=W / (2 * tan_fovx),
        focal_y=H / (2 * tan_fovy),
        tan_fovx=tan_fovx,
        tan_fovy=tan_fovy,
        background=jnp.asarray([0.3, 0.1, 0.2], jnp.float32),
        image_height=H,
        image_width=W,
    )
    xyz = jnp.asarray(rng.normal(size=(n, 3)) * 0.15, jnp.float32)
    colors = jnp.asarray(rng.uniform(0.2, 0.8, (n, 3)), jnp.float32)
    opacity = jnp.asarray(rng.uniform(0.3, 0.7, n), jnp.float32)
    scaling = jnp.full((n, 3), 0.8, jnp.float32)
    rotation = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (n, 1))
    target = jnp.zeros((3, H, W))

    def make_loss(raster, **kw):
        def loss(xyz_, colors_, opacity_, scaling_, offset_):
            out = raster(
                xyz=xyz_, colors=colors_, opacity=opacity_, scaling=scaling_,
                rotation=rotation, means2d_offset=offset_, **base, **kw,
            )
            return jnp.sum((out["render"] - target) ** 2) + jnp.sum(
                out["alpha"] * 0.1
            )
        return loss

    offset = jnp.zeros((n, 2))
    g_ref = jax.grad(make_loss(rasterize_ref), argnums=(0, 1, 2, 3, 4))(
        xyz, colors, opacity, scaling, offset
    )
    g_tiled = jax.grad(
        make_loss(rasterize_tiled, max_pairs=2048), argnums=(0, 1, 2, 3, 4)
    )(xyz, colors, opacity, scaling, offset)
    names = ["xyz", "colors", "opacity", "scaling", "means2d"]
    for name, gr, gt in zip(names, g_ref, g_tiled):
        gr, gt = np.asarray(gr), np.asarray(gt)
        scale = max(np.abs(gr).max(), 1e-3)
        np.testing.assert_allclose(
            gt, gr, atol=2e-2 * scale, err_msg=f"grad mismatch for {name}"
        )


def test_packed_sort_keys_match_oracle(monkeypatch):
    """The TPU-only packed uint32 (tile|depth-bits) sort key must produce the
    same image as the exact 3-key sort within depth-quantization tolerance."""
    import numpy as np
    import jax.numpy as jnp

    from log_tpu.ops import rasterize_tiled as rt

    rng = np.random.default_rng(7)
    N, H, W = 400, 40, 160
    xyz = jnp.asarray(
        rng.normal(0, 0.8, (N, 3)).astype(np.float32)
        + np.array([0, 0, 4], np.float32)
    )
    colors = jnp.asarray(rng.random((N, 3), dtype=np.float32))
    opacity = jnp.asarray((rng.random(N) * 0.8 + 0.1).astype(np.float32))
    scaling = jnp.asarray((rng.random((N, 3)) * 0.1 + 0.02).astype(np.float32))
    q = rng.normal(size=(N, 4)).astype(np.float32)
    rotation = jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True))
    wv = jnp.eye(4, dtype=jnp.float32)
    fx = fy = 100.0
    proj = np.array(
        [[2 * fx / W, 0, 0, 0], [0, 2 * fy / H, 0, 0],
         [0, 0, 1.001, -0.2], [0, 0, 1, 0]], np.float32,
    )
    fp = jnp.asarray(proj) @ wv
    args = dict(
        xyz=xyz, colors=colors, opacity=opacity, scaling=scaling,
        rotation=rotation, means2d_offset=jnp.zeros((N, 2), jnp.float32),
        world_view=wv, full_proj=fp, focal_x=fx, focal_y=fy,
        tan_fovx=W / (2 * fx), tan_fovy=H / (2 * fy),
        background=jnp.zeros(3, jnp.float32),
        image_height=H, image_width=W, max_pairs=1 << 14,
        with_stats=True, interpret=True,
    )
    monkeypatch.setenv("LOG_TPU_PACK_SORT_KEYS", "0")
    exact = rt.rasterize_tiled(**args)
    monkeypatch.setenv("LOG_TPU_PACK_SORT_KEYS", "1")
    packed = rt.rasterize_tiled(**args)
    np.testing.assert_allclose(
        np.asarray(packed["render"]), np.asarray(exact["render"]),
        atol=2e-3,
    )
    np.testing.assert_array_equal(
        np.asarray(packed["radii"]), np.asarray(exact["radii"])
    )


def test_piecewise_expand_sort_impl_matches_scatter():
    """The large-P merge-by-sort expansion must agree with the scatter
    implementation, values and gradients, including zero-length runs and
    out-of-range (dropped) offsets."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from log_tpu.ops import rasterize_tiled as rt

    rng = np.random.default_rng(3)
    P, A, R = 50, 300, 4
    lens = rng.integers(0, 12, P)
    lens[5] = 0
    lens[17] = 0
    offsets = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int32)
    offsets[-3:] = A + 7  # overflow runs must drop
    values = rng.random((R, P)).astype(np.float32)

    def scatter_impl(v):
        deltas = jnp.concatenate([v[:, :1], v[:, 1:] - v[:, :-1]], axis=1)
        base = jnp.zeros((R, A), jnp.float32)
        seeded = base.at[:, jnp.asarray(offsets)].add(deltas, mode="drop")
        return jnp.cumsum(seeded, axis=1)

    def sort_impl(v):
        return rt._piecewise_expand_sort(v, jnp.asarray(offsets), A)

    v = jnp.asarray(values)
    np.testing.assert_allclose(
        np.asarray(sort_impl(v)), np.asarray(scatter_impl(v)), atol=1e-5
    )
    # gradients: contract both with the same random cotangent
    ct = jnp.asarray(rng.random((R, A)).astype(np.float32))
    g1 = jax.grad(lambda x: jnp.sum(scatter_impl(x) * ct))(v)
    g2 = jax.grad(lambda x: jnp.sum(sort_impl(x) * ct))(v)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-4)


def test_runs_tail_only_matches_default():
    """The Pallas MXU expansion path (runs_tail_only contract: prefix
    active_mask, forced min-1-tile dummy records) must reproduce the jnp
    expansion path — forward outputs and gradients."""
    import jax

    args = scene_and_args(n=64, seed=11)
    n = args["xyz"].shape[0]
    # prefix mask with an invalid tail, as compacted slices produce
    mask = jnp.arange(n) < (n - 9)
    kw = dict(max_pairs=4096, active_mask=mask)

    base = rasterize_tiled(**args, **kw)
    tail = rasterize_tiled(**args, **kw, runs_tail_only=True)
    np.testing.assert_allclose(
        np.asarray(tail["render"]), np.asarray(base["render"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(tail["alpha"]), np.asarray(base["alpha"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(tail["point_weight"]), np.asarray(base["point_weight"]),
        rtol=1e-4, atol=1e-5,
    )

    def loss_of(rto):
        def loss(xyz_, colors_, opacity_):
            out = rasterize_tiled(
                **{**args, "xyz": xyz_, "colors": colors_,
                   "opacity": opacity_},
                **kw, runs_tail_only=rto,
            )
            return jnp.sum(out["render"] ** 2)
        return loss

    g0 = jax.grad(loss_of(False), argnums=(0, 1, 2))(
        args["xyz"], args["colors"], args["opacity"]
    )
    g1 = jax.grad(loss_of(True), argnums=(0, 1, 2))(
        args["xyz"], args["colors"], args["opacity"]
    )
    for name, a, b in zip(["xyz", "colors", "opacity"], g0, g1):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(
            b, a, atol=1e-3 * scale, err_msg=f"grad mismatch: {name}"
        )


@pytest.mark.slow
def test_packed_inference_matches_full_precision():
    """render_pairs_packed (6-payload bf16-packed pipeline) vs the
    full-precision column path. Packing rounds conic/opacity/rgb to bf16
    (<=0.4% relative) so the images agree to ~1 LSB of 8-bit output."""
    from log_tpu.ops.projection import project_gaussians_cols
    from log_tpu.ops.rasterize_tiled import (
        _raster_core, build_pairs, render_pairs_packed,
    )
    from log_tpu.ops.sh import sh_to_rgb

    args = scene_and_args(n=60)
    splat_cols = project_gaussians_cols(
        args["xyz"][:, 0], args["xyz"][:, 1], args["xyz"][:, 2],
        args["scaling"][:, 0], args["scaling"][:, 1], args["scaling"][:, 2],
        args["rotation"][:, 0], args["rotation"][:, 1],
        args["rotation"][:, 2], args["rotation"][:, 3],
        args["opacity"],
        args["world_view"], args["full_proj"], args["focal_x"],
        args["focal_y"], args["tan_fovx"], args["tan_fovy"],
        H, W, use_filter=False,
    )
    colors = tuple(
        args["colors"][:, c] for c in range(3)
    )
    prefix = jnp.ones((60,), bool)
    color_p, tfinal_p, _total = render_pairs_packed(
        splat_cols, colors, args["background"], H, W, 4096, prefix,
        interpret=True,
    )
    pairs = build_pairs(
        splat_cols, colors, H, W, 4096, runs_tail_only=True,
        active_prefix=prefix, interpret=True,
    )
    color_f, tfinal_f, _, _, _, _ = _raster_core(
        pairs["pair_data"], pairs["tile_start"], pairs["tile_count"],
        args["background"], pairs["tiles_x"], pairs["tiles_y"], False, True,
    )
    cp, cf = np.asarray(color_p[:, :H, :W]), np.asarray(color_f[:, :H, :W])
    tp, tf = np.asarray(tfinal_p[:H, :W]), np.asarray(tfinal_f[:H, :W])
    assert np.abs(cp - cf).max() < 0.02, np.abs(cp - cf).max()
    assert np.abs(cp - cf).mean() < 2e-3
    assert np.abs(tp - tf).max() < 0.02


def test_fast_transcendental_helpers():
    """_fexp2/_flog2 (LOG_TPU_FASTEXP experiment path; default off after
    the on-chip A/B showed hardware exp/log faster) stay within their
    documented error bounds so the knob remains usable."""
    from log_tpu.ops.rasterize_tiled import _fexp2, _flog2

    x = jnp.asarray(np.linspace(-30.0, 0.9, 50001), jnp.float32)
    ref = jnp.exp2(x)
    rel = np.abs(np.asarray(_fexp2(x) / jnp.maximum(ref, 1e-30)) - 1.0)
    assert rel.max() < 5e-5, rel.max()
    y = jnp.asarray(np.linspace(0.01, 1.0, 50001), jnp.float32)
    err = np.abs(np.asarray(_flog2(y) - jnp.log2(y)))
    assert err.max() < 5e-4, err.max()
    # clamp region: very negative inputs underflow toward 0, never nan/inf
    z = np.asarray(_fexp2(jnp.asarray([-500.0, -126.0, -87.5], jnp.float32)))
    assert np.all(np.isfinite(z)) and np.all(z >= 0) and np.all(z < 1e-26)
