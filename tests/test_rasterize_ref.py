"""Behavioral tests for the pure-JAX reference rasterizer.

Covers the full 5-output contract (LoG/render/renderer.py:153-185) plus
gradient correctness against finite differences.
"""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from log_tpu.ops.rasterize_ref import rasterize
from log_tpu.dataset.base import prepare_camera


H, W = 40, 56


def lookat_camera():
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]])
    R = np.eye(3)
    T = np.array([[0.0], [0.0], [4.0]])  # camera 4 units behind origin
    center = -R.T @ T
    return prepare_camera(
        {"K": K, "R": R, "T": T, "W": W, "H": H, "center": center},
        scale=1,
        znear=0.01,
        zfar=100.0,
    )


def raster_args(cam, background=(0.0, 0.0, 0.0)):
    tan_fovx = math.tan(cam["FoVx"] * 0.5)
    tan_fovy = math.tan(cam["FoVy"] * 0.5)
    return dict(
        world_view=jnp.asarray(cam["world_view_transform"]),
        full_proj=jnp.asarray(cam["full_proj_transform"]),
        focal_x=W / (2 * tan_fovx),
        focal_y=H / (2 * tan_fovy),
        tan_fovx=tan_fovx,
        tan_fovy=tan_fovy,
        background=jnp.asarray(background, jnp.float32),
        image_height=H,
        image_width=W,
    )


def gauss_inputs(xyz, colors, opacity, scale):
    n = len(xyz)
    return dict(
        xyz=jnp.asarray(xyz, jnp.float32),
        colors=jnp.asarray(colors, jnp.float32),
        opacity=jnp.asarray(opacity, jnp.float32),
        scaling=jnp.full((n, 3), scale, jnp.float32),
        rotation=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (n, 1)),
        means2d_offset=jnp.zeros((n, 2), jnp.float32),
    )


def test_empty_scene_is_background():
    cam = lookat_camera()
    out = rasterize(
        **gauss_inputs(np.zeros((1, 3)), np.ones((1, 3)), [0.0], 0.1),
        **raster_args(cam, background=(0.2, 0.4, 0.6)),
    )
    img = np.asarray(out["render"])
    np.testing.assert_allclose(img[0], 0.2, atol=1e-6)
    np.testing.assert_allclose(img[1], 0.4, atol=1e-6)
    np.testing.assert_allclose(img[2], 0.6, atol=1e-6)
    assert np.all(np.asarray(out["point_id_pixel"]) == -1)
    assert np.all(np.asarray(out["point_weight"]) == 0)


def test_single_gaussian_peak_and_contract():
    cam = lookat_camera()
    out = rasterize(
        **gauss_inputs([[0.0, 0.0, 0.0]], [[1.0, 0.0, 0.0]], [0.9], 0.12),
        **raster_args(cam),
    )
    img = np.asarray(out["render"])
    # red channel peaks near image center
    cy, cx = np.unravel_index(img[0].argmax(), img[0].shape)
    assert abs(cx - W / 2) <= 1.5 and abs(cy - H / 2) <= 1.5
    assert img[0].max() > 0.5
    assert img[1].max() < 1e-5  # no green
    # contract outputs
    assert out["radii"][0] > 0
    pid = np.asarray(out["point_id_pixel"])
    assert pid[cy, cx] == 0
    pw = float(out["point_weight"][0])
    pwp = np.asarray(out["point_weight_pixel"])
    np.testing.assert_allclose(pw, pwp.max(), rtol=1e-6)
    # peak weight = opacity * AA compensation * sub-pixel falloff
    assert 0.6 < pw <= 0.9 + 1e-5


def test_depth_occlusion():
    cam = lookat_camera()
    # two overlapping gaussians; the nearer (red, z=-1 -> cam depth 3) should
    # dominate over the farther green one
    out = rasterize(
        **gauss_inputs(
            [[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]],
            [[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]],
            [0.95, 0.95],
            0.2,
        ),
        **raster_args(cam),
    )
    img = np.asarray(out["render"])
    cy, cx = H // 2, W // 2
    assert img[0, cy, cx] > img[1, cy, cx]  # red in front
    pid = np.asarray(out["point_id_pixel"])
    assert pid[cy, cx] == 1  # argmax contributor is the near red one


def test_padding_rows_are_inert():
    cam = lookat_camera()
    base = gauss_inputs([[0.0, 0.0, 0.0]], [[1.0, 0.0, 0.0]], [0.9], 0.12)
    out1 = rasterize(**base, **raster_args(cam))
    # add 7 padding rows with opacity 0 and active_mask False
    padded = gauss_inputs(
        np.zeros((8, 3)),
        np.tile([[1.0, 0, 0]], (8, 1)),
        [0.9] + [0.0] * 7,
        0.12,
    )
    mask = jnp.asarray([True] + [False] * 7)
    out2 = rasterize(**padded, active_mask=mask, **raster_args(cam))
    np.testing.assert_allclose(
        np.asarray(out1["render"]), np.asarray(out2["render"]), atol=1e-6
    )
    assert np.all(np.asarray(out2["radii"][1:]) == 0)


def test_alpha_profile_matches_analytic():
    """One isotropic gaussian, no filter: alpha(d) = o * exp(-d^2/(2 v))."""
    cam = lookat_camera()
    o = 0.8
    out = rasterize(
        **gauss_inputs([[0.0, 0.0, 0.0]], [[1.0, 1.0, 1.0]], [o], 0.2),
        **raster_args(cam),
        use_filter=False,
    )
    img = np.asarray(out["render"])[0]
    # camera depth 4, focal 60 => sigma_px = 0.2 * 60/4 = 3.0
    var = 3.0**2
    ys, xs = np.mgrid[0:H, 0:W]
    # splat center in ndc2pix convention
    cx, cy = (W - 1) / 2, (H - 1) / 2
    d2 = (xs - cx) ** 2 + (ys - cy) ** 2
    want = o * np.exp(-0.5 * d2 / var)
    want[want < 1.0 / 255.0] = 0.0
    np.testing.assert_allclose(img, want, atol=5e-3)


@pytest.mark.slow
def test_gradients_match_finite_differences():
    """FD check in the smooth regime: every gaussian covers the full image
    above the 1/255 alpha cutoff, so no cutoff-crossing discontinuities (which
    the CUDA reference shares) pollute the finite differences. Runs in x64 —
    f32 FD noise on a sum-over-pixels loss swamps the signal."""
    jax.config.update("jax_enable_x64", True)
    try:
        _run_fd_check()
    finally:
        jax.config.update("jax_enable_x64", False)


def _run_fd_check():
    cam = lookat_camera()
    args = raster_args(cam)
    rng = np.random.default_rng(1)
    n = 3
    xyz = rng.normal(size=(n, 3)) * 0.15
    colors = rng.uniform(0.2, 0.8, size=(n, 3))
    opacity = rng.uniform(0.4, 0.7, size=(n,))
    target = jnp.zeros((3, H, W))

    def loss_fn(xyz_, colors_, opacity_, scaling_):
        out = rasterize(
            xyz=xyz_,
            colors=colors_,
            opacity=opacity_,
            scaling=scaling_,
            rotation=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (n, 1)),
            means2d_offset=jnp.zeros((n, 2)),
            **args,
        )
        return jnp.sum((out["render"] - target) ** 2)

    # sigma_px = 1.0 * 60 / 4 = 15 px -> covers the 40x56 image above 1/255
    scaling = jnp.full((n, 3), 1.0)
    primals = (
        jnp.asarray(xyz),
        jnp.asarray(colors),
        jnp.asarray(opacity),
        scaling,
    )
    grads = jax.grad(loss_fn, argnums=(0, 1, 2, 3))(*primals)
    # central finite differences on a few coordinates of each input
    eps = 1e-3
    for argi, name in [(0, "xyz"), (1, "colors"), (2, "opacity"), (3, "scaling")]:
        g = np.asarray(grads[argi])
        flat = np.asarray(primals[argi]).ravel()
        idxs = rng.choice(flat.size, size=min(6, flat.size), replace=False)
        for idx in idxs:
            p = [np.asarray(x).copy() for x in primals]
            p[argi].ravel()[idx] += eps
            lp = float(loss_fn(*[jnp.asarray(x) for x in p]))
            p[argi].ravel()[idx] -= 2 * eps
            lm = float(loss_fn(*[jnp.asarray(x) for x in p]))
            fd = (lp - lm) / (2 * eps)
            got = g.ravel()[idx]
            assert abs(got - fd) <= 2e-2 * max(1.0, abs(fd)), (
                f"{name}[{idx}]: autodiff {got} vs fd {fd}"
            )


def test_means2d_offset_gradient_is_ndc_screen_grad():
    """Cotangent of means2d_offset must be nonzero for visible gaussians and
    zero for culled ones (the densification signal; LoG/model/counter.py:46)."""
    cam = lookat_camera()
    args = raster_args(cam)
    xyz = jnp.asarray([[0.3, 0.0, 0.0], [1000.0, 0.0, 0.0]], jnp.float32)

    def loss_fn(off):
        out = rasterize(
            xyz=xyz,
            colors=jnp.ones((2, 3)),
            opacity=jnp.asarray([0.9, 0.9]),
            scaling=jnp.full((2, 3), 0.15),
            rotation=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (2, 1)),
            means2d_offset=off,
            **args,
        )
        target = jnp.zeros_like(out["render"])
        return jnp.sum((out["render"] - target) ** 2)

    g = np.asarray(jax.grad(loss_fn)(jnp.zeros((2, 2))))
    assert np.linalg.norm(g[0]) > 0
    assert np.linalg.norm(g[1]) == 0
