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

    np.testing.assert_allclose(
        np.asarray(tiled["render"]), np.asarray(ref["render"]), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(tiled["alpha"]), np.asarray(ref["alpha"]), atol=2e-5
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
        atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(tiled["point_weight"]),
        np.asarray(ref["point_weight"]),
        atol=2e-5,
    )


@pytest.mark.slow
def test_tiled_empty_scene():
    args = scene_and_args(n=4)
    args["opacity"] = jnp.zeros(4)
    tiled = rasterize_tiled(**args, max_pairs=512)
    img = np.asarray(tiled["render"])
    np.testing.assert_allclose(img[0], 0.1, atol=1e-6)
    assert np.all(np.asarray(tiled["point_id_pixel"]) == -1)
