"""Golden tests for projective math against independent numpy oracles.

The oracles below are written in explicit matrix form ((3,3) matmuls, building
J and W as dense matrices) — a deliberately different code path from the
closed-form vector implementation in log_tpu.ops.gaussian_math.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from log_tpu.ops import gaussian_math as gm
from log_tpu.dataset.base import prepare_camera


# ---------------------------------------------------------------- oracles
def np_quat_to_rotmat(q):
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = np.zeros(q.shape[:-1] + (3, 3))
    R[..., 0, 0] = 1 - 2 * (y * y + z * z)
    R[..., 0, 1] = 2 * (x * y - w * z)
    R[..., 0, 2] = 2 * (x * z + w * y)
    R[..., 1, 0] = 2 * (x * y + w * z)
    R[..., 1, 1] = 1 - 2 * (x * x + z * z)
    R[..., 1, 2] = 2 * (y * z - w * x)
    R[..., 2, 0] = 2 * (x * z - w * y)
    R[..., 2, 1] = 2 * (y * z + w * x)
    R[..., 2, 2] = 1 - 2 * (x * x + y * y)
    return R


def np_cov3d(scaling, rotation):
    R = np_quat_to_rotmat(rotation)
    S = np.zeros(scaling.shape[:-1] + (3, 3))
    for i in range(3):
        S[..., i, i] = scaling[..., i]
    L = R @ S
    return L @ np.swapaxes(L, -1, -2)


def np_cov2d(cov3d_mat, xyz, world_view, fx, fy, tan_fovx, tan_fovy):
    """EWA projection with explicit J/W matrices (matrix-form oracle)."""
    n = xyz.shape[0]
    t = xyz @ world_view[:3, :3] + world_view[3, :3]
    limx, limy = 1.3 * tan_fovx, 1.3 * tan_fovy
    tz = t[:, 2]
    tx = np.clip(t[:, 0] / tz, -limx, limx) * tz
    ty = np.clip(t[:, 1] / tz, -limy, limy) * tz
    out = []
    W = world_view[:3, :3].T  # world->cam rotation
    for i in range(n):
        J = np.array(
            [
                [fx / tz[i], 0, -(fx * tx[i]) / tz[i] ** 2],
                [0, fy / tz[i], -(fy * ty[i]) / tz[i] ** 2],
                [0, 0, 0],
            ]
        )
        T = J @ W
        cov = T @ cov3d_mat[i] @ T.T
        out.append((cov[0, 0], cov[0, 1], cov[1, 1]))
    return np.array(out)


def make_camera(rng, W=64, H=48):
    # random-ish but well-conditioned camera
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    angle = 0.3
    K_ = np.array([[70.0, 0, W / 2 - 1.3], [0, 72.0, H / 2 + 0.9], [0, 0, 1]])
    from scipy.spatial.transform import Rotation

    R = Rotation.from_rotvec(axis * angle).as_matrix()
    T = np.array([[0.05], [-0.02], [2.5]])
    center = -R.T @ T
    cam = {"K": K_, "R": R, "T": T, "W": W, "H": H, "center": center}
    return prepare_camera(cam, scale=1, znear=0.01, zfar=100.0)


# ----------------------------------------------------------------- tests
def test_quat_to_rotmat(rng):
    q = rng.normal(size=(32, 4))
    got = np.asarray(gm.quat_to_rotmat(jnp.asarray(q)))
    want = np_quat_to_rotmat(q)
    np.testing.assert_allclose(got, want, atol=1e-5)
    # proper rotations
    eye = got @ np.swapaxes(got, -1, -2)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)


def test_cov3d(rng):
    s = np.exp(rng.normal(size=(16, 3)) * 0.3)
    q = rng.normal(size=(16, 4))
    got = np.asarray(gm.build_cov3d(jnp.asarray(s), jnp.asarray(q)))
    want = np_cov3d(s, q)
    np.testing.assert_allclose(got[:, 0], want[:, 0, 0], atol=1e-5)
    np.testing.assert_allclose(got[:, 1], want[:, 0, 1], atol=1e-5)
    np.testing.assert_allclose(got[:, 2], want[:, 0, 2], atol=1e-5)
    np.testing.assert_allclose(got[:, 3], want[:, 1, 1], atol=1e-5)
    np.testing.assert_allclose(got[:, 4], want[:, 1, 2], atol=1e-5)
    np.testing.assert_allclose(got[:, 5], want[:, 2, 2], atol=1e-5)


def test_ewa_cov2d_matches_matrix_oracle(rng):
    cam = make_camera(rng)
    import math

    W, H = cam["image_width"], cam["image_height"]
    tan_fovx = math.tan(cam["FoVx"] * 0.5)
    tan_fovy = math.tan(cam["FoVy"] * 0.5)
    fx = W / (2 * tan_fovx)
    fy = H / (2 * tan_fovy)
    n = 64
    xyz = rng.normal(size=(n, 3)) * 0.5
    s = np.exp(rng.normal(size=(n, 3)) * 0.3) * 0.05
    q = rng.normal(size=(n, 4))
    cov3d = gm.build_cov3d(jnp.asarray(s), jnp.asarray(q))
    cxx, cxy, cyy = gm.ewa_cov2d(
        cov3d,
        jnp.asarray(xyz),
        jnp.asarray(cam["world_view_transform"]),
        fx,
        fy,
        tan_fovx,
        tan_fovy,
    )
    want = np_cov2d(
        np_cov3d(s, q), xyz, cam["world_view_transform"], fx, fy, tan_fovx, tan_fovy
    )
    # f32 vs f64 with cancellation in the Jacobian rows: allow ~1% relative.
    np.testing.assert_allclose(np.asarray(cxx), want[:, 0], rtol=2e-2, atol=5e-3)
    np.testing.assert_allclose(np.asarray(cxy), want[:, 1], rtol=2e-2, atol=5e-3)
    np.testing.assert_allclose(np.asarray(cyy), want[:, 2], rtol=2e-2, atol=5e-3)


def test_radius_formula():
    # isotropic cov2d with variance v -> radius 3*sqrt(max(v, clamp))
    cxx = jnp.array([4.0, 9.0])
    cyy = jnp.array([4.0, 9.0])
    cxy = jnp.zeros(2)
    r = np.asarray(gm.cov2d_radius(cxx, cxy, cyy))
    # lambda_max = mid + sqrt(max(mid^2 - det, 0.1)): isotropic -> v + sqrt(0.1)
    want = 3 * np.sqrt(np.array([4.0, 9.0]) + np.sqrt(0.1))
    np.testing.assert_allclose(r, want, rtol=1e-5)


def test_projection_roundtrip(rng):
    """Project known world points; NDC must land at K-projected pixels."""
    cam = make_camera(rng)
    n = 50
    xyz = rng.normal(size=(n, 3)) * 0.4
    p_ndc, w = gm.project_ndc(
        jnp.asarray(xyz), jnp.asarray(cam["full_proj_transform"])
    )
    p_ndc = np.asarray(p_ndc)
    W, H = cam["image_width"], cam["image_height"]
    px = np.asarray(gm.ndc_to_pix(p_ndc[:, 0], W))
    py = np.asarray(gm.ndc_to_pix(p_ndc[:, 1], H))
    # oracle: pinhole projection with K
    t = xyz @ cam["world_view_transform"][:3, :3] + cam["world_view_transform"][3, :3]
    uv = (cam["K"] @ (t / t[:, 2:3]).T).T
    # ndc2pix convention: pix = ((ndc+1)*S-1)/2; K-projection gives pixel
    # centers offset by 0.5 => u - 0.5
    # f32 through the combined 4x4 chain vs f64 two-stage oracle: sub-pixel.
    np.testing.assert_allclose(px, uv[:, 0] - 0.5, atol=0.15)
    np.testing.assert_allclose(py, uv[:, 1] - 0.5, atol=0.15)


def test_frustum_flag(rng):
    cam = make_camera(rng)
    xyz = np.array(
        [
            [0.0, 0.0, 0.0],  # near scene center: visible
            [100.0, 0.0, 0.0],  # far off to the side
            [0.0, 0.0, -500.0],  # far behind
        ]
    )
    p_ndc, _ = gm.project_ndc(jnp.asarray(xyz), jnp.asarray(cam["full_proj_transform"]))
    flag = np.asarray(gm.frustum_flag(p_ndc, padding=0.05))
    assert flag[0]
    assert not flag[1]


def test_compute_radius2d_visibility(rng):
    cam = make_camera(rng)
    import math

    W, H = cam["image_width"], cam["image_height"]
    tan_fovx = math.tan(cam["FoVx"] * 0.5)
    tan_fovy = math.tan(cam["FoVy"] * 0.5)
    fx = W / (2 * tan_fovx)
    fy = H / (2 * tan_fovy)
    xyz = np.array([[0.0, 0.0, 0.0], [1000.0, 0.0, 0.0]])
    s = np.full((2, 3), 0.05)
    q = np.tile(np.array([1.0, 0, 0, 0]), (2, 1))
    r = np.asarray(
        gm.compute_radius2d(
            jnp.asarray(xyz),
            jnp.asarray(s),
            jnp.asarray(q),
            jnp.asarray(cam["world_view_transform"]),
            jnp.asarray(cam["full_proj_transform"]),
            fx,
            fy,
            tan_fovx,
            tan_fovy,
        )
    )
    assert r[0] > 0
    assert r[1] == 0
