"""Projective math for 3D Gaussian splatting, vectorized for TPU (JAX/XLA).

Everything here is closed-form vector math over (N, k) arrays — no (N, 3, 3)
matrix materialization on the hot path — so XLA fuses it into a handful of
bandwidth-bound VPU ops.

Behavioral contract (verified against the reference formulas, reimplemented
fresh):
  * quaternion -> rotation:        LoG/model/geometry.py:4-25
  * cov3d = (R S)(R S)^T:          LoG/model/geometry.py:27-41
  * EWA cov2d (Zwicker 2002):      LoG/model/geometry.py:91-130
  * screen radius = 3 sqrt(l_max): LoG/model/geometry.py:132-151,
                                   LoG/cuda/compute_radius_kernel.cu:107-156
  * NDC frustum test:              LoG/model/level_of_gaussian.py:40-53

Camera convention (row-vector): ``x_cam = [x_world, 1] @ world_view`` where
``world_view`` is the 4x4 ``world_view_transform`` built by
log_tpu.dataset.base.prepare_camera (the transpose of [R|T]).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Low-pass dilation used by the original Inria rasterizer and by the
# compute_radius kernel (LoG/cuda/compute_radius_kernel.cu, geometry.py:128).
DILATE_PIXEL = 0.3


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """(..., 4) wxyz quaternion (unnormalized) -> (..., 3, 3) rotation.

    Matches LoG/model/geometry.py:4-25 (normalize then standard formula).
    """
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    q = q / norm
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    R = jnp.stack([r00, r01, r02, r10, r11, r12, r20, r21, r22], axis=-1)
    return R.reshape(q.shape[:-1] + (3, 3))


def build_cov3d(scaling: jax.Array, rotation: jax.Array) -> jax.Array:
    """Sigma = (R S)(R S)^T, returned as packed upper triangle (N, 6).

    Packing order: (xx, xy, xz, yy, yz, zz) — same as the Inria CUDA kernels.
    scaling: (N, 3) activated (positive), rotation: (N, 4) quaternion.
    Reference math: LoG/model/geometry.py:27-41.

    Closed form over (N,) lanes only: materializing (N, 3, 3) rotation
    matrices pads the trailing dims to the (8, 128) TPU tile — a ~1400x
    memory blowup (measured 369 ms at 3.1M points vs ~4 ms this way).
    """
    norm = jnp.sqrt(jnp.sum(rotation * rotation, axis=-1))
    q = rotation / norm[..., None]
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    s0 = scaling[..., 0] * scaling[..., 0]
    s1 = scaling[..., 1] * scaling[..., 1]
    s2 = scaling[..., 2] * scaling[..., 2]
    # sigma_ij = sum_k s_k^2 R_ik R_jk
    sxx = s0 * r00 * r00 + s1 * r01 * r01 + s2 * r02 * r02
    sxy = s0 * r00 * r10 + s1 * r01 * r11 + s2 * r02 * r12
    sxz = s0 * r00 * r20 + s1 * r01 * r21 + s2 * r02 * r22
    syy = s0 * r10 * r10 + s1 * r11 * r11 + s2 * r12 * r12
    syz = s0 * r10 * r20 + s1 * r11 * r21 + s2 * r12 * r22
    szz = s0 * r20 * r20 + s1 * r21 * r21 + s2 * r22 * r22
    return jnp.stack([sxx, sxy, sxz, syy, syz, szz], axis=-1)


def transform_point(xyz: jax.Array, world_view: jax.Array) -> jax.Array:
    """World -> camera, row-vector convention (LoG/model/geometry.py:43-44)."""
    return xyz @ world_view[:3, :3] + world_view[3:4, :3]


# --------------------------------------------------------------------------
# Component ("_c") forms of the projective chain. The (N, 3/4) forms above
# hit two TPU pathologies on multi-M hot paths: (a) xyz @ 4x4 is an MXU
# matmul with K=3 that pads both operands to 128 lanes, (b) stacked (N, k)
# intermediates materialize with the minor dim padded to the (8, 128) tile —
# a 128/k memory blowup. The _c forms keep every value a flat (N,) lane
# vector so XLA fuses the whole chain into one bandwidth-bound VPU pass
# (measured: frustum pass 26.9 -> ~1 ms at 4.2M points).
# --------------------------------------------------------------------------
def transform_point_c(x, y, z, world_view):
    """World -> camera as components. Returns (tx, ty, tz)."""
    m = world_view
    tx = x * m[0, 0] + y * m[1, 0] + z * m[2, 0] + m[3, 0]
    ty = x * m[0, 1] + y * m[1, 1] + z * m[2, 1] + m[3, 1]
    tz = x * m[0, 2] + y * m[1, 2] + z * m[2, 2] + m[3, 2]
    return tx, ty, tz


def project_ndc_c(x, y, z, full_proj, eps: float = 1e-7):
    """World -> NDC as components. Returns (px, py, pz, w)."""
    m = full_proj
    hx = x * m[0, 0] + y * m[1, 0] + z * m[2, 0] + m[3, 0]
    hy = x * m[0, 1] + y * m[1, 1] + z * m[2, 1] + m[3, 1]
    hz = x * m[0, 2] + y * m[1, 2] + z * m[2, 2] + m[3, 2]
    w = x * m[0, 3] + y * m[1, 3] + z * m[2, 3] + m[3, 3]
    inv = 1.0 / (w + eps)
    return hx * inv, hy * inv, hz * inv, w


def frustum_flag_c(px, py, pz, padding: float = 0.05):
    """NDC frustum test on components (LoG/model/level_of_gaussian.py:49-53)."""
    return (
        (pz > 0.0)
        & (pz < 1.0)
        & (px > -1.0 - padding)
        & (px < 1.0 + padding)
        & (py > -1.0 - padding)
        & (py < 1.0 + padding)
    )


def build_cov3d_c(scaling: jax.Array, rotation: jax.Array):
    """build_cov3d returning the 6 upper-triangle components as a tuple of
    flat (N,) arrays (no (N, 6) materialization)."""
    return build_cov3d_cc(
        scaling[..., 0], scaling[..., 1], scaling[..., 2],
        rotation[..., 0], rotation[..., 1], rotation[..., 2],
        rotation[..., 3],
    )


def build_cov3d_cc(s0c, s1c, s2c, qw, qx, qy, qz):
    """build_cov3d_c on COLUMN inputs (7 flat (N,) arrays) — the
    column-native render path never materializes (N, k) stacks (a
    jnp.stack of N-length rows costs ~0.8 ns/element in strided sublane
    writes; see ARCHITECTURE.md round-3 notes)."""
    norm = jnp.sqrt(qw * qw + qx * qx + qy * qy + qz * qz)
    inv = 1.0 / norm
    w, x, y, z = qw * inv, qx * inv, qy * inv, qz * inv
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    s0 = s0c * s0c
    s1 = s1c * s1c
    s2 = s2c * s2c
    sxx = s0 * r00 * r00 + s1 * r01 * r01 + s2 * r02 * r02
    sxy = s0 * r00 * r10 + s1 * r01 * r11 + s2 * r02 * r12
    sxz = s0 * r00 * r20 + s1 * r01 * r21 + s2 * r02 * r22
    syy = s0 * r10 * r10 + s1 * r11 * r11 + s2 * r12 * r12
    syz = s0 * r10 * r20 + s1 * r11 * r21 + s2 * r12 * r22
    szz = s0 * r20 * r20 + s1 * r21 * r21 + s2 * r22 * r22
    return sxx, sxy, sxz, syy, syz, szz


def ewa_cov2d_c(cov3d_c, tx, ty, tz, world_view, focal_x, focal_y,
                tan_fovx, tan_fovy):
    """ewa_cov2d on components: cov3d_c = (sxx..szz) tuple, (tx,ty,tz)
    camera-space point. Returns (cxx, cxy, cyy)."""
    lim_x = 1.3 * tan_fovx
    lim_y = 1.3 * tan_fovy
    cx = jnp.clip(tx / tz, -lim_x, lim_x) * tz
    cy = jnp.clip(ty / tz, -lim_y, lim_y) * tz
    R = world_view[:3, :3]  # R[i, j] = Rw[j, i]
    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    ax = focal_x * inv_z
    bx = focal_x * cx * inv_z2
    ay = focal_y * inv_z
    by = focal_y * cy * inv_z2
    # M rows as scalar components: m0 = ax*Rw0 - bx*Rw2, m1 = ay*Rw1 - by*Rw2
    m00 = ax * R[0, 0] - bx * R[0, 2]
    m01 = ax * R[1, 0] - bx * R[1, 2]
    m02 = ax * R[2, 0] - bx * R[2, 2]
    m10 = ay * R[0, 1] - by * R[0, 2]
    m11 = ay * R[1, 1] - by * R[1, 2]
    m12 = ay * R[2, 1] - by * R[2, 2]
    sxx, sxy, sxz, syy, syz, szz = cov3d_c
    # Sigma @ m0
    s0x = sxx * m00 + sxy * m01 + sxz * m02
    s0y = sxy * m00 + syy * m01 + syz * m02
    s0z = sxz * m00 + syz * m01 + szz * m02
    cxx = m00 * s0x + m01 * s0y + m02 * s0z
    cxy = m10 * s0x + m11 * s0y + m12 * s0z
    s1x = sxx * m10 + sxy * m11 + sxz * m12
    s1y = sxy * m10 + syy * m11 + syz * m12
    s1z = sxz * m10 + syz * m11 + szz * m12
    cyy = m10 * s1x + m11 * s1y + m12 * s1z
    return cxx, cxy, cyy


def project_ndc(xyz: jax.Array, full_proj: jax.Array, eps: float = 1e-7):
    """World -> NDC via the full projection matrix.

    Returns (p_ndc (N, 3), w (N,)). Matches
    LoG/model/level_of_gaussian.py:44-47 (including the +1e-7 guard).
    """
    h = xyz @ full_proj[:3] + full_proj[3:4]
    w = h[..., 3]
    p = h[..., :3] / (w[..., None] + eps)
    return p, w


def ndc_to_pix(v: jax.Array, size) -> jax.Array:
    """NDC [-1, 1] -> pixel coordinate; Inria's ndc2Pix: ((v+1)*S - 1)/2."""
    return ((v + 1.0) * size - 1.0) * 0.5


def frustum_flag(p_ndc: jax.Array, padding: float = 0.05) -> jax.Array:
    """NDC-space frustum test (LoG/model/level_of_gaussian.py:49-53)."""
    depth = p_ndc[..., 2]
    return (
        (depth > 0.0)
        & (depth < 1.0)
        & (p_ndc[..., 0] > -1.0 - padding)
        & (p_ndc[..., 0] < 1.0 + padding)
        & (p_ndc[..., 1] > -1.0 - padding)
        & (p_ndc[..., 1] < 1.0 + padding)
    )


def ewa_cov2d(
    cov3d: jax.Array,
    xyz: jax.Array,
    world_view: jax.Array,
    focal_x,
    focal_y,
    tan_fovx,
    tan_fovy,
):
    """EWA splat of a 3D covariance to screen space. Returns (cxx, cxy, cyy), raw
    (no low-pass dilation — the caller picks the dilation policy).

    Closed form of LoG/model/geometry.py:91-126: with t = camera-space point
    (clamped to 1.3x the frustum cone), J the projective Jacobian and Rw the
    world->camera rotation, cov2d = (J Rw) Sigma (J Rw)^T.
    """
    t = transform_point(xyz, world_view)
    tz = t[..., 2]
    lim_x = 1.3 * tan_fovx
    lim_y = 1.3 * tan_fovy
    tx = jnp.clip(t[..., 0] / tz, -lim_x, lim_x) * tz
    ty = jnp.clip(t[..., 1] / tz, -lim_y, lim_y) * tz

    # Rows of world->camera rotation Rw (x_cam = Rw @ x_world):
    # world_view[:3, :3] holds Rw^T, so Rw rows are world_view columns.
    R = world_view[:3, :3]  # R[i, j] = Rw[j, i]
    r0 = R[:, 0]  # Rw row 0
    r1 = R[:, 1]
    r2 = R[:, 2]

    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # Rows of M = J @ Rw (only first two rows are nonzero).
    # J row0 = (fx/tz, 0, -fx tx / tz^2); J row1 = (0, fy/tz, -fy ty / tz^2)
    m0 = (
        (focal_x * inv_z)[..., None] * r0[None, :]
        - (focal_x * tx * inv_z2)[..., None] * r2[None, :]
    )
    m1 = (
        (focal_y * inv_z)[..., None] * r1[None, :]
        - (focal_y * ty * inv_z2)[..., None] * r2[None, :]
    )

    # Sigma @ m for packed symmetric Sigma.
    sxx, sxy, sxz, syy, syz, szz = (cov3d[..., i] for i in range(6))

    def sig_mul(v):
        return jnp.stack(
            [
                sxx * v[..., 0] + sxy * v[..., 1] + sxz * v[..., 2],
                sxy * v[..., 0] + syy * v[..., 1] + syz * v[..., 2],
                sxz * v[..., 0] + syz * v[..., 1] + szz * v[..., 2],
            ],
            axis=-1,
        )

    s_m0 = sig_mul(m0)
    cxx = jnp.sum(m0 * s_m0, axis=-1)
    cxy = jnp.sum(m1 * s_m0, axis=-1)
    cyy = jnp.sum(m1 * sig_mul(m1), axis=-1)
    return cxx, cxy, cyy


def dilate_cov2d(cxx, cxy, cyy, mode: str = "clamp"):
    """Low-pass policies seen across the reference rasterizers.

    'clamp': diag = max(diag, 0.3) — LoG/model/geometry.py:128-129 and the
             in-repo compute_radius kernel.
    'add':   diag += 0.3 — the original Inria rasterizer (geometry.py:87-88).
    'none':  leave untouched (the 'wodilate' fork's unfiltered path).
    """
    if mode == "clamp":
        return jnp.maximum(cxx, DILATE_PIXEL), cxy, jnp.maximum(cyy, DILATE_PIXEL)
    if mode == "add":
        return cxx + DILATE_PIXEL, cxy, cyy + DILATE_PIXEL
    if mode == "none":
        return cxx, cxy, cyy
    raise ValueError(f"unknown dilate mode {mode!r}")


def cov2d_radius(cxx, cxy, cyy):
    """Screen radius = 3 sqrt(lambda_max) of the 2x2 covariance.

    Matches LoG/model/geometry.py:141-151 including the 0.1 clamp inside the
    sqrt. Returns float radius in pixels.
    """
    det = cxx * cyy - cxy * cxy
    mid = 0.5 * (cxx + cyy)
    disc = jnp.sqrt(jnp.maximum(mid * mid - det, 0.1))
    lambda_max = mid + disc
    return 3.0 * jnp.sqrt(jnp.maximum(lambda_max, 0.0))


def inverse_cov2d(cxx, cxy, cyy, eps: float = 0.0):
    """Conic (inverse 2x2 covariance) + determinant; det<=0 marked invalid."""
    det = cxx * cyy - cxy * cxy
    det_safe = jnp.where(det != 0.0, det, 1.0)
    inv_det = 1.0 / det_safe
    return cyy * inv_det, -cxy * inv_det, cxx * inv_det, det


def compute_radius2d(
    xyz: jax.Array,
    scaling: jax.Array,
    rotation: jax.Array,
    world_view: jax.Array,
    full_proj: jax.Array,
    focal_x,
    focal_y,
    tan_fovx,
    tan_fovy,
    padding: float = 0.3,
) -> jax.Array:
    """Per-point projected pixel radius with visibility gating — the TPU
    equivalent of LoG/cuda/compute_radius_kernel.cu:107-156 (called every frame
    by the LoD tree traversal).

    Culled points (outside the padded NDC frustum) get radius 0, matching the
    CUDA kernel's early-out. Uses the 'clamp' low-pass like the kernel.
    """
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    px, py, pz, _ = project_ndc_c(x, y, z, full_proj)
    visible = frustum_flag_c(px, py, pz, padding=padding)
    cov3d_c = build_cov3d_c(scaling, rotation)
    tx, ty, tz = transform_point_c(x, y, z, world_view)
    cxx, cxy, cyy = ewa_cov2d_c(
        cov3d_c, tx, ty, tz, world_view, focal_x, focal_y, tan_fovx, tan_fovy
    )
    cxx, cxy, cyy = dilate_cov2d(cxx, cxy, cyy, mode="clamp")
    radius = cov2d_radius(cxx, cxy, cyy)
    det = cxx * cyy - cxy * cxy
    return jnp.where(visible & (det > 0), radius, 0.0)
