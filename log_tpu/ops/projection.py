"""Shared projection stage for both rasterizer backends.

Turns world-space Gaussian parameters into screen-space splat parameters
(pixel mean, conic, effective opacity, depth, radius). This is the part of the
CUDA `preprocess` kernel (diff_gaussian_rasterization fork, consumed at
LoG/render/renderer.py:141-155) that is pure vectorized math — on TPU it is a
single fused XLA elementwise pipeline over (P,) arrays.

Antialias semantics of the 'wodilate' fork:
  * training (`use_filter=True`): covariance low-passed by +0.3 px and opacity
    scaled by sqrt(det(cov) / det(cov + 0.3 I)) (Mip-Splatting-style
    compensation, replacing the unconditional dilation of the Inria original);
  * inference (`use_filter=False`, LoG/render/renderer.py:151-152): raw
    covariance, no compensation (the LoD cut guarantees >= 3 px splats).
`mode='original'` reproduces the Inria rasterizer (dilate, no compensation),
selected by `use_origin_render` (LoG/render/renderer.py:99-107).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import gaussian_math as gm

# Inria near-plane cull threshold (camera-space z).
NEAR_Z = 0.2
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


class Splats(NamedTuple):
    """Screen-space splats, all (P,) or (P, k)."""

    pix_xy: jax.Array  # (P, 2) pixel-space mean
    conic: jax.Array  # (P, 3) inverse 2x2 covariance (xx, xy, yy)
    opacity: jax.Array  # (P,) effective opacity (with AA compensation)
    depth: jax.Array  # (P,) camera-space z
    radius: jax.Array  # (P,) float pixel radius (0 for culled)
    valid: jax.Array  # (P,) bool


class SplatCols(NamedTuple):
    """Column-native screen-space splats: every field a flat (P,) array.

    The inference hot path keeps per-point data as 1-D columns end to end
    (compaction sort payloads -> activation -> projection -> pair rows):
    materializing (P, k) stacks from 1-D rows costs ~0.8 ns/element in
    strided sublane writes on TPU — ~30 ms/frame at the r3 bench sizes."""

    px: jax.Array
    py: jax.Array
    cxx: jax.Array
    cxy: jax.Array
    cyy: jax.Array
    opacity: jax.Array
    depth: jax.Array
    radius: jax.Array
    valid: jax.Array


def project_gaussians(
    xyz: jax.Array,
    scaling: jax.Array,
    rotation: jax.Array,
    opacity: jax.Array,
    world_view: jax.Array,
    full_proj: jax.Array,
    focal_x,
    focal_y,
    tan_fovx,
    tan_fovy,
    image_height: int,
    image_width: int,
    mode: str = "antialias",
    use_filter: bool = True,
    means2d_offset: jax.Array | None = None,
    active_mask: jax.Array | None = None,
    tight_radius: bool = False,
) -> Splats:
    """Project activated Gaussian parameters to screen-space splats.

    `means2d_offset` is an optional (P, 2) zero tensor added to the NDC mean;
    its cotangent reproduces the reference's `viewspace_points.grad`
    (NDC-convention screen gradient used by densification;
    LoG/model/counter.py:46).
    """
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    tx, ty, tz = gm.transform_point_c(x, y, z, world_view)
    depth = tz
    ndc_x, ndc_y, _, _ = gm.project_ndc_c(x, y, z, full_proj)
    if means2d_offset is not None:
        ndc_x = ndc_x + means2d_offset[..., 0]
        ndc_y = ndc_y + means2d_offset[..., 1]
    pix_x = gm.ndc_to_pix(ndc_x, image_width)
    pix_y = gm.ndc_to_pix(ndc_y, image_height)
    pix_xy = jnp.stack([pix_x, pix_y], axis=-1)

    cov3d_c = gm.build_cov3d_c(scaling, rotation)
    cxx, cxy, cyy = gm.ewa_cov2d_c(
        cov3d_c, tx, ty, tz, world_view, focal_x, focal_y, tan_fovx, tan_fovy
    )
    det_raw = cxx * cyy - cxy * cxy
    if mode == "original":
        ucxx, ucxy, ucyy = gm.dilate_cov2d(cxx, cxy, cyy, mode="add")
        comp = jnp.ones_like(cxx)
    elif mode == "antialias":
        if use_filter:
            ucxx, ucxy, ucyy = gm.dilate_cov2d(cxx, cxy, cyy, mode="add")
            det_f = ucxx * ucyy - ucxy * ucxy
            # 1e-12 floor: d sqrt(x) -> inf at x = 0, and degenerate
            # (deep-split) splats reach det_raw ~ 0 — the floor clamps the
            # gradient instead of emitting inf (comp itself stays ~1e-6)
            comp = jnp.sqrt(
                jnp.maximum(det_raw, 1e-12)
                / jnp.where(det_f != 0.0, det_f, 1.0)
            )
        else:
            ucxx, ucxy, ucyy = cxx, cxy, cyy
            comp = jnp.ones_like(cxx)
    else:
        raise ValueError(f"unknown rasterizer mode {mode!r}")

    icxx, icxy, icyy, det = gm.inverse_cov2d(ucxx, ucxy, ucyy)
    conic = jnp.stack([icxx, icxy, icyy], axis=-1)
    radius = gm.cov2d_radius(ucxx, ucxy, ucyy)
    op = opacity * comp
    if tight_radius:
        # opacity-aware extent: contribution alpha*exp(-d^2/2) falls below
        # 1/255 (the kernel's ALPHA_MIN cutoff) at d = sqrt(2 ln(255 a)) —
        # the fixed 3-sigma rect overcovers low-opacity splats, and pair
        # count (the sort-bound binning cost) scales with rect area
        lim = jnp.sqrt(jnp.maximum(2.0 * jnp.log(255.0 * op), 0.0))
        radius = radius * jnp.minimum(lim * (1.0 / 3.0), 1.0)
    radius = jnp.ceil(radius)

    valid = (depth > NEAR_Z) & (det > 0.0)
    if active_mask is not None:
        valid = valid & active_mask
    radius = jnp.where(valid, radius, 0.0)
    op = jnp.where(valid, op, 0.0)
    return Splats(
        pix_xy=pix_xy,
        conic=conic,
        opacity=op,
        depth=depth,
        radius=radius,
        valid=valid,
    )


def project_gaussians_cols(
    x, y, z,            # world position columns, activated
    sx, sy, sz,         # scaling columns (activated, i.e. exp applied)
    qw, qx, qy, qz,     # rotation columns (normalization happens inside)
    opacity,            # (P,) activated opacity
    world_view,
    full_proj,
    focal_x,
    focal_y,
    tan_fovx,
    tan_fovy,
    image_height: int,
    image_width: int,
    mode: str = "antialias",
    use_filter: bool = True,
    active_mask=None,
    tight_radius: bool = False,
    with_cut_radius: bool = False,
    cut_padding: float = 0.3,
):
    """project_gaussians on COLUMN inputs/outputs — identical math, zero
    (P, k) materializations (see SplatCols). Inference path only (no
    means2d_offset cotangent).

    with_cut_radius=True additionally returns the LoD-cut radius
    (compute_radius2d semantics: 'clamp' low-pass + padded-frustum gating,
    LoG/cuda/compute_radius_kernel.cu:107-156) from the SAME cov2d
    evaluation — the full-capacity-axis inference path projects once and
    derives both the cut decision and the render splats from it."""
    tx, ty, tz = gm.transform_point_c(x, y, z, world_view)
    depth = tz
    ndc_x, ndc_y, ndc_z, _ = gm.project_ndc_c(x, y, z, full_proj)
    pix_x = gm.ndc_to_pix(ndc_x, image_width)
    pix_y = gm.ndc_to_pix(ndc_y, image_height)

    cov3d_c = gm.build_cov3d_cc(sx, sy, sz, qw, qx, qy, qz)
    cxx, cxy, cyy = gm.ewa_cov2d_c(
        cov3d_c, tx, ty, tz, world_view, focal_x, focal_y, tan_fovx, tan_fovy
    )
    if with_cut_radius:
        kxx, kxy, kyy = gm.dilate_cov2d(cxx, cxy, cyy, mode="clamp")
        cut_vis = gm.frustum_flag_c(ndc_x, ndc_y, ndc_z, padding=cut_padding)
        cut_det = kxx * kyy - kxy * kxy
        cut_radius = jnp.where(
            cut_vis & (cut_det > 0), gm.cov2d_radius(kxx, kxy, kyy), 0.0
        )
    det_raw = cxx * cyy - cxy * cxy
    if mode == "original":
        ucxx, ucxy, ucyy = gm.dilate_cov2d(cxx, cxy, cyy, mode="add")
        comp = jnp.ones_like(cxx)
    elif mode == "antialias":
        if use_filter:
            ucxx, ucxy, ucyy = gm.dilate_cov2d(cxx, cxy, cyy, mode="add")
            det_f = ucxx * ucyy - ucxy * ucxy
            comp = jnp.sqrt(
                jnp.maximum(det_raw, 1e-12)
                / jnp.where(det_f != 0.0, det_f, 1.0)
            )
        else:
            ucxx, ucxy, ucyy = cxx, cxy, cyy
            comp = jnp.ones_like(cxx)
    else:
        raise ValueError(f"unknown rasterizer mode {mode!r}")

    icxx, icxy, icyy, det = gm.inverse_cov2d(ucxx, ucxy, ucyy)
    radius = gm.cov2d_radius(ucxx, ucxy, ucyy)
    op = opacity * comp
    if tight_radius:
        lim = jnp.sqrt(jnp.maximum(2.0 * jnp.log(255.0 * op), 0.0))
        radius = radius * jnp.minimum(lim * (1.0 / 3.0), 1.0)
    radius = jnp.ceil(radius)

    valid = (depth > NEAR_Z) & (det > 0.0)
    if active_mask is not None:
        valid = valid & active_mask
    radius = jnp.where(valid, radius, 0.0)
    op = jnp.where(valid, op, 0.0)
    splats = SplatCols(
        px=pix_x, py=pix_y, cxx=icxx, cxy=icxy, cyy=icyy, opacity=op,
        depth=depth, radius=radius, valid=valid,
    )
    if with_cut_radius:
        return splats, cut_radius
    return splats
