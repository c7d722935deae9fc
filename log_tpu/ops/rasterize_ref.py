"""Reference rasterizer: differentiable alpha compositing in pure jnp.

The correctness oracle for the Pallas tile rasterizer, and a usable backend for
small scenes/tests. O(P * H * W) — every (gaussian-chunk, pixel) pair is
evaluated — but fully vectorized: the inner loop is a `lax.scan` over
depth-sorted chunks whose body is a few (chunk, Npix) VPU ops, so XLA keeps it
on-chip and fuses the compositing recurrence.

Output contract (the 5-tuple of the 'wodilate' CUDA fork plus extras;
LoG/render/renderer.py:153-159):
  render           (3, H, W) composited image over `background`
  radii            (P,)  int32 pixel radius, 0 = culled
  point_id_pixel   (H, W) int32 argmax-blend-weight contributor id, -1 = none
  point_weight_pixel (H, W) max blend weight per pixel
  point_weight     (P,)  max blend weight of each gaussian over all pixels
  alpha            (H, W) 1 - final transmittance
Compositing matches the Inria forward loop: alpha clamped to 0.99, skipped
below 1/255, contribution dropped once transmittance would fall under 1e-4.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .projection import ALPHA_MAX, ALPHA_MIN, T_EPS, Splats, project_gaussians


def _composite(
    splats: Splats,
    colors: jax.Array,
    image_height: int,
    image_width: int,
    background: jax.Array,
    chunk: int,
):
    """Depth-sorted front-to-back compositing over all pixels."""
    P = splats.opacity.shape[0]
    n_pix = image_height * image_width
    n_chan = colors.shape[-1]
    dt = jnp.promote_types(colors.dtype, splats.opacity.dtype)

    depth_key = jnp.where(splats.valid, splats.depth, jnp.inf)
    order = jnp.argsort(depth_key)

    pix_xy = splats.pix_xy[order].astype(dt)
    conic = splats.conic[order].astype(dt)
    opac = splats.opacity[order].astype(dt)
    cols = colors[order].astype(dt)

    pad = (-P) % chunk
    if pad:
        pix_xy = jnp.pad(pix_xy, ((0, pad), (0, 0)))
        conic = jnp.pad(conic, ((0, pad), (0, 0)))
        opac = jnp.pad(opac, ((0, pad),))
        cols = jnp.pad(cols, ((0, pad), (0, 0)))
    n_chunks = (P + pad) // chunk

    xs = jnp.arange(image_width, dtype=dt)
    ys = jnp.arange(image_height, dtype=dt)
    gx = jnp.tile(xs, image_height)  # flattened pixel x
    gy = jnp.repeat(ys, image_width)

    def body(carry, inp):
        color_acc, trans, best_w, best_id, chunk_idx = carry
        c_xy, c_conic, c_op, c_col = inp
        dx = c_xy[:, 0:1] - gx[None, :]  # (chunk, n_pix)
        dy = c_xy[:, 1:2] - gy[None, :]
        power = (
            -0.5 * (c_conic[:, 0:1] * dx * dx + c_conic[:, 2:3] * dy * dy)
            - c_conic[:, 1:2] * dx * dy
        )
        alpha = jnp.minimum(ALPHA_MAX, c_op[:, None] * jnp.exp(power))
        alpha = jnp.where((power <= 0.0) & (alpha >= ALPHA_MIN), alpha, 0.0)

        one_minus = 1.0 - alpha
        cp_incl = jnp.cumprod(one_minus, axis=0)
        cp_excl = jnp.concatenate(
            [jnp.ones_like(cp_incl[:1]), cp_incl[:-1]], axis=0
        )
        t_after = trans[None, :] * cp_incl
        w = trans[None, :] * cp_excl * alpha
        w = jnp.where(t_after >= T_EPS, w, 0.0)

        color_acc = color_acc + w.T @ c_col  # (n_pix, C)
        trans = trans * cp_incl[-1]

        cw = jnp.max(w, axis=0)
        ca = jnp.argmax(w, axis=0).astype(jnp.int32)
        take = cw > best_w
        best_w = jnp.where(take, cw, best_w)
        best_id = jnp.where(take, chunk_idx * chunk + ca, best_id)

        pw = jnp.max(w, axis=1)  # (chunk,) max weight over pixels
        return (color_acc, trans, best_w, best_id, chunk_idx + 1), pw

    init = (
        jnp.zeros((n_pix, n_chan), dt),
        jnp.ones((n_pix,), dt),
        jnp.zeros((n_pix,), dt),
        jnp.full((n_pix,), -1, jnp.int32),
        jnp.int32(0),
    )
    inputs = (
        pix_xy.reshape(n_chunks, chunk, 2),
        conic.reshape(n_chunks, chunk, 3),
        opac.reshape(n_chunks, chunk),
        cols.reshape(n_chunks, chunk, n_chan),
    )
    # remat the scan body: without it, autodiff saves every chunk's
    # (chunk, n_pix) intermediates — O(K * H * W) residuals that OOM the
    # oracle backward at full-resolution training (e.g. 8k pts x 82k px
    # x several temps > HBM). Recomputing the body in the backward trades
    # ~2x FLOPs for O(n_pix) residual memory; gradients are unchanged.
    (color_acc, trans, best_w, best_id_sorted, _), pw_chunks = jax.lax.scan(
        jax.checkpoint(body), init, inputs
    )

    image = color_acc + trans[:, None] * background[None, :].astype(dt)
    image = image.T.reshape(n_chan, image_height, image_width)

    # Map sorted positions back to caller ids.
    order_pad = jnp.concatenate(
        [order.astype(jnp.int32), jnp.full((pad,), -1, jnp.int32)]
    )
    point_id_pixel = jnp.where(
        best_id_sorted >= 0, order_pad[jnp.maximum(best_id_sorted, 0)], -1
    ).reshape(image_height, image_width)
    point_weight_pixel = best_w.reshape(image_height, image_width)
    point_weight = jnp.zeros((P,), dt).at[order].set(pw_chunks.reshape(-1)[:P])
    alpha_map = (1.0 - trans).reshape(image_height, image_width)
    return image, point_id_pixel, point_weight_pixel, point_weight, alpha_map


@partial(
    jax.jit,
    static_argnames=(
        "image_height",
        "image_width",
        "mode",
        "use_filter",
        "chunk",
    ),
)
def rasterize(
    xyz,
    colors,
    opacity,
    scaling,
    rotation,
    means2d_offset,
    world_view,
    full_proj,
    focal_x,
    focal_y,
    tan_fovx,
    tan_fovy,
    background,
    image_height: int,
    image_width: int,
    active_mask=None,
    mode: str = "antialias",
    use_filter: bool = True,
    chunk: int = 32,
):
    """Differentiable rasterization of activated Gaussians. See module doc.

    All inputs may be capacity-padded; pass `active_mask` to cull padding.
    """
    splats = project_gaussians(
        xyz,
        scaling,
        rotation,
        opacity,
        world_view,
        full_proj,
        focal_x,
        focal_y,
        tan_fovx,
        tan_fovy,
        image_height,
        image_width,
        mode=mode,
        use_filter=use_filter,
        means2d_offset=means2d_offset,
        active_mask=active_mask,
    )
    image, pid, pwp, pw, alpha_map = _composite(
        splats, colors, image_height, image_width, background, chunk
    )
    return {
        "render": image,
        "radii": splats.radius.astype(jnp.int32),
        "point_id_pixel": pid,
        "point_weight_pixel": pwp,
        "point_weight": pw,
        "alpha": alpha_map,
        "depth_cam": splats.depth,
    }
