"""Loss modules: SSIM + MiDaS-style scale/shift-invariant depth loss.

Contracts: LoG/render/loss.py:6-117. SSIM lives in ops/ssim.py (separable
conv formulation); re-exported here for API parity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.ssim import ssim_loss as ssim_loss  # noqa: F401 (API parity)


def compute_scale_and_shift(prediction, target, mask):
    """Closed-form per-image LSQ fit of scale/shift
    (LoG/render/loss.py:47-67). Shapes (B, H, W)."""
    a_00 = jnp.sum(mask * prediction * prediction, axis=(1, 2))
    a_01 = jnp.sum(mask * prediction, axis=(1, 2))
    a_11 = jnp.sum(mask, axis=(1, 2))
    b_0 = jnp.sum(mask * prediction * target, axis=(1, 2))
    b_1 = jnp.sum(mask * target, axis=(1, 2))
    det = a_00 * a_11 - a_01 * a_01
    safe = jnp.where(det != 0, det, 1.0)
    x_0 = jnp.where(det != 0, (a_11 * b_0 - a_01 * b_1) / safe, 0.0)
    x_1 = jnp.where(det != 0, (-a_01 * b_0 + a_00 * b_1) / safe, 0.0)
    return x_0, x_1


def gradient_loss(prediction, target, mask):
    """Masked multi-scale gradient regularizer term
    (LoG/render/loss.py:69-84)."""
    m = jnp.sum(mask)
    diff = mask * (prediction - target)
    grad_x = jnp.abs(diff[:, :, 1:] - diff[:, :, :-1])
    mask_x = mask[:, :, 1:] * mask[:, :, :-1]
    grad_y = jnp.abs(diff[:, 1:, :] - diff[:, :-1, :])
    mask_y = mask[:, 1:, :] * mask[:, :-1, :]
    total = jnp.sum(mask_x * grad_x) + jnp.sum(mask_y * grad_y)
    return total / jnp.maximum(m, 1.0)


def scale_and_shift_invariant_loss(
    prediction, target, mask, alpha: float = 0.5, scales: int = 1
):
    """MiDaS SSI loss: LSQ-aligned MSE + gradient reg
    (LoG/render/loss.py:101-117). Returns (loss, aligned prediction)."""
    scale, shift = compute_scale_and_shift(prediction, target, mask)
    pred_ssi = scale[:, None, None] * prediction + shift[:, None, None]
    mask_sum = jnp.maximum(jnp.sum(mask), 1.0)
    total = jnp.sum(((pred_ssi - target) * mask) ** 2) / mask_sum
    reg = 0.0
    for s in range(scales):
        step = 2**s
        reg = reg + gradient_loss(
            pred_ssi[:, ::step, ::step], target[:, ::step, ::step],
            mask[:, ::step, ::step],
        )
    return total + alpha * reg, pred_ssi


def depth_patch_loss(pred_depth, gt_depth, accmap, rng_key, num_patch=64,
                     patch_size=64):
    """Random-patch SSI loss on inverse depth
    (LoG/render/renderer.py:268-292). pred/gt: (H, W); accmap: (H, W)."""
    H, W = gt_depth.shape
    mask = accmap > 0.5
    kr, kc = jax.random.split(rng_key)
    rows = jax.random.randint(kr, (num_patch,), 0, max(H - patch_size, 1))
    cols = jax.random.randint(kc, (num_patch,), 0, max(W - patch_size, 1))

    def take(img, r, c):
        return jax.lax.dynamic_slice(img, (r, c), (patch_size, patch_size))

    preds = jax.vmap(lambda r, c: take(pred_depth, r, c))(rows, cols)
    gts = jax.vmap(lambda r, c: take(gt_depth, r, c))(rows, cols)
    masks = jax.vmap(lambda r, c: take(mask.astype(jnp.float32), r, c))(rows, cols)
    loss, _ = scale_and_shift_invariant_loss(
        1.0 / (preds + 1e-5), gts, masks
    )
    return loss
