"""Image quality metrics (host numpy). Contract: LoG/utils/metric.py."""
from __future__ import annotations

import numpy as np


def mse(img1, img2):
    d = (np.asarray(img1) - np.asarray(img2)) ** 2
    return d.reshape(d.shape[0], -1).mean(axis=1, keepdims=True)


def psnr(rgbs, target_rgbs):
    m = np.mean((np.asarray(rgbs) - np.asarray(target_rgbs)) ** 2)
    return float(-10 * np.log10(max(m, 1e-12)))


def ssim_np(img1, img2):
    """Scalar SSIM via the jitted separable implementation ((C,H,W) inputs)."""
    import jax.numpy as jnp

    from ..ops.ssim import ssim_loss

    return 1.0 - float(ssim_loss(jnp.asarray(img1), jnp.asarray(img2)))
