"""Multi-chip fused training step: data-parallel cameras x point-sharded state.

Strategy: express the whole step as ordinary jnp over sharded arrays and let
the GSPMD partitioner insert the collectives (the scaling-book recipe — pick a
mesh, annotate shardings, let XLA do the rest):

  * the loss is a mean over a camera batch (sharded over 'data'); each
    camera's render gathers its visible slice from point-sharded params
    (all-gather over ICI), and `jax.grad` through that gather produces
    scatter-adds back to the shards (reduce-scatter);
  * Adam runs full-capacity but masked to touched rows — bit-identical to the
    reference's sparse semantics (untouched rows keep their moments;
    LoG/model/sparse_optimizer.py:163-196) while staying a pure sharded map
    over the point axis with zero re-layout.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..ops import rasterize_ref
from ..ops.sh import eval_sh, sh_to_rgb
from ..ops.ssim import ssim_loss


@dataclass(frozen=True)
class ShardedStepConfig:
    image_height: int
    image_width: int
    k_visible: int  # padded visible-slice size (shared across the batch)
    sh_degree: int
    mode: str = "antialias"
    chunk: int = 32
    opt_keys: tuple = ("xyz", "colors", "scaling", "opacity", "rotation", "shs")


def _render_one_camera(params, idx, cam_wv, cam_fp, cam_center, cam_scalars,
                       background, gt, cfg: ShardedStepConfig):
    """Differentiable loss of one camera against full param arrays."""
    cap = params["xyz"].shape[0]
    lane_valid = idx < cap
    slices = {}
    for key in cfg.opt_keys:
        if key not in params:
            continue
        s = params[key].at[idx].get(mode="fill", fill_value=0.0)
        if key == "rotation":
            s = jnp.where(lane_valid[:, None], s, jnp.asarray([1.0, 0, 0, 0]))
        slices[key] = s
    scaling = jnp.exp(slices["scaling"])
    opacity = jax.nn.sigmoid(slices["opacity"][:, 0])
    rotation = slices["rotation"] / jnp.linalg.norm(
        slices["rotation"], axis=-1, keepdims=True
    )
    colors = sh_to_rgb(slices["colors"])
    if cfg.sh_degree > 0 and "shs" in slices:
        dirs = jax.lax.stop_gradient(slices["xyz"]) - cam_center[None]
        dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
        colors = colors + eval_sh(dirs, slices["shs"], degree=cfg.sh_degree)
    out = rasterize_ref.rasterize(
        xyz=slices["xyz"],
        colors=colors,
        opacity=opacity,
        scaling=scaling,
        rotation=rotation,
        means2d_offset=jnp.zeros((idx.shape[0], 2), jnp.float32),
        world_view=cam_wv,
        full_proj=cam_fp,
        focal_x=cam_scalars[0],
        focal_y=cam_scalars[1],
        tan_fovx=cam_scalars[2],
        tan_fovy=cam_scalars[3],
        background=background,
        image_height=cfg.image_height,
        image_width=cfg.image_width,
        active_mask=lane_valid,
        mode=cfg.mode,
        use_filter=True,
        chunk=cfg.chunk,
    )
    l1 = jnp.mean(jnp.abs(out["render"] - gt))
    ssim = ssim_loss(out["render"], gt)
    loss = 0.8 * l1 + 0.2 * ssim
    touched = jnp.zeros((cap + 1,), bool).at[
        jnp.where(out["radii"] > 0, idx, cap)
    ].set(True, mode="drop")[:cap]
    return loss, touched


def _masked_adam_full(params, moments, grads, mask, global_step, lrs,
                      eps=1e-15, beta1=0.9, beta2=0.999):
    """Full-capacity Adam masked to touched rows — shard-local over 'point'."""
    step = jnp.asarray(global_step, jnp.float32)
    bias1 = 1 - beta1**step
    bias2 = 1 - beta2**step
    new_params = dict(params)
    new_m1 = dict(moments["exp_avg"])
    new_m2 = dict(moments["exp_avg_sq"])
    for key, g in grads.items():
        if key not in lrs or g is None:
            continue
        m = mask.reshape((-1,) + (1,) * (g.ndim - 1))
        m1 = jnp.where(m, beta1 * moments["exp_avg"][key] + (1 - beta1) * g,
                       moments["exp_avg"][key])
        m2 = jnp.where(m, beta2 * moments["exp_avg_sq"][key] + (1 - beta2) * g * g,
                       moments["exp_avg_sq"][key])
        denom = jnp.sqrt(m2) / jnp.sqrt(bias2) + eps
        p = jnp.where(m, params[key] - (lrs[key] / bias1) * (m1 / denom),
                      params[key])
        new_params[key], new_m1[key], new_m2[key] = p, m1, m2
    return new_params, {"exp_avg": new_m1, "exp_avg_sq": new_m2}


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0, 1))
def sharded_train_step(
    params: dict,  # point-sharded, capacity-padded
    moments: dict,  # point-sharded
    keep_mask: jax.Array,  # (B, capacity) bool — per-camera visible cut
    cam_wv: jax.Array,  # (B, 4, 4)
    cam_fp: jax.Array,  # (B, 4, 4)
    cam_center: jax.Array,  # (B, 3)
    cam_scalars: jax.Array,  # (B, 4) focal_x, focal_y, tan_fovx, tan_fovy
    background: jax.Array,  # (3,)
    gt: jax.Array,  # (B, 3, H, W) — sharded over 'data'
    lrs: dict,
    global_step: jax.Array,
    cfg: ShardedStepConfig,
):
    """One data-parallel step over B cameras. Returns (params, moments, loss)."""
    cap = params["xyz"].shape[0]
    idx = jax.vmap(
        lambda m: jnp.nonzero(m, size=cfg.k_visible, fill_value=cap)[0]
    )(keep_mask)  # (B, K)

    def loss_fn(params_):
        losses, touched = jax.vmap(
            lambda i, wv, fp, cc, cs, g: _render_one_camera(
                params_, i, wv, fp, cc, cs, background, g, cfg
            )
        )(idx, cam_wv, cam_fp, cam_center, cam_scalars, gt)
        return jnp.mean(losses), jnp.any(touched, axis=0)

    (loss, touched), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    params, moments = _masked_adam_full(
        params, moments, grads, touched, global_step, lrs
    )
    return params, moments, loss
