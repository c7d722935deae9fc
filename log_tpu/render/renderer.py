"""Renderer + loss layer.

API mirror of LoG/render/renderer.py (NaiveRendererAndLoss / MaskForeground /
BaseRender helpers) on top of the JAX rasterizer backends. Training gradients
flow through the fused train step (log_tpu.model.train_step); `vis()` is the
no-grad inference path used by demo/val/overlook and needs no index gather at
all — the LoD cut is applied as an `active_mask` directly on the
capacity-padded arrays.
"""
from __future__ import annotations

import math
import os
from collections import defaultdict

import numpy as np

import jax.numpy as jnp

from ..ops import rasterize_ref

CAMERA_KEYS = (
    "camera_center",
    "world_view_transform",
    "full_proj_transform",
    "image_width",
    "image_height",
    "FoVx",
    "FoVy",
    "K",
    "R",
    "T",
)


def camera_device(camera: dict) -> dict:
    """Host camera dict -> arrays + static ints for the jitted render fns."""
    H = int(camera["image_height"])
    W = int(camera["image_width"])
    tan_fovx = math.tan(float(camera["FoVx"]) * 0.5)
    tan_fovy = math.tan(float(camera["FoVy"]) * 0.5)
    return {
        "world_view": jnp.asarray(camera["world_view_transform"], jnp.float32),
        "full_proj": jnp.asarray(camera["full_proj_transform"], jnp.float32),
        "camera_center": jnp.asarray(
            np.asarray(camera["camera_center"]).reshape(3), jnp.float32
        ),
        "focal_x": W / (2.0 * tan_fovx),
        "focal_y": H / (2.0 * tan_fovy),
        "tan_fovx": tan_fovx,
        "tan_fovy": tan_fovy,
        "image_height": H,
        "image_width": W,
    }


class BaseRender:
    """Static visualization helpers (LoG/render/renderer.py:11-78)."""

    @staticmethod
    def float32_to_uint8(array):
        return np.clip(array * 255, 0, 255).astype(np.uint8)

    @staticmethod
    def tensor_to_bgr(tensor):
        vis = np.asarray(tensor).transpose(1, 2, 0)
        vis = (np.clip(vis[:, :, ::-1], 0.0, 1.0) * 255).astype(np.uint8)
        return np.ascontiguousarray(vis)

    @staticmethod
    def acc_to_bgr(tensor):
        import cv2

        vis = (np.clip(np.asarray(tensor), 0.0, 1.0) * 255).astype(np.uint8)
        return np.ascontiguousarray(cv2.applyColorMap(vis, cv2.COLORMAP_JET))

    @staticmethod
    def depth_to_bgr(tensor):
        t = np.asarray(tensor)
        depth = (t - t.min()) / max(t.max() - t.min(), 1e-9)
        return BaseRender.acc_to_bgr(depth)

    @staticmethod
    def marigold_depth_vis(tensor, cmap="Spectral"):
        import matplotlib

        depth = np.asarray(tensor)
        cm = matplotlib.colormaps[cmap]
        img = cm(depth, bytes=False)[..., 0:3]
        return BaseRender.float32_to_uint8(img)

    @staticmethod
    def make_video(path, remove_image=False, fps=30):
        cmd = (
            f'ffmpeg -y -r {fps} -i {path}/%06d.jpg -vf '
            f'scale="2*ceil(iw/2):2*ceil(ih/2)" -vcodec libx264 -r {fps} '
            f"{path}.mp4 -loglevel quiet"
        )
        print(cmd)
        if os.system(cmd) != 0 or not os.path.exists(path + ".mp4"):
            _cv2_video_fallback(path, fps)


class NaiveRendererAndLoss(BaseRender):
    """0.8 L1 + 0.2 SSIM training renderer (LoG/render/renderer.py:80-316)."""

    def __init__(
        self,
        split="train",
        use_randback=False,
        background=(0.0, 0.0, 0.0),
        use_rand_radius=False,
        use_origin_render=False,
        render_depth=False,
    ):
        self.split = split
        self.use_randback = use_randback
        self.use_rand_radius = use_rand_radius
        self.render_depth = render_depth
        self.background = np.asarray(background, np.float32)
        # 'original' = Inria dilation; 'antialias' = wodilate fork
        self.mode = "original" if use_origin_render else "antialias"
        self.use_origin_render = use_origin_render
        self.iteration = 0

    def set_state(self, render_depth=None, background=None):
        if render_depth is not None:
            self.render_depth = render_depth
        if background is not None:
            print(f"[{self.__class__.__name__}] Set background to {background}")
            self.background = np.asarray(background, np.float32)

    def prepare_camera(self, batch, bn, background=None, is_train=False, rng=None):
        camera = {}
        for key in CAMERA_KEYS:
            camera[key] = _index_batch(batch["camera"][key], bn)
        if background is None:
            if is_train and self.use_randback:
                rng = rng or np.random.default_rng()
                background = rng.random(3).astype(np.float32)
            else:
                background = self.background
        return camera, np.asarray(background, np.float32)

    # ------------------------------------------------------------ inference
    def render_one(self, model, camera, background, extra_colors=None):
        """No-grad render of the current LoD cut. Returns device-array dict."""
        cam = camera_device(camera)
        keep = model.visibility_flag["keep_mask"]
        params = model.gaussian.params()
        act = model.gaussian.activation
        colors = act.colors_activation(
            params, cam["camera_center"], model.gaussian.active_sh_degree
        )
        kwargs = dict(
            xyz=params["xyz"],
            colors=colors if extra_colors is None else extra_colors,
            opacity=act.opacity_activation(params["opacity"][:, 0]),
            scaling=act.scaling_activation(params["scaling"]),
            rotation=act.rotation_activation(params["rotation"]),
            means2d_offset=jnp.zeros_like(params["xyz"][:, :2]),
            world_view=cam["world_view"],
            full_proj=cam["full_proj"],
            focal_x=cam["focal_x"],
            focal_y=cam["focal_y"],
            tan_fovx=cam["tan_fovx"],
            tan_fovy=cam["tan_fovy"],
            background=jnp.asarray(background),
            image_height=cam["image_height"],
            image_width=cam["image_width"],
            active_mask=keep,
            mode=self.mode,
            use_filter=False,
        )
        from ..ops import pick_backend, pick_max_pairs

        # size the pair budget from the actual visible-cut count when the
        # prepare pass produced one (far tighter than capacity for LoD cuts)
        vf = model.visibility_flag or {}
        counts = vf.get("counts")
        if counts is not None:
            k_budget = max(int(counts[0]) + int(counts[1]), 1)
        else:
            k_budget = params["xyz"].shape[0]
        if pick_backend(params["xyz"].shape[0]) == "tiled":
            from ..ops.rasterize_tiled import rasterize_tiled

            out = rasterize_tiled(
                **kwargs,
                max_pairs=pick_max_pairs(k_budget),
                with_stats=False,
            )
        else:
            out = rasterize_ref.rasterize(**kwargs)
        return out

    def vis(self, batch, model, background=None):
        """Batch inference (LoG/render/renderer.py:225-251).

        The rgb path goes through the model's fused prepare+render
        executable (one jit, no per-frame host sync); depth/aux renders keep
        the two-phase path."""
        preds = defaultdict(list)
        B = _batch_size(batch)
        use_fused = (
            not self.render_depth
            and not getattr(model, "training", False)
            and hasattr(model, "render_fused")
        )
        for bn in range(B):
            camera, bg = self.prepare_camera(batch, bn, background, is_train=False)
            if use_fused:
                out = model.render_fused(camera, bg)
            else:
                model.prepare_from_camera(camera)
                out = self.render_one(model, camera, bg)
            # quantize on device and transfer uint8 (remote runtimes move
            # bytes slowly; frames end up in 8-bit files anyway)
            ren8 = (jnp.clip(out["render"], 0, 1) * 255).astype(jnp.uint8)
            alp8 = (jnp.clip(out["alpha"], 0, 1) * 255).astype(jnp.uint8)
            preds["render"].append(
                np.asarray(ren8).astype(np.float32) / 255.0
            )
            alpha = np.asarray(alp8).astype(np.float32) / 255.0
            preds["alpha"].append(alpha)
            preds["mask"].append(alpha)  # rgba demo contract
            
            if self.render_depth:
                cam = camera_device(camera)
                params = model.gaussian.params()
                depth_cam = np.asarray(out["depth_cam"])
                ones = jnp.ones_like(params["xyz"][:, 0])
                colors_depth = jnp.stack(
                    [jnp.asarray(out["depth_cam"]), params["xyz"][:, 2], ones], -1
                )
                aux = self.render_one(
                    model, camera, np.zeros(3, np.float32), extra_colors=colors_depth
                )
                preds["depth"].append(np.asarray(aux["render"][0]))
                preds["height"].append(np.asarray(aux["render"][1]))
                preds["accmap"].append(np.asarray(aux["render"][2]))
        for key in list(preds.keys()):
            try:
                preds[key] = np.stack(preds[key])
            except ValueError:
                pass
        return preds

    def process_gt(self, batch):
        img = np.asarray(batch["image"])
        return img.transpose(0, 3, 1, 2)

    def process_pred(self, batch, pred):
        return pred


class MaskForeground(NaiveRendererAndLoss):
    """Object-centric variant: crop to mask bbox, composite background into GT
    (LoG/render/renderer.py:318-373). Training restricts the loss to the
    padded mask bbox inside the fused step (crop_loss) — the trainer passes
    the batch mask through when `foreground_crop` is set."""

    foreground_crop = True

    @staticmethod
    def bound_from_mask(msk, padding):
        msk_hw = msk[0, :, :, 0] > 0.5
        cols = np.where(msk_hw.any(axis=0))[0]
        rows = np.where(msk_hw.any(axis=1))[0]
        l, r = max(cols[0] - padding, 0), cols[-1] + padding
        t, b = max(rows[0] - padding, 0), rows[-1] + padding
        return int(l), int(t), int(r), int(b)

    def process_gt(self, batch):
        msk = np.asarray(batch["mask"])[..., None]
        l, t, r, b = self.bound_from_mask(msk, padding=0)
        gt = np.asarray(batch["image"])
        gt = gt * msk + (1 - msk) * self.background[None, None, None]
        gt = gt[:, t : b + 1, l : r + 1]
        return gt.transpose(0, 3, 1, 2)

    def process_pred(self, batch, pred):
        msk = np.asarray(batch["mask"])[..., None]
        l, t, r, b = self.bound_from_mask(msk, padding=0)
        return pred[:, t : b + 1, l : r + 1]


def _batch_size(batch) -> int:
    return np.asarray(batch["camera"]["camera_center"]).shape[0]


def _index_batch(val, bn):
    arr = np.asarray(val)
    return arr[bn]


def _cv2_video_fallback(path, fps=30):
    """mp4 via OpenCV when ffmpeg is absent (same frames, mp4v codec)."""
    import glob

    import cv2

    frames = sorted(glob.glob(os.path.join(path, "*.jpg")))
    if not frames:
        return
    first = cv2.imread(frames[0])
    h, w = first.shape[:2]
    vw = cv2.VideoWriter(
        path + ".mp4", cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    if not vw.isOpened():
        print(f"[make_video] cv2 writer failed for {path}.mp4")
        return
    for f in frames:
        vw.write(cv2.imread(f))
    vw.release()
    print(f"[make_video] wrote {path}.mp4 via cv2 ({len(frames)} frames)")
