"""Synthetic scenes: ground-truth images rendered from a known Gaussian set.

The reference relies on a downloadable demo dataset
(feicuiwan_sample_folder, README.md:25); for hermetic tests and benchmarking we
instead synthesize scenes of random Gaussians and render GT with the reference
rasterizer. Exposes the same __getitem__ contract as ImageDataset
({'image', 'camera', 'index', 'imgname'}).
"""
from __future__ import annotations

import math

import numpy as np

import jax.numpy as jnp

from .base import prepare_camera


def ring_cameras(
    n_views: int,
    H: int,
    W: int,
    radius: float = 4.0,
    focal: float | None = None,
    center=(0.0, 0.0, 0.0),
    elevation: float = 0.35,
):
    """Cameras on a ring looking at `center` (z-up world)."""
    focal = focal or 1.2 * max(H, W)
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float64)
    center = np.asarray(center, np.float64)
    cams = []
    for i in range(n_views):
        theta = 2 * math.pi * i / n_views
        eye = center + radius * np.array(
            [math.cos(theta) * math.cos(elevation),
             math.sin(theta) * math.cos(elevation),
             math.sin(elevation)]
        )
        fwd = center - eye
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd], axis=0)  # world->cam rows
        T = -R @ eye[:, None]
        cams.append(
            {"K": K.copy(), "R": R, "T": T, "W": W, "H": H,
             "center": eye.reshape(3, 1)}
        )
    return cams


def random_gaussians(n: int, rng, extent: float = 1.0, scale_range=(0.03, 0.12)):
    """A random but well-behaved Gaussian scene (activated space)."""
    xyz = rng.uniform(-extent, extent, size=(n, 3)).astype(np.float32)
    colors = rng.uniform(0.1, 0.9, size=(n, 3)).astype(np.float32)
    opacity = rng.uniform(0.5, 0.95, size=(n,)).astype(np.float32)
    scaling = rng.uniform(*scale_range, size=(n, 3)).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return {
        "xyz": xyz, "colors": colors, "opacity": opacity,
        "scaling": scaling, "rotation": q,
    }


class SyntheticDataset:
    """Renders GT images of a known scene through the reference rasterizer."""

    def __init__(
        self,
        n_gaussians: int = 400,
        n_views: int = 12,
        H: int = 60,
        W: int = 80,
        seed: int = 0,
        background=(1.0, 1.0, 1.0),
        znear: float = 0.01,
        zfar: float = 100.0,
    ):
        from ..ops.rasterize_ref import rasterize

        rng = np.random.default_rng(seed)
        self.scene = random_gaussians(n_gaussians, rng)
        self.cameras = ring_cameras(n_views, H, W)
        self.background = np.asarray(background, np.float32)
        self.znear, self.zfar = znear, zfar
        self.read_img = True
        self.partial_indices = None
        self.scales = [1]
        self.images = []
        s = self.scene
        for cam in self.cameras:
            pc = prepare_camera(cam, 1, znear, zfar)
            tan_fovx = math.tan(pc["FoVx"] * 0.5)
            tan_fovy = math.tan(pc["FoVy"] * 0.5)
            out = rasterize(
                xyz=jnp.asarray(s["xyz"]),
                colors=jnp.asarray(s["colors"]),
                opacity=jnp.asarray(s["opacity"]),
                scaling=jnp.asarray(s["scaling"]),
                rotation=jnp.asarray(s["rotation"]),
                means2d_offset=jnp.zeros((n_gaussians, 2), jnp.float32),
                world_view=jnp.asarray(pc["world_view_transform"]),
                full_proj=jnp.asarray(pc["full_proj_transform"]),
                focal_x=pc["image_width"] / (2 * tan_fovx),
                focal_y=pc["image_height"] / (2 * tan_fovy),
                tan_fovx=tan_fovx,
                tan_fovy=tan_fovy,
                background=jnp.asarray(self.background),
                image_height=pc["image_height"],
                image_width=pc["image_width"],
                use_filter=False,
            )
            self.images.append(
                np.asarray(out["render"]).transpose(1, 2, 0).astype(np.float32)
            )

    def set_state(self, **kwargs):
        pass

    def set_partial_indices(self, partial):
        self.partial_indices = partial

    def __len__(self):
        if self.partial_indices is not None:
            return len(self.partial_indices)
        return len(self.cameras)

    def __getitem__(self, index):
        true_index = (
            self.partial_indices[index] if self.partial_indices is not None else index
        )
        camera = prepare_camera(self.cameras[true_index], 1, self.znear, self.zfar)
        return {
            "image": self.images[true_index] if self.read_img else None,
            "camera": camera,
            "index": index,
            "true_index": true_index,
            "imgname": f"synthetic/{true_index:04d}.jpg",
        }

    def noisy_pointcloud(self, rng=None, jitter: float = 0.02):
        """Init point cloud near the GT gaussians (for fit tests)."""
        rng = rng or np.random.default_rng(1)
        xyz = self.scene["xyz"] + rng.normal(0, jitter, self.scene["xyz"].shape)
        return {
            "xyz": xyz.astype(np.float32),
            "colors": self.scene["colors"].copy(),
        }
