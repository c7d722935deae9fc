"""Gaussian point state: capacity-padded device arrays + host orchestration.

XLA compiles one executable per array shape, so the point axis is padded to a
quantized capacity (powers of two with one midpoint per octave) and carries an
``num_points`` alive count; jitted code masks with ``arange(C) < n``. Shape
changes (densify/prune) rebuild exact-size arrays on the host and re-pad —
mirroring the reference, which also rebuilds on CPU (LoG/model/splitter.py:148).

Behavioral contract: LoG/model/level_of_gaussian.py:16-172 (Gaussian /
GaussianPoint): point-cloud init with knn scales clamped to [mean/4, mean*4],
logit opacity, log scaling, identity rotations, optional synthetic ground grid,
SH feature bank, active/max SH degree schedule.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..utils.file import create_from_point
from .activation import Activation

PARAM_KEYS = ("xyz", "colors", "scaling", "opacity", "rotation", "shs")


def next_capacity(n: int, minimum: int = 256) -> int:
    """Smallest c in {2^k, 1.5*2^k} with c >= max(n, minimum)."""
    n = max(int(n), minimum)
    c = minimum
    while c < n:
        if c + c // 2 >= n:
            return c + c // 2
        c *= 2
    return c


def pad_rows(arr: np.ndarray, capacity: int, fill=0.0) -> np.ndarray:
    n = arr.shape[0]
    if n == capacity:
        return arr
    assert n < capacity, (n, capacity)
    out = np.full((capacity,) + arr.shape[1:], fill, dtype=arr.dtype)
    out[:n] = arr
    return out


class GaussianPoint:
    """Point-attribute store (param space)."""

    def __init__(
        self,
        init_ply=None,
        sh_degree: int = 1,
        xyz_scale: float = 1.0,
        scaling_activation: str = "exp",
    ) -> None:
        self.xyz_scale = xyz_scale
        self.max_sh_degree = sh_degree
        self.active_sh_degree = 0
        self.activation = Activation(scaling_activation)
        self.keys: list[str] = []
        self._data: dict[str, jnp.ndarray] = {}
        self.num_points = 0
        self.capacity = 0
        self.visibility_flag = None
        if init_ply is not None:
            xyz, colors, scales = create_from_point(**init_ply)
            self.register_by_pointcloud(xyz, colors, scales, **init_ply)

    # ------------------------------------------------------------ storage
    def __getattr__(self, key):
        data = self.__dict__.get("_data", {})
        if key in data:
            return data[key]
        raise AttributeError(key)

    def get(self, key):
        return self._data[key]

    def set(self, key, value):
        self._data[key] = value

    def items(self):
        for key in self.keys:
            yield key, self._data[key]

    @property
    def alive_mask(self) -> jnp.ndarray:
        return jnp.arange(self.capacity) < self.num_points

    def params(self) -> dict:
        """Capacity-padded param dict (the pytree handed to jitted code)."""
        return {k: self._data[k] for k in self.keys}

    def set_numpy(self, arrays: dict[str, np.ndarray]) -> None:
        """Replace state from exact-size host arrays; re-pads to capacity."""
        n = arrays[self.keys[0]].shape[0]
        self.num_points = int(n)
        self.capacity = next_capacity(n)
        for key, val in arrays.items():
            self._data[key] = jnp.asarray(pad_rows(np.asarray(val), self.capacity))

    def to_numpy(self, keys=None) -> dict[str, np.ndarray]:
        """Exact-size host copies of the param arrays."""
        keys = keys or self.keys
        return {k: np.asarray(self._data[k])[: self.num_points] for k in keys}

    def set_device(self, arrays: dict, num_points: int, capacity: int) -> None:
        """Replace state with capacity-padded DEVICE arrays (device-resident
        densification — no host round trip)."""
        self.num_points = int(num_points)
        self.capacity = int(capacity)
        for key, val in arrays.items():
            assert val.shape[0] == capacity, (key, val.shape, capacity)
            self._data[key] = val

    # ------------------------------------------------------------- init
    @staticmethod
    def init_rotation(num_points: int) -> np.ndarray:
        rot = np.zeros((num_points, 4), dtype=np.float32)
        rot[:, 0] = 1.0
        return rot

    @staticmethod
    def create_from_ground(
        local_min, local_max, init_step, height, init_opacity=0.9, padding=0.05
    ):
        """Synthetic ground-plane grid (LoG/model/level_of_gaussian.py:109-120)."""
        x = np.arange(local_min[0] - padding, local_max[0] + padding, init_step)
        y = np.arange(local_min[1] - padding, local_max[1] + padding, init_step)
        gx, gy = np.meshgrid(x, y, indexing="ij")
        xy = np.stack([gx, gy], axis=-1).reshape(-1, 2)
        xyz = np.concatenate(
            [xy, np.full((xy.shape[0], 1), height, np.float32)], axis=1
        ).astype(np.float32)
        colors = np.full_like(xyz, 0.5)
        scaling = np.full_like(xyz, init_step)
        scaling[:, 2] = init_step * 0.1
        opacity = np.full((xyz.shape[0], 1), init_opacity, np.float32)
        return xyz, colors, scaling, opacity

    def log_radius(self, scales) -> str:
        s = np.asarray(scales)
        return f"scales: [{s.min():.4f}~{s.mean():.4f}~{s.max():.4f}]"

    def register_by_pointcloud(
        self, xyz, colors, scales, init_opacity=0.1, **init_ply
    ) -> None:
        """LoG/model/level_of_gaussian.py:122-159. Pure numpy — host init
        must not dispatch eager device ops."""
        print(f"[{self.__class__.__name__}] {self.log_radius(scales)}")
        scales = np.clip(scales, scales.mean() / 4, scales.mean() * 4)
        print(f"[{self.__class__.__name__}] -> {self.log_radius(scales)}")

        def np_logit(x):
            return np.log(x / (1.0 - x))

        scaling = np.log(scales)[:, None].repeat(3, axis=1)
        colors = (np.asarray(colors) - 0.5) / 0.28209479177387814
        xyz = np.asarray(xyz, np.float32)
        opacity = np_logit(np.full((xyz.shape[0], 1), init_opacity, np.float32))
        rotation = self.init_rotation(xyz.shape[0])
        if self.max_sh_degree > 0:
            n_coef = (self.max_sh_degree + 1) ** 2 - 1
            shs = np.zeros((xyz.shape[0], n_coef, 3), np.float32)
        if "height" in init_ply:
            local_min, local_max = xyz.min(axis=0), xyz.max(axis=0)
            g_xyz, g_col, g_scal, g_op = self.create_from_ground(
                local_min,
                local_max,
                init_ply["init_step"],
                init_ply["height"],
                init_ply.get("ground_opacity", 0.9),
            )
            print(f"[{self.__class__.__name__}] add {g_xyz.shape[0]} ground points")
            xyz = np.concatenate([xyz, g_xyz])
            opacity = np.concatenate([opacity, np_logit(g_op)])
            colors = np.concatenate(
                [colors, (g_col - 0.5) / 0.28209479177387814]
            )
            scaling = np.concatenate([scaling, np.log(g_scal)])
            rotation = np.concatenate([rotation, self.init_rotation(g_xyz.shape[0])])
            if self.max_sh_degree > 0:
                shs = np.concatenate(
                    [shs, np.zeros((g_xyz.shape[0],) + shs.shape[1:], np.float32)]
                )
        arrays = {
            "scaling": scaling.astype(np.float32),
            "colors": colors.astype(np.float32),
            "xyz": xyz.astype(np.float32),
            "opacity": opacity.astype(np.float32),
            "rotation": rotation.astype(np.float32),
        }
        self.keys = ["scaling", "colors", "xyz", "opacity", "rotation"]
        if self.max_sh_degree > 0:
            arrays["shs"] = shs.astype(np.float32)
            self.keys.append("shs")
        self.set_numpy(arrays)

    # ----------------------------------------------------------- schedule
    def oneupSHdegree(self) -> None:
        if self.active_sh_degree < self.max_sh_degree:
            self.active_sh_degree += 1
            print(
                f"[{self.__class__.__name__}] one up SH degree to "
                f"{self.active_sh_degree}"
            )
