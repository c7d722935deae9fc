"""Vanilla (no-tree) Gaussian model for demos / GUI / point-cloud checks.

Contract: LoG/model/base_gaussian.py:9-196 — simple parameter container with
frustum-based visibility, point-cloud init, SH colors, shape-tolerant load.
Doubles as the plain-3DGS model family (BASELINE.json config 2: vanilla 3DGS
path without LoD tree).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .gaussian import GaussianPoint


class BaseGaussian(GaussianPoint):
    """GaussianPoint + standalone visibility preparation (VisibleChecker)."""

    def __init__(self, init_ply=None, sh_degree=1, xyz_scale=1.0, **kwargs):
        super().__init__(
            init_ply=init_ply, sh_degree=sh_degree, xyz_scale=xyz_scale
        )
        self.current_depth = 0
        self.base_iter = 1
        self.training = False
        self.view_correction = None

    # minimal LoG-compatible surface so renderers/trainer can drive it
    class _Tree:
        num_nodes = 0
        num_points = 0
        min_resolution_pixel = 3.0
        log_query = False

    tree = _Tree()

    @property
    def gaussian(self):
        """The renderer/trainer address `model.gaussian`; here it is self."""
        return self

    def train(self):
        self.training = True

    def eval(self):
        self.training = False

    def clear(self):
        self.visibility_flag = None

    def set_state(self, enable_sh=None, active_sh_degree=None, **kwargs):
        if enable_sh:
            self.active_sh_degree = self.max_sh_degree
        elif active_sh_degree is not None:
            self.active_sh_degree = min(int(active_sh_degree), self.max_sh_degree)

    def prepare_from_camera(self, camera: dict):
        """Frustum-only visibility (LoG/model/base_gaussian.py VisibleChecker
        / level_of_gaussian.py:90-98)."""
        from ..ops import gaussian_math as gm
        from ..render.renderer import camera_device

        cam = camera_device(camera)
        xyz = self.get("xyz")
        p_ndc, _ = gm.project_ndc(xyz, cam["full_proj"])
        alive = jnp.arange(self.capacity) < self.num_points
        keep = gm.frustum_flag(p_ndc, padding=0.5) & alive
        self.visibility_flag = {"keep_mask": keep}
        return self.visibility_flag

    prepare = prepare_from_camera

    @classmethod
    def create_from_record(cls, record: dict, sh_degree=1):
        """Build from a dict of activated attributes
        (LoG/model/base_gaussian.py:95-103)."""
        model = cls(sh_degree=sh_degree)
        n = record["xyz"].shape[0]
        arrays = {
            "xyz": np.asarray(record["xyz"], np.float32),
            "colors": (np.asarray(record["colors"], np.float32) - 0.5)
            / 0.28209479177387814,
            "scaling": np.log(np.asarray(record["scaling"], np.float32)),
            "opacity": np.log(
                np.asarray(record["opacity"], np.float32).reshape(n, 1)
                / (1 - np.asarray(record["opacity"], np.float32).reshape(n, 1))
            ),
            "rotation": np.asarray(
                record.get("rotation", cls.init_rotation(n)), np.float32
            ),
        }
        model.keys = ["scaling", "colors", "xyz", "opacity", "rotation"]
        if sh_degree > 0:
            n_coef = (sh_degree + 1) ** 2 - 1
            arrays["shs"] = np.asarray(
                record.get("shs", np.zeros((n, n_coef, 3))), np.float32
            )
            model.keys.append("shs")
        model.set_numpy(arrays)
        return model

    def load_state_dict(self, state_dict, strict=True, split="demo"):
        arrays = {}
        for key, val in state_dict.items():
            name = key.split(".", 1)[1] if "." in key else key
            arrays[name] = np.asarray(val)
        known = [k for k in ["scaling", "colors", "xyz", "opacity", "rotation",
                             "shs"] if k in arrays]
        self.keys = known
        self.set_numpy({k: arrays[k] for k in known})
        return True
