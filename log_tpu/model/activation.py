"""Parameter-space <-> physical-space activations (LoG/model/activation.py).

Pure functions over jnp arrays; `Activation` mirrors the reference's
configurable container (scaling exp/sigmoid/tanh; opacity sigmoid; rotation
L2-normalize; colors SH-DC + optional view-dependent SH).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.sh import eval_sh, rgb_to_sh, sh_to_rgb


def logit(x):
    return jnp.log(x / (1.0 - x))


def normalize(x, axis=-1, eps=1e-12):
    n = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(n, eps)


class Activation:
    """Behavioral match of LoG/model/activation.py:4-43."""

    def __init__(self, scaling_activation: str = "exp"):
        if scaling_activation == "exp":
            self.scaling_activation = jnp.exp
            self.scaling_inverse_activation = jnp.log
            self.np_scaling_activation = np.exp
            self.np_scaling_inverse_activation = np.log
        elif scaling_activation == "sigmoid":
            self.scaling_activation = jnp.asarray  # placeholder, replaced below
            self.scaling_activation = lambda x: 1.0 / (1.0 + jnp.exp(-x))
            self.scaling_inverse_activation = logit
        elif scaling_activation == "tanh":
            self.scaling_activation = jnp.tanh
            self.scaling_inverse_activation = jnp.arctanh
        else:
            raise ValueError(scaling_activation)
        self.opacity_activation = lambda x: 1.0 / (1.0 + jnp.exp(-x))
        self.opacity_inverse_activation = logit
        self.rotation_activation = normalize
        self.rgb_inverse = rgb_to_sh

    @staticmethod
    def init_rotation(num_points):
        rot = np.zeros((num_points, 4), dtype=np.float32)
        rot[:, 0] = 1.0
        return rot

    def colors_activation(self, params, camera_center, active_sh_degree: int):
        colors = sh_to_rgb(params["colors"])
        if active_sh_degree > 0 and camera_center is not None and "shs" in params:
            xyz = params["xyz"]
            dirs = xyz - camera_center[None]
            dirs = normalize(dirs)
            colors = colors + eval_sh(dirs, params["shs"], degree=active_sh_degree)
        return colors

    def activate(self, params, camera_center, active_sh_degree: int):
        """Param-space dict -> physical dict (activate_root_return)."""
        return {
            "xyz": params["xyz"],
            "scaling": self.scaling_activation(params["scaling"]),
            "opacity": self.opacity_activation(params["opacity"]),
            "rotation": self.rotation_activation(params["rotation"]),
            "colors": self.colors_activation(params, camera_center, active_sh_degree),
        }
