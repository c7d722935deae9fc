"""Densification statistics (Counter) — device scatter ops + host container.

Contract: LoG/model/counter.py:4-68. The CUDA path derived `point_id /
point_count` from `torch.unique(point_id_pixel)`; here the per-pixel argmax-id
map from the rasterizer is reduced with a single bincount-style scatter-add
(`jnp .at[].add` with out-of-range drop), and all per-point stats update via
scatter-add / scatter-max at the visible indices — no host sync.
"""
from __future__ import annotations

import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

COUNTER_KEYS = (
    "weights_max",
    "weights_sum",
    "grad_sum",
    "radii_max",
    "visible_count",
    "radii_max_max",
    "area_sum",
    "radius3d_min",
    "radius3d_max",
    "create_steps",
)
# keys cleared by Counter.reset (radius3d_min/max and create_steps persist;
# LoG/model/counter.py:27-31)
RESET_KEYS = (
    "weights_max",
    "weights_sum",
    "radii_max",
    "radii_max_max",
    "area_sum",
    "grad_sum",
    "visible_count",
)


def init_counter(num_points: int) -> dict[str, np.ndarray]:
    z = np.zeros((num_points,), np.float32)
    zi = np.zeros((num_points,), np.int32)
    return {
        "weights_max": z.copy(),
        "weights_sum": z.copy(),
        "grad_sum": z.copy(),
        "radii_max": zi.copy(),
        "visible_count": zi.copy(),
        "radii_max_max": zi.copy(),
        "area_sum": zi.copy(),
        "radius3d_min": z.copy() + 1,
        "radius3d_max": z.copy() + 1,
        "create_steps": zi.copy(),
    }


def str_min_mean_max(name, data) -> str:
    data = np.asarray(data, np.float64)
    if data.size == 0:
        return f"{name:10s} 0 [empty]"
    return (
        f"{name:10s} {data.shape[0]:8d} [{data.min():.5f}~{data.mean():.5f}"
        f"+{data.std():.5f}~{data.max():.5f}]"
    )


@partial(jax.jit, static_argnames=("identity",))
def update_counter(
    counter: dict,
    visible_index: jax.Array,
    radii: jax.Array,
    point_weight: jax.Array,
    point_id_pixel: jax.Array,
    grad_means2d: jax.Array,
    identity: bool = False,
):
    """One training-view statistics update (LoG/model/counter.py:36-68).

    visible_index: (K,) global point ids of the render slice, padded with an
      out-of-range sentinel (scatters at padding are dropped).
    radii / point_weight: (K,) per-slice rasterizer outputs.
    point_id_pixel: (H, W) argmax contributor slice-id per pixel (-1 empty).
    grad_means2d: (K, 2) NDC screen-space gradient of the slice.
    identity: caller guarantees visible_index == arange(capacity) (the
      train step's identity fast path) — every per-K scatter then becomes
      a masked elementwise update; only the pixel-ownership histogram
      remains a scatter.
    Returns the updated counter dict.
    """
    K = radii.shape[0]
    capacity = counter["weights_max"].shape[0]
    sentinel = capacity  # out of range -> dropped by scatter

    pid = point_id_pixel.ravel()
    pid = jnp.where(pid >= 0, pid, K)  # -1 would wrap; push out of range
    # per-slice pixel ownership count (the reference's torch.unique counts)
    # the ownership histogram is the train step's residual scatter
    # (~24 ms at 1080p in-step). Measured alternatives (round 5, on-chip,
    # in-step): f32 scatter-add 80.4 vs i32 80.9 ms/step (noise), sort-
    # then-scatter 83.5 — the clustered real pid map already hits the
    # fast scatter path (a RANDOM pid map is 130x slower isolated), so
    # the plain form stays.
    point_count = (
        jnp.zeros((K,), jnp.int32).at[pid].add(1, mode="drop")
    )

    flag_vis = radii > 0
    idx_vis = jnp.where(flag_vis, visible_index, sentinel)
    grad_norm = jnp.sqrt(jnp.sum(grad_means2d[:, :2] ** 2, axis=-1))

    new = dict(counter)
    # area_sum[vis[id]] += count ; grad_sum[vis[id]] += |grad| * count ;
    # radii_max_max[vis[id]] = max(old, count)   — ownership-weighted stats
    has_area = point_count > 0
    if identity:
        ga = grad_norm * point_count.astype(grad_norm.dtype)
        new["area_sum"] = counter["area_sum"] + jnp.where(
            has_area, point_count, 0
        )
        new["grad_sum"] = counter["grad_sum"] + jnp.where(has_area, ga, 0.0)
        new["radii_max_max"] = jnp.where(
            has_area,
            jnp.maximum(counter["radii_max_max"], point_count),
            counter["radii_max_max"],
        )
        new["create_steps"] = counter["create_steps"] + flag_vis.astype(
            jnp.int32
        )
        new["visible_count"] = counter["visible_count"] + flag_vis.astype(
            jnp.int32
        )
        new["weights_max"] = jnp.where(
            flag_vis,
            jnp.maximum(counter["weights_max"], point_weight),
            counter["weights_max"],
        )
        new["weights_sum"] = counter["weights_sum"] + jnp.where(
            flag_vis, point_weight, 0.0
        )
        new["radii_max"] = jnp.where(
            flag_vis,
            jnp.maximum(counter["radii_max"], radii.astype(jnp.int32)),
            counter["radii_max"],
        )
        return new
    idx_area = jnp.where(has_area, visible_index, sentinel)
    new["area_sum"] = counter["area_sum"].at[idx_area].add(
        point_count, mode="drop"
    )
    new["grad_sum"] = counter["grad_sum"].at[idx_area].add(
        grad_norm * point_count.astype(grad_norm.dtype), mode="drop"
    )
    new["radii_max_max"] = counter["radii_max_max"].at[idx_area].max(
        point_count, mode="drop"
    )
    # visibility-gated stats
    new["create_steps"] = counter["create_steps"].at[idx_vis].add(1, mode="drop")
    new["visible_count"] = counter["visible_count"].at[idx_vis].add(1, mode="drop")
    new["weights_max"] = counter["weights_max"].at[idx_vis].max(
        point_weight, mode="drop"
    )
    new["weights_sum"] = counter["weights_sum"].at[idx_vis].add(
        point_weight, mode="drop"
    )
    new["radii_max"] = counter["radii_max"].at[idx_vis].max(
        radii.astype(jnp.int32), mode="drop"
    )
    return new


class Counter:
    """Host container mirroring the reference Counter module."""

    def __init__(self, num_points: int):
        self.data = {k: jnp.asarray(v) for k, v in init_counter(num_points).items()}

    def __getattr__(self, key):
        data = self.__dict__.get("data", {})
        if key in data:
            return data[key]
        raise AttributeError(key)

    def get_gradmean(self):
        return np.asarray(self.data["grad_sum"]) / np.maximum(
            np.asarray(self.data["area_sum"]), 1
        )

    str_min_mean_max = staticmethod(str_min_mean_max)

    def reset(self, num_points: int, capacity: int | None = None) -> None:
        print(f"[{self.__class__.__name__}] reset counter -> {num_points}")
        capacity = capacity or num_points
        fresh = init_counter(capacity)
        for key in RESET_KEYS:
            self.data[key] = jnp.asarray(fresh[key])
        # persistent keys must track capacity too (preserve existing prefix)
        for key in ("radius3d_min", "radius3d_max", "create_steps"):
            old = np.asarray(self.data[key])
            if old.shape[0] != capacity:
                new = fresh[key]
                n = min(old.shape[0], capacity)
                new[:n] = old[:n]
                self.data[key] = jnp.asarray(new)

    def reset_create_steps(self) -> None:
        self.data["create_steps"] = jnp.zeros_like(self.data["create_steps"])

    def set_numpy(self, arrays: dict, capacity: int) -> None:
        """Load (reference checkpoints store int8/int16 counters —
        LoG/model/counter.py:8-15 — canonicalize to our dtypes)."""
        from .gaussian import pad_rows

        canon = {k: v.dtype for k, v in init_counter(1).items()}
        for key, val in arrays.items():
            if key not in canon:
                continue
            fill = 1.0 if key in ("radius3d_min", "radius3d_max") else 0
            arr = np.asarray(val).astype(canon[key])
            self.data[key] = jnp.asarray(pad_rows(arr, capacity, fill=fill))

    def to_numpy(self, num_points: int) -> dict:
        return {k: np.asarray(v)[:num_points] for k, v in self.data.items()}
