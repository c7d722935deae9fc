"""Compute ops: rasterization backends + math kernels.

`pick_backend`/`pick_max_pairs` centralize the runtime choice between the
pure-jnp reference rasterizer (oracle; fine for small scenes and CPU tests)
and the tiled Pallas production path.
"""
from __future__ import annotations

import os


def pick_backend(num_points: int | None = None) -> str:
    env = os.environ.get("LOG_TPU_BACKEND")
    if env:
        return env
    import jax

    if jax.default_backend() == "tpu":
        return "tiled"
    # CPU: the Pallas path runs in interpret mode (slow) — use the oracle
    # unless the scene is big enough that O(P*HW) is worse.
    if num_points is not None and num_points > 16384:
        return "tiled"
    return "reference"


def pick_max_pairs(k_visible: int, per_point: int = 8) -> int:
    """Static pair capacity for a visible-set bucket (~per_point
    tiles/gaussian headroom, floor 64k, cap 8M). Quantized in 1.5x steps —
    the binning sorts scale with this budget, so a pow2-only ladder wastes
    up to 33% sort time. The cap is a safety rail for worst-case sizing
    heuristics (k_visible*6), NOT a truncation license: callers that know
    the frame's measured demand (counts[2] of the fused frame) size from it
    with per_point=1 and must keep demand <= budget (bench.py re-bumps)."""
    cap = 1 << 16
    need = k_visible * per_point
    while cap < need and cap < (1 << 23):
        nxt = cap + cap // 2
        cap = nxt if nxt >= need else cap * 2
    return min(cap, 1 << 23)
