"""Device-resident densification: split/remove without the host round-trip.

The reference rebuilds every attribute tensor on CPU at densify cadence
(LoG/model/splitter.py:138-205); round 1 mirrored that — at 2.4M points the
device->host->device round trip through the remote-TPU tunnel cost ~110 s.
Here the POLICY (threshold flags) and the REBUILD (capacity-padded
compaction [kept; children] with bisection splits) both run on device; the
host only fetches the effective flag vectors (bool, ~cap bytes) when the
tree's structural arrays need updating, plus a few scalars for logging.

Ordering matches the host Splitter exactly — kept rows in original order
(cumsum compaction), children appended in ascending parent order, each
parent's children contiguous — so the two paths are array-equal given the
same random draws (tested in tests/test_densify_device.py).
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


# ------------------------------------------------------------------ policy
@partial(jax.jit, static_argnames=("mode",))
def init_stage_flags(
    params: dict,
    counter: dict,
    n_alive,
    rand_u,  # (2, cap) uniforms
    scale,
    xyz_scale,
    init_weight_min,
    init_radius_min,
    init_radius_split,
    min_steps,
    split_grad_thres,
    mode: str = "split_by_2d",
):
    """Device mirror of LoG.update_init_stage's flag computation
    (LoG/model/level_of_gaussian.py:400-452). Returns (flag_split,
    flag_remove, reset_create, stats)."""
    cap = params["opacity"].shape[0]
    alive = jnp.arange(cap) < n_alive
    weights_max = counter["weights_max"]
    opacity = jax.nn.sigmoid(params["opacity"][:, 0])
    flag_remove_weight = (weights_max < init_weight_min) & alive
    flag_nonmax = (weights_max < opacity * 0.1) & alive
    radii_max_max = counter["radii_max_max"]
    flag_remove_small = (
        (radii_max_max < (init_radius_min * scale) ** 2)
        & alive
        & (rand_u[0] > 0.5)
    )
    flag_remove = flag_remove_small | flag_remove_weight | flag_nonmax
    radii_max = radii_max_max.astype(jnp.float32)
    flag_activation = (
        (counter["create_steps"] > min_steps) & (radii_max > 0) & alive
    )
    grad = counter["grad_sum"] / jnp.maximum(
        counter["area_sum"].astype(jnp.float32), 1.0
    )
    act = flag_activation.astype(jnp.float32)
    n_act = jnp.maximum(jnp.sum(act), 1.0)
    radii_mean = jnp.sum(radii_max * act) / n_act
    radii_var = jnp.sum((radii_max - radii_mean) ** 2 * act) / n_act
    radii_std = jnp.sqrt(jnp.maximum(radii_var, 0.0))
    has_act = jnp.sum(act) > 0
    radii_mean = jnp.where(has_act, radii_mean, 0.0)
    radii_std = jnp.where(has_act, radii_std, 0.0)
    reset_create = jnp.zeros((cap,), bool)
    if mode == "split_by_2d":
        thres_given = jnp.float32(init_radius_split * scale)
        split_thres = jnp.where(
            thres_given < 0, radii_mean + radii_std * 3, thres_given
        )
        flag_split_grad = (grad > 10 * split_grad_thres) & (
            radii_max > init_radius_min * scale * 8
        )
        flag_split_radii = radii_max > split_thres**2
        flag_split = flag_split_radii | flag_split_grad
        flag_split = flag_activation & flag_split & (~flag_remove)
    elif mode == "split_by_3d":
        radius_max3 = jnp.max(jnp.exp(params["scaling"]), axis=-1)
        flag_split = (radius_max3 > xyz_scale * 0.1) & alive
        flag_remove2d = flag_activation & (radius_max3 < xyz_scale * 0.005)
        flag_rand = rand_u[1] > 0.5
        flag_remove = (flag_remove2d & flag_rand) | flag_remove
        reset_create = flag_remove2d & (~flag_rand)
        flag_split = flag_split & (~flag_remove)
    else:
        raise ValueError(mode)
    # never prune to (near) nothing — keep the 16 top-weight points
    n_kept = jnp.sum((~flag_remove) & alive)
    w_for_top = jnp.where(alive, weights_max, -jnp.inf)
    _, top_idx = jax.lax.top_k(w_for_top, 16)
    guard = jnp.zeros((cap,), bool).at[top_idx].set(True)
    flag_remove = jnp.where(n_kept < 16, flag_remove & ~guard, flag_remove)
    flag_split = flag_split & ~flag_remove & alive
    stats = {
        "n_remove_weight": jnp.sum(flag_remove_weight),
        "n_nonmax": jnp.sum(flag_nonmax),
        "n_remove_small": jnp.sum(flag_remove_small),
        "n_split": jnp.sum(flag_split),
        "n_remove": jnp.sum(flag_remove & alive),
    }
    return flag_split, flag_remove & alive, reset_create, stats


@partial(jax.jit, static_argnames=("sort_method",))
def depth_stage_flags(
    params: dict,
    counter: dict,
    tree_dev: dict,  # node_index / depth (capacity-padded)
    n_alive,
    current_depth,
    min_steps_split,
    split_grad_thres,
    radius2d_thres,
    remove_weights_thres,
    max_split_points,
    sort_method: str = "radii",
):
    """Device mirror of LoG.update_depth_stage's flag computation incl. the
    top-K split cap (LoG/model/level_of_gaussian.py:454-525). Returns
    (flag_split, flag_remove, stats)."""
    cap = params["opacity"].shape[0]
    alive = jnp.arange(cap) < n_alive
    node_index = tree_dev["node_index"]
    depth = tree_dev["depth"]
    flag_is_parent = (node_index == -1) & (depth < current_depth) & alive
    flag_depth_parent = flag_is_parent & (
        counter["create_steps"] > min_steps_split
    )
    depth_minus1_sum = jnp.sum((depth < current_depth) & alive)
    flag_depth_child = (node_index == -1) & (depth > 0) & alive
    grad = counter["grad_sum"] / jnp.maximum(
        counter["area_sum"].astype(jnp.float32), 1.0
    )
    radii_max_max = counter["radii_max_max"].astype(jnp.float32)
    flag_split = (
        (grad > split_grad_thres)
        & (counter["radii_max_max"] > radius2d_thres)
        & flag_depth_parent
    )
    any_child = jnp.sum(flag_depth_child) > 0
    flag_remove = (
        flag_depth_child
        & (counter["weights_max"] < remove_weights_thres)
        & (counter["visible_count"] > 1)
        & any_child
    )
    flag_split = flag_split & (~flag_remove)
    num_max_split = jnp.minimum(
        (depth_minus1_sum.astype(jnp.float32) * 0.05).astype(jnp.int32),
        max_split_points,
    )
    if sort_method == "radii":
        vals = radii_max_max
    elif sort_method == "opacity":
        vals = jax.nn.sigmoid(params["opacity"][:, 0])
    else:
        vals = grad
    n_split = jnp.sum(flag_split)
    # top-K threshold: k-th largest candidate value (matches np.partition)
    cand = jnp.where(flag_split, vals, -jnp.inf)
    cand_sorted = jnp.sort(cand)[::-1]
    k = jnp.clip(num_max_split, 1, cap) - 1
    thres = cand_sorted[k]
    over = (n_split > num_max_split) & (num_max_split > 0)
    flag_split = jnp.where(over, flag_split & (vals >= thres), flag_split)
    stats = {
        "n_split": jnp.sum(flag_split),
        "n_remove": jnp.sum(flag_remove),
        "thres": thres,
        "over": over,
    }
    return flag_split, flag_remove, stats


# ----------------------------------------------------------------- rebuild
def _bisect_once(xyz, scaling, rotation):
    """jnp mirror of splitter._bisect_longest_axis (scaling ACTIVATED)."""
    q = rotation / jnp.linalg.norm(rotation, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    longest = jnp.argmax(scaling, axis=-1)
    off_local = (
        jax.nn.one_hot(longest, 3, dtype=scaling.dtype) * scaling
    )  # (P, 3)
    # world_axis = R @ off_local with R from the quaternion (rows expanded)
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    ox, oy, oz = off_local[..., 0], off_local[..., 1], off_local[..., 2]
    wx = r00 * ox + r01 * oy + r02 * oz
    wy = r10 * ox + r11 * oy + r12 * oz
    wz = r20 * ox + r21 * oy + r22 * oz
    world_axis = jnp.stack([wx, wy, wz], axis=-1)
    centers = jnp.stack(
        [xyz - 0.5 * world_axis, xyz + 0.5 * world_axis], axis=1
    )  # (P, 2, 3)
    new_scaling = scaling * (
        1.0 - 0.5 * jax.nn.one_hot(longest, 3, dtype=scaling.dtype)
    )
    new_scaling = jnp.repeat(new_scaling[:, None], 2, axis=1)
    P = xyz.shape[0]
    return (
        centers.reshape(P * 2, 3),
        new_scaling.reshape(P * 2, 3),
        jnp.repeat(rotation, 2, axis=0),
    )


def split_children_uniform(xyz, scaling_act, rotation, n_child: int):
    """Repeated bisection until 2^k >= n_child (splitter.split_by_uniform)."""
    n = 1
    while n < n_child:
        xyz, scaling_act, rotation = _bisect_once(xyz, scaling_act, rotation)
        n *= 2
    return xyz, scaling_act, n


@partial(
    jax.jit,
    static_argnames=(
        "new_cap", "n_child", "remove_split", "keys", "s_cap",
        "radius3d_max_fill",
    ),
)
def rebuild_split_remove(
    params: dict,
    moments: dict,
    counter: dict,
    flag_split,
    flag_remove,
    n_alive,
    new_cap: int,
    s_cap: int,  # static bucket >= number of split parents
    n_child: int,
    remove_split: bool,
    keys: tuple,
    scaling_decay,
    radius3d_max_fill,  # scalar: init-stage fill (0.2*xyz_scale); <0 => depth
):
    """[kept; children] compaction on device. Returns (params, moments,
    counter, num_keep, num_children).

    Mirrors Splitter.split_and_remove + split_and_remove_moments +
    split_and_remove_other + the counter RESET_KEYS refresh
    (LoG/model/level_of_gaussian.py:644-668, 724-755)."""
    cap = params[keys[0]].shape[0]
    alive = jnp.arange(cap) < n_alive
    flag_split = flag_split & alive
    if remove_split:
        flag_remove_eff = (flag_remove | flag_split) & alive
    else:
        flag_remove_eff = flag_remove & alive
    keep = alive & ~flag_remove_eff
    num_keep = jnp.sum(keep)
    num_split = jnp.sum(flag_split)

    dest_keep = jnp.cumsum(keep.astype(jnp.int32)) - 1
    dest_keep = jnp.where(keep, dest_keep, new_cap)  # drop sentinel

    parents = jnp.nonzero(flag_split, size=s_cap, fill_value=cap)[0]
    prank = jnp.arange(s_cap, dtype=jnp.int32)
    parent_valid = prank < num_split

    # children attrs: copy parent, replace xyz/scaling via bisection
    def gather(key):
        return params[key].at[parents].get(mode="fill", fill_value=0.0)

    p_xyz = gather("xyz")
    p_scaling_act = jnp.exp(gather("scaling"))
    p_rot = jnp.where(
        parent_valid[:, None], gather("rotation"),
        jnp.asarray([1.0, 0.0, 0.0, 0.0]),
    )
    c_xyz, c_scal_act, real_child = split_children_uniform(
        p_xyz, p_scaling_act, p_rot, n_child
    )
    c_scaling = jnp.log(jnp.maximum(c_scal_act, 1e-30))

    child_dest = num_keep + prank * real_child
    child_dest = jnp.where(parent_valid, child_dest, new_cap)
    child_dest_full = (
        child_dest[:, None] + jnp.arange(real_child, dtype=jnp.int32)[None]
    ).reshape(-1)
    child_dest_full = jnp.minimum(child_dest_full, new_cap)

    new_params = {}
    new_m1 = {}
    new_m2 = {}
    for key in keys:
        old = params[key]
        fill = jnp.zeros((new_cap + 1,) + old.shape[1:], old.dtype)
        moved = fill.at[dest_keep].set(old, mode="drop")
        if key == "xyz":
            child_vals = c_xyz
        elif key == "scaling":
            child_vals = c_scaling
        else:
            child_vals = jnp.repeat(
                params[key].at[parents].get(mode="fill", fill_value=0.0),
                real_child, axis=0,
            )
        moved = moved.at[child_dest_full].set(child_vals, mode="drop")
        new_params[key] = moved[:new_cap]
        if key in moments["exp_avg"]:
            zc = jnp.zeros((new_cap + 1,) + old.shape[1:], jnp.float32)
            new_m1[key] = zc.at[dest_keep].set(
                moments["exp_avg"][key], mode="drop"
            )[:new_cap]
            new_m2[key] = zc.at[dest_keep].set(
                moments["exp_avg_sq"][key], mode="drop"
            )[:new_cap]

    # counter: RESET_KEYS fresh; create_steps/radius3d_min/max move
    from .counter import init_counter

    new_counter = {
        k: jnp.asarray(v) for k, v in init_counter(new_cap).items()
    }
    cs = jnp.zeros((new_cap + 1,), jnp.int32).at[dest_keep].set(
        counter["create_steps"], mode="drop"
    )
    new_counter["create_steps"] = cs[:new_cap]
    r3min = jnp.ones((new_cap + 1,), jnp.float32).at[dest_keep].set(
        counter["radius3d_min"], mode="drop"
    )
    # children inherit the parent's radius3d_min (splitter.py:217-219)
    r3min = r3min.at[child_dest_full].set(
        jnp.repeat(
            counter["radius3d_min"].at[parents].get(
                mode="fill", fill_value=1.0
            ),
            real_child,
        ),
        mode="drop",
    )
    new_counter["radius3d_min"] = r3min[:new_cap]
    if radius3d_max_fill >= 0:
        # init stage: radius3d_max = 0.2 * xyz_scale everywhere
        new_counter["radius3d_max"] = jnp.full(
            (new_cap,), radius3d_max_fill, jnp.float32
        )
    else:
        r3max = jnp.ones((new_cap + 1,), jnp.float32).at[dest_keep].set(
            counter["radius3d_max"], mode="drop"
        )
        # depth stage: children get scaling_decay * parent 3D radius
        p_rad3 = jnp.max(p_scaling_act, axis=-1)
        r3max = r3max.at[child_dest_full].set(
            jnp.repeat(scaling_decay * p_rad3, real_child), mode="drop"
        )
        new_counter["radius3d_max"] = r3max[:new_cap]

    return (
        new_params,
        {"exp_avg": new_m1, "exp_avg_sq": new_m2},
        new_counter,
        num_keep,
        num_split * real_child,
    )
