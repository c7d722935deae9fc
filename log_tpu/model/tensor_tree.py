"""Level-of-Gaussian tree as flat arrays.

Two halves, split by where they run:

* **Structural ops** (initialize / split / remove) are shape-changing and run
  on the host in numpy at densification cadence — the reference also rebuilds
  on CPU (LoG/model/splitter.py:148). Semantics match
  LoG/model/tensor_tree.py:32-129 exactly (split appends `num_split*max_child`
  children; remove compacts + renumbers via cumsum; only leaves split; roots
  never removed; remove AFTER split).

* **Per-camera cut selection** (`traverse_cut`) runs on device every frame.
  Instead of the reference's frontier-list BFS
  (LoG/model/tensor_tree.py:131-186) — dynamic shapes, hostile to XLA — the
  cut is computed as a per-point predicate over ALL points with a fixed-depth
  `fori_loop` of parent-pointer gathers: a node is kept iff it is reached
  (every proper ancestor descended) and (projected radius < min_pixel OR leaf
  OR its depth == the traversal depth cap). Each level costs one gather over
  the capacity axis — bandwidth-bound, ~zero latency on TPU, and identical
  output to the BFS.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


class TensorTree:
    """Flat-tensor N-ary tree over point indices (host arrays)."""

    KEYS = ("node_index", "index_parent", "local_index", "depth", "root_id")

    def __init__(self, max_child: int = 2, max_level: int = 20,
                 cut_method: str = "flat"):
        self.max_child = max_child
        self.max_level = max_level
        # per-camera cut selection: 'flat' (one-gather predicate using
        # cached parent attrs — see flat_cut) or 'traverse' (per-level
        # parent-pointer loop, the reference-exact BFS equivalent)
        self.cut_method = cut_method
        self.root_index = np.zeros((0,), np.int32)
        self.node_index = np.zeros((0,), np.int32) - 1
        self.index_parent = np.zeros((0,), np.int32) - 1
        # int32 instead of the reference's int8 (tree depth/child slots are
        # tiny anyway and int32 gathers are native on TPU).
        self.local_index = np.zeros((0,), np.int32)
        self.depth = np.zeros((0,), np.int32)
        # row of this point's root ancestor (== own row for roots); root
        # rows never move under remove-compaction (only appended children
        # are ever removed), so these stay valid across densifies
        self.root_id = np.zeros((0,), np.int32)
        self.tree = np.zeros((0, max_child), np.int32) - 1
        self.min_resolution_pixel = 3.0
        self.log_query = False

    @property
    def num_points(self) -> int:
        return self.node_index.shape[0]

    @property
    def num_nodes(self) -> int:
        return self.tree.shape[0]

    @property
    def is_leaf(self) -> np.ndarray:
        return self.node_index == -1

    @property
    def is_root(self) -> np.ndarray:
        return self.index_parent == -1

    def initialize(self, num_points: int, flag: np.ndarray | None = None) -> None:
        """All points become roots (LoG/model/tensor_tree.py:32-43)."""
        root_index = np.arange(num_points, dtype=np.int32)
        if flag is None:
            print(f"[{self.__class__.__name__}] initialize tree: {num_points} points")
        else:
            print(
                f"[{self.__class__.__name__}] initialize tree: "
                f"{int(flag.sum())}/{num_points} points"
            )
            root_index = root_index[flag]
        self.root_index = root_index
        self.node_index = np.full((num_points,), -1, np.int32)
        self.index_parent = np.full((num_points,), -1, np.int32)
        self.local_index = np.full((num_points,), -1, np.int32)
        self.depth = np.zeros((num_points,), np.int32)
        self.root_id = np.arange(num_points, dtype=np.int32)
        self.tree = np.zeros((0, self.max_child), np.int32) - 1

    def __repr__(self):
        num_parents = int((self.node_index > -1).sum())
        num_leaves = int((self.node_index == -1).sum())
        return (
            f"Tree: {self.num_points} points:{num_parents} parents, "
            f"{num_leaves} leaves, {self.num_nodes} nodes"
        )

    def print_level(self):
        depth_max = int(self.depth.max()) if self.num_points else 0
        print(f"[{self.__class__.__name__}] tree level: {depth_max + 1}")
        for i in range(depth_max + 1):
            print("  " * (i + 1), f"level {i}: {int((self.depth == i).sum())}")

    # ------------------------------------------------------- structural ops
    def split(self, parent_index: np.ndarray) -> None:
        """Append max_child children per parent (LoG/model/tensor_tree.py:65-90)."""
        parent_index = np.asarray(parent_index, np.int64)
        num_split = len(parent_index)
        self.node_index[parent_index] = (
            np.arange(num_split, dtype=np.int32) + self.num_nodes
        )
        child_index = (
            np.arange(num_split * self.max_child, dtype=np.int32) + self.num_points
        ).reshape(num_split, self.max_child)
        self.tree = np.concatenate([self.tree, child_index], axis=0)
        num_new = num_split * self.max_child
        index_parent = np.repeat(parent_index.astype(np.int32), self.max_child)
        depth = np.repeat(self.depth[parent_index], self.max_child) + 1
        local_index = np.tile(
            np.arange(self.max_child, dtype=np.int32), num_split
        )
        self.node_index = np.concatenate(
            [self.node_index, np.full((num_new,), -1, np.int32)]
        )
        self.index_parent = np.concatenate([self.index_parent, index_parent])
        self.depth = np.concatenate([self.depth, depth])
        self.local_index = np.concatenate([self.local_index, local_index])
        self.root_id = np.concatenate(
            [self.root_id,
             np.repeat(self.root_id[parent_index], self.max_child)]
        )

    def remove(self, index: np.ndarray) -> None:
        """Remove leaf points + compact/renumber (LoG/model/tensor_tree.py:92-118)."""
        index = np.asarray(index, np.int64)
        parent_index = self.index_parent[index].astype(np.int64)
        local_index = self.local_index[index].astype(np.int64)
        node_index = self.node_index[parent_index].astype(np.int64)
        children_index = self.tree[node_index, local_index].astype(np.int64)
        self.tree[node_index, local_index] = -1
        flag_keep = np.ones((self.num_points,), bool)
        flag_keep[children_index] = False
        for key in self.KEYS:
            setattr(self, key, getattr(self, key)[flag_keep])
        left_index = np.cumsum(flag_keep) - 1
        flag_node_keep = self.tree > -1
        self.tree[flag_node_keep] = left_index[
            self.tree[flag_node_keep].astype(np.int64)
        ].astype(np.int32)
        flag_nonroot = self.index_parent > -1
        self.index_parent[flag_nonroot] = left_index[
            self.index_parent[flag_nonroot].astype(np.int64)
        ].astype(np.int32)
        # root rows never shift (removed rows are always appended children),
        # but renumber defensively the same way as index_parent
        self.root_id = left_index[self.root_id.astype(np.int64)].astype(
            np.int32
        )
        # parents whose children are all gone become leaves again
        flag_parent = self.node_index != -1
        emptied = (self.tree[self.node_index[flag_parent].astype(np.int64)] < 0).all(
            axis=-1
        )
        tmp = flag_parent.copy()
        tmp[flag_parent] = emptied
        self.node_index[tmp] = -1

    def split_and_remove(self, flag_split, flag_remove):
        """Guarded combo (LoG/model/tensor_tree.py:120-129): only leaves split,
        roots never removed, remove AFTER split. Returns the effective flags
        (sized as before the split appended children)."""
        flag_remove = flag_remove & self.is_leaf & (~self.is_root)
        flag_split = flag_split & self.is_leaf & (self.depth < self.max_level)
        index_split = np.where(flag_split)[0]
        index_remove = np.where(flag_remove)[0]
        print(
            f" -> [{self.__class__.__name__}] split: {index_split.shape[0]} "
            f"remove: {index_remove.shape[0]}"
        )
        self.split(index_split)
        self.remove(index_remove)
        return flag_split, flag_remove

    def ensure_root_id(self) -> None:
        """Reconstruct root_id by walking parents (checkpoints from the
        reference or from before the flat cut lack it)."""
        n = self.num_points
        if getattr(self, "root_id", None) is not None and \
                self.root_id.shape[0] == n:
            return
        rid = np.arange(n, dtype=np.int32)
        depth_max = int(self.depth.max()) if n else 0
        for d in range(1, depth_max + 1):
            m = self.depth == d
            rid[m] = rid[self.index_parent[m].astype(np.int64)]
        self.root_id = rid

    # ---------------------------------------------------------- device cut
    def device_arrays(self, capacity: int) -> dict:
        """Padded device copies of the per-point tree arrays for traverse."""
        def pad(a, fill):
            out = np.full((capacity,), fill, a.dtype)
            out[: a.shape[0]] = a
            return jnp.asarray(out)

        return {
            "node_index": pad(self.node_index, -1),
            "index_parent": pad(self.index_parent, -1),
            "depth": pad(self.depth, 0),
        }


@partial(jax.jit, static_argnames=("num_levels",))
def traverse_cut(
    node_index: jax.Array,
    index_parent: jax.Array,
    depth: jax.Array,
    radius2d: jax.Array,
    root_visible: jax.Array,
    alive_mask: jax.Array,
    min_resolution_pixel,
    max_depth,
    num_levels: int,
):
    """Per-point LoD cut predicate. See module docstring.

    Args (all capacity-padded):
      node_index/index_parent/depth: tree arrays
      radius2d: projected pixel radius for every point (0 => culled)
      root_visible: per-point flag; only consulted for roots
      max_depth: traced traversal depth cap (model.current_depth)
      num_levels: static loop bound >= actual tree depth + 1
    Returns bool (capacity,) 'keep' flag — the render cut.
    """
    is_root = index_parent == -1
    is_leaf = node_index == -1
    small = radius2d < min_resolution_pixel
    parent_safe = jnp.maximum(index_parent, 0)

    def body(d, carry):
        keep, desc = carry
        at_d = (depth == d) & alive_mask
        reached = jnp.where(is_root, root_visible, desc[parent_safe]) & at_d
        k = reached & (small | is_leaf | (d >= max_depth))
        keep = keep | k
        desc = desc | (reached & ~small & ~is_leaf & (d < max_depth))
        return keep, desc

    keep, _ = jax.lax.fori_loop(
        0,
        num_levels,
        body,
        (jnp.zeros_like(is_root), jnp.zeros_like(is_root)),
    )
    return keep


@jax.jit
def flat_cut(
    index_parent: jax.Array,
    node_index: jax.Array,
    depth: jax.Array,
    root_id: jax.Array,
    radius2d: jax.Array,
    radius2d_parent: jax.Array,
    root_visible: jax.Array,
    alive_mask: jax.Array,
    min_resolution_pixel,
    max_depth,
):
    """One-gather LoD cut (the traverse's per-level parent gathers cost
    ~28 ms/level at multi-M points; this is the per-frame hot path).

    Exactly equivalent to `traverse_cut` whenever projected radius is
    monotone non-increasing parent->child: "all proper ancestors descended"
    then collapses to "immediate parent's radius >= min_pixel AND own depth
    <= depth cap" because the parent is the smallest ancestor. Monotonicity
    can break only for near-threshold points whose child projects slightly
    larger than its parent (depth offset of the split); the failure mode is
    bounded overdraw (an ancestor and a descendant both kept), never a hole.

    radius2d_parent comes from a per-point PARENT ATTRIBUTE CACHE (parents
    are never optimized between densifies — the reference freezes them too,
    fix_parent; LoG/model/level_of_gaussian.py:244-256), so the only gather
    left is root_visible[root_id].
    """
    is_root = index_parent == -1
    is_leaf = node_index == -1
    small = radius2d < min_resolution_pixel
    parent_big = radius2d_parent >= min_resolution_pixel
    root_vis = root_visible[jnp.maximum(root_id, 0)]
    reach = root_vis & jnp.where(
        is_root, True, parent_big & (depth <= max_depth)
    )
    return alive_mask & reach & (small | is_leaf | (depth >= max_depth))


@jax.jit
def flat_cut_pre(
    index_parent: jax.Array,
    node_index: jax.Array,
    depth: jax.Array,
    root_in_frustum: jax.Array,
    radius2d: jax.Array,
    radius2d_parent: jax.Array,
    alive_mask: jax.Array,
    min_resolution_pixel,
    max_depth,
):
    """Gather-free pre-cut: `flat_cut` WITHOUT the weight cull.

    The root_visible[root_id] gather costs ~38 ms at 4.2M points (XLA TPU
    serializes gathers). Split the cut instead: the FRUSTUM part of root
    visibility is elementwise via a per-point cached root center
    (`root_xyz`, refreshed at densify cadence like the parent-attribute
    cache), yielding this SUPERSET cut; the weight cull (per-frame check
    render, per ROOT) is applied after slice compaction as a k-sized
    gather `weight_ok[root_id_slice]` (~7 ms at 786k) — see
    fused_prepare_render(cut_method='flat_slice'). Net: the cull moves
    off the capacity axis onto the slice axis.

    root_in_frustum: (cap,) bool — frustum flag of each point's ROOT
    center (roots read their own flag).
    """
    is_root = index_parent == -1
    is_leaf = node_index == -1
    small = radius2d < min_resolution_pixel
    parent_big = radius2d_parent >= min_resolution_pixel
    reach = root_in_frustum & jnp.where(
        is_root, True, parent_big & (depth <= max_depth)
    )
    return alive_mask & reach & (small | is_leaf | (depth >= max_depth))
