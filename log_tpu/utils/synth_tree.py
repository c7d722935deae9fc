"""On-device synthetic urban-style LoD-tree scene generator.

Benchmarks and dryruns need multi-M-point tree checkpoints without shipping
hundreds of MB through the axon tunnel (host->device upload can degrade to
~100 KB/s), so everything here is generated ON DEVICE inside one jit from a
PRNG key. The tree structure is strided-deterministic (every 2nd root
splits into 4; 3 of every 10 depth-1 children split again) so all shapes
are static; positions/scales/colors are jax.random draws, matching the
statistics of the host-side generator this replaces.

Scene shape mirrors a trained LoG urban block (reference semantics:
LoG/model/level_of_gaussian.py tree arrays): roots over a large ground
extent, children jittered inside the parent footprint at 0.55x scale.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

SH_C0 = 0.28209479177387814


def tree_sizes(n_roots: int) -> tuple[int, int, int]:
    """(n1, n2, n_total) for the strided split structure."""
    n_split1 = n_roots // 2
    n1 = n_split1 * 4
    n_split2 = (n1 // 10) * 3
    n2 = n_split2 * 4
    return n1, n2, n_roots + n1 + n2


@partial(jax.jit, static_argnums=(1,))
def build_scene_device(key: jax.Array, n_roots: int):
    """Returns (params, tree, n_total). All arrays length n_total, unpadded.

    params: xyz/colors(SH dc)/scaling(log)/opacity(logit)/rotation/shs.
    tree: node_index/index_parent/depth/root_id (int32).
    """
    n1, n2, n = tree_sizes(n_roots)
    n_split1 = n1 // 4
    n_split2 = n2 // 4
    ks = jax.random.split(key, 10)
    ext = 30.0

    xyz_r = jnp.stack(
        [
            jax.random.uniform(ks[0], (n_roots,), minval=-ext, maxval=ext),
            jax.random.uniform(ks[1], (n_roots,), minval=-ext, maxval=ext),
            jax.random.uniform(ks[2], (n_roots,), minval=0.0, maxval=2.0),
        ],
        axis=1,
    )
    scal_r = jax.random.uniform(
        ks[3], (n_roots, 1), minval=0.08, maxval=0.25
    ) * jax.random.uniform(ks[4], (n_roots, 3), minval=0.6, maxval=1.4)

    # Morton-order the roots: block_render prunes CONTIGUOUS row ranges,
    # so spatial locality must live in the row order (trained models get
    # it from LoG.optimize_render_layout; children inherit it here via
    # parent-ordered generation). Same point set, different row order.
    qx = jnp.clip(
        ((xyz_r[:, 0] + ext) / (2 * ext) * 1024).astype(jnp.int32), 0, 1023
    )
    qy = jnp.clip(
        ((xyz_r[:, 1] + ext) / (2 * ext) * 1024).astype(jnp.int32), 0, 1023
    )
    mkey = jnp.zeros_like(qx)
    for b in range(10):
        mkey = (
            mkey
            | (((qx >> b) & 1) << (2 * b))
            | (((qy >> b) & 1) << (2 * b + 1))
        )
    order = jnp.argsort(mkey)
    xyz_r = xyz_r[order]
    scal_r = scal_r[order]

    def children(xyz_p, scal_p, parent_rows, key, n_child=4):
        p_xyz = xyz_p[parent_rows]
        p_scal = scal_p[parent_rows]
        off = jax.random.normal(key, (parent_rows.shape[0], n_child, 3))
        c_xyz = p_xyz[:, None] + off * p_scal[:, None] * 0.5
        c_scal = jnp.broadcast_to(
            p_scal[:, None] * 0.55, (parent_rows.shape[0], n_child, 3)
        )
        return c_xyz.reshape(-1, 3), c_scal.reshape(-1, 3)

    # every 2nd root splits
    split1 = jnp.arange(n_split1, dtype=jnp.int32) * 2
    c1_xyz, c1_scal = children(xyz_r, scal_r, split1, ks[5])
    # 3 of every 10 depth-1 children split
    m = jnp.arange(n_split2, dtype=jnp.int32)
    split2_local = (m // 3) * 10 + (m % 3)
    c2_xyz, c2_scal = children(c1_xyz, c1_scal, split2_local, ks[6])

    xyz = jnp.concatenate([xyz_r, c1_xyz, c2_xyz])
    scal = jnp.concatenate([scal_r, c1_scal, c2_scal])
    colors = jax.random.uniform(ks[7], (n, 3))
    q = jax.random.normal(ks[8], (n, 4))
    rot = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    opac = jax.random.uniform(ks[9], (n, 1), minval=0.3, maxval=0.95)

    depth = jnp.concatenate(
        [
            jnp.zeros(n_roots, jnp.int32),
            jnp.ones(n1, jnp.int32),
            jnp.full(n2, 2, jnp.int32),
        ]
    )
    index_parent = jnp.concatenate(
        [
            jnp.full(n_roots, -1, jnp.int32),
            jnp.repeat(split1, 4),
            jnp.repeat(split2_local + n_roots, 4),
        ]
    )
    node_index = jnp.full(n, -1, jnp.int32)
    node_index = node_index.at[split1].set(
        jnp.arange(n_split1, dtype=jnp.int32)
    )
    node_index = node_index.at[split2_local + n_roots].set(
        n_split1 + jnp.arange(n_split2, dtype=jnp.int32)
    )
    root_id = jnp.arange(n, dtype=jnp.int32)
    rid_d1 = index_parent[n_roots : n_roots + n1]
    root_id = root_id.at[n_roots : n_roots + n1].set(rid_d1)
    # depth-2 root = root of (depth-1) parent, which is itself a d1 row
    par_d2 = index_parent[n_roots + n1 :]
    root_id = root_id.at[n_roots + n1 :].set(root_id[par_d2])

    params = {
        "xyz": xyz,
        "colors": (colors - 0.5) / SH_C0,
        "scaling": jnp.log(scal),
        "opacity": jnp.log(opac / (1.0 - opac)),
        "rotation": rot,
        "shs": jnp.zeros((n, 3, 3), jnp.float32),
    }
    tree = {
        "node_index": node_index,
        "index_parent": index_parent,
        "depth": depth,
        "root_id": root_id,
    }
    return params, tree


@partial(jax.jit, static_argnums=(1, 2, 3))
def padded_model_device(key: jax.Array, n_roots: int, cap: int,
                        layout: str = "level"):
    """build_scene_device + capacity padding + flat-cut caches, on device.

    Returns (params, tree_dev, is_leaf_opt) where tree_dev carries the
    parent-attribute cache (parent_xyz/scaling/rotation) used by the flat
    LoD cut, padded to `cap` rows.

    layout="level": rows level-major (roots, then depth 1, then depth 2) —
    the build order. layout="root_major": roots stay the (morton-ordered)
    prefix; TAIL rows (depth >= 1) are regrouped CONTIGUOUSLY per root (in
    root-row order, parents before children). The grouped layout makes the
    weight-cull's capacity-axis expansion gather-free: tree_dev gains
    "cull_seg_starts" ((cap,) int32: first tail row of root rank j, == n
    for empty/padding ranks) consumed by fused_root_cull's scatter-max +
    cummax segment broadcast (~6 ms vs the ~33 ms w[root_id] take at 3.4M
    rows on v5e)."""
    _, _, n = tree_sizes(n_roots)
    if cap < n:
        raise ValueError(f"cap {cap} < scene size {n}")
    params, tree = build_scene_device(key, n_roots)
    seg_starts = None
    if layout == "root_major":
        n_tail = n - n_roots
        rid_tail = tree["root_id"][n_roots:]
        perm_t = jnp.argsort(rid_tail, stable=True)
        inv_t = jnp.zeros(n_tail, jnp.int32).at[perm_t].set(
            jnp.arange(n_tail, dtype=jnp.int32)
        )

        def reord(a):
            return jnp.concatenate([a[:n_roots], a[n_roots:][perm_t]])

        def remap_ref(v):
            # row-id values -> new row ids (roots don't move; -1 kept)
            vt = inv_t[jnp.clip(v - n_roots, 0, n_tail - 1)] + n_roots
            return jnp.where(v >= n_roots, vt, v)

        params = {k: reord(v) for k, v in params.items()}
        tree = {
            "node_index": reord(tree["node_index"]),  # table ids: no remap
            "index_parent": remap_ref(reord(tree["index_parent"])),
            "depth": reord(tree["depth"]),
            "root_id": reord(tree["root_id"]),  # values are root rows: fixed
        }
        rid_sorted = rid_tail[perm_t]
        seg_starts = (
            n_roots
            + jnp.searchsorted(
                rid_sorted, jnp.arange(cap, dtype=jnp.int32), side="left"
            ).astype(jnp.int32)
        )
    elif layout != "level":
        raise ValueError(f"unknown layout {layout!r}")

    def pad(a, fill=0):
        widths = ((0, cap - n),) + ((0, 0),) * (a.ndim - 1)
        return jnp.pad(a, widths, constant_values=fill)

    params = {k: pad(v) for k, v in params.items()}
    tree_dev = {
        "node_index": pad(tree["node_index"], -1),
        "index_parent": pad(tree["index_parent"], -1),
        "depth": pad(tree["depth"]),
        "root_id": pad(tree["root_id"]),
    }
    parent = jnp.where(
        tree_dev["index_parent"] >= 0,
        tree_dev["index_parent"],
        jnp.arange(cap, dtype=jnp.int32),
    )
    tree_dev["parent_xyz"] = jnp.take(params["xyz"], parent, axis=0)
    tree_dev["parent_scaling"] = jnp.take(params["scaling"], parent, axis=0)
    tree_dev["parent_rotation"] = jnp.take(params["rotation"], parent, axis=0)
    # per-point root-center cache (flat_slice cut): roots read themselves
    tree_dev["root_xyz"] = jnp.take(
        params["xyz"], jnp.clip(tree_dev["root_id"], 0, cap - 1), axis=0
    )
    if seg_starts is not None:
        tree_dev["cull_seg_starts"] = seg_starts
    is_leaf_opt = (tree_dev["node_index"] == -1) & (tree_dev["depth"] > 0)
    return params, tree_dev, is_leaf_opt
