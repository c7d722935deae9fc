"""On-device synthetic scene generator: tree invariants.

The generator (log_tpu/utils/synth_tree.py) feeds bench.py and perf
dryruns; its tree arrays must satisfy the same invariants as real LoG
models (reference semantics: LoG/model/level_of_gaussian.py tree state).
"""
import numpy as np
import jax

from log_tpu.model.gaussian import next_capacity
from log_tpu.utils.synth_tree import (
    build_scene_device,
    padded_model_device,
    tree_sizes,
)

N_ROOTS = 2000


def test_tree_invariants():
    n1, n2, n = tree_sizes(N_ROOTS)
    assert n1 == (N_ROOTS // 2) * 4
    params, tree = build_scene_device(jax.random.PRNGKey(0), N_ROOTS)
    t = {k: np.asarray(v) for k, v in tree.items()}
    assert all(np.asarray(v).shape[0] == n for v in params.values())

    # roots are the prefix; depth partitions by construction ranges
    assert (t["index_parent"][:N_ROOTS] == -1).all()
    assert (t["depth"][:N_ROOTS] == 0).all()
    assert (t["depth"][N_ROOTS:N_ROOTS + n1] == 1).all()
    assert (t["depth"][N_ROOTS + n1:] == 2).all()

    # parents: children point one level up, 4 per split node
    par1 = t["index_parent"][N_ROOTS:N_ROOTS + n1]
    assert (t["depth"][par1] == 0).all()
    par2 = t["index_parent"][N_ROOTS + n1:]
    assert (t["depth"][par2] == 1).all()
    counts = np.bincount(par1, minlength=n)
    split_roots = np.flatnonzero(counts)
    assert (counts[split_roots] == 4).all()

    # node_index: split nodes get consecutive ids; leaves -1
    ni = t["node_index"]
    n_nodes = (ni >= 0).sum()
    assert sorted(ni[ni >= 0]) == list(range(n_nodes))
    # a node has children iff node_index >= 0
    has_child = np.zeros(n, bool)
    has_child[par1] = True
    has_child[par2] = True
    assert ((ni >= 0) == has_child).all()

    # root_id: follow parent pointers to a root
    rid = t["root_id"]
    assert (rid[:N_ROOTS] == np.arange(N_ROOTS)).all()
    expect2 = rid[t["index_parent"][N_ROOTS + n1:]]
    assert (rid[N_ROOTS + n1:] == expect2).all()
    assert (t["index_parent"][rid] == -1).all()


def test_padded_model_caches():
    _, _, n = tree_sizes(N_ROOTS)
    cap = next_capacity(n)
    params, tree_dev, is_leaf_opt = padded_model_device(
        jax.random.PRNGKey(0), N_ROOTS, cap
    )
    assert params["xyz"].shape == (cap, 3)
    ip = np.asarray(tree_dev["index_parent"])
    px = np.asarray(tree_dev["parent_xyz"])
    xyz = np.asarray(params["xyz"])
    child = np.flatnonzero(ip >= 0)
    np.testing.assert_array_equal(px[child], xyz[ip[child]])
    # roots/padding cache their own row
    selfrows = np.flatnonzero(ip < 0)
    np.testing.assert_array_equal(px[selfrows], xyz[selfrows])
    lo = np.asarray(is_leaf_opt)
    ni = np.asarray(tree_dev["node_index"])
    dep = np.asarray(tree_dev["depth"])
    np.testing.assert_array_equal(lo[:n], (ni[:n] == -1) & (dep[:n] > 0))
