"""Compaction-by-sort vs the nonzero+gather reference layout."""
import numpy as np
import jax.numpy as jnp

from log_tpu.model.train_step import (
    _compact_slices_sort,
    _gather_slices,
)


def test_compact_sort_matches_nonzero_gather():
    rng = np.random.default_rng(0)
    cap, k = 4096, 1024
    keep = jnp.asarray(rng.random(cap) < 0.18)
    params = {
        "xyz": jnp.asarray(rng.normal(size=(cap, 3)).astype(np.float32)),
        "opacity": jnp.asarray(rng.normal(size=(cap, 1)).astype(np.float32)),
        "rotation": jnp.asarray(rng.normal(size=(cap, 4)).astype(np.float32)),
        "shs": jnp.asarray(rng.normal(size=(cap, 3, 3)).astype(np.float32)),
    }
    index_ref = jnp.nonzero(keep, size=k, fill_value=cap)[0]
    lv_ref = index_ref < cap
    slices_ref = _gather_slices(params, index_ref, lv_ref)

    slices, index, lane_valid = _compact_slices_sort(params, keep, k)
    np.testing.assert_array_equal(np.asarray(index), np.asarray(index_ref))
    np.testing.assert_array_equal(
        np.asarray(lane_valid), np.asarray(lv_ref)
    )
    for name in params:
        np.testing.assert_array_equal(
            np.asarray(slices[name]), np.asarray(slices_ref[name]),
            err_msg=name,
        )


def test_compact_sort_overflow_truncates():
    # more kept rows than budget: first k kept rows in index order survive
    cap, k = 512, 16
    keep = jnp.ones(cap, bool)
    params = {"xyz": jnp.arange(cap * 3, dtype=jnp.float32).reshape(cap, 3)}
    slices, index, lane_valid = _compact_slices_sort(params, keep, k)
    np.testing.assert_array_equal(np.asarray(index), np.arange(k))
    assert bool(lane_valid.all())
    np.testing.assert_array_equal(
        np.asarray(slices["xyz"]), np.asarray(params["xyz"][:k])
    )
