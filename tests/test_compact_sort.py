"""Compaction-by-sort vs the nonzero+gather reference layout."""
import numpy as np
import jax.numpy as jnp

from log_tpu.model.train_step import (
    _compact_slices_gather,
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


def test_compact_gather_matches_sort():
    """The small-bucket index-sort+gather variant is layout-identical to
    the payload sort (it is the k << cap fast path _train_step_core picks
    automatically — ~304 ms -> ~sort(1 key) + k-row gather at 12.58M x 23)."""
    rng = np.random.default_rng(1)
    cap, k = 4096, 256
    keep = jnp.asarray(rng.random(cap) < 0.04)
    params = {
        "xyz": jnp.asarray(rng.normal(size=(cap, 3)).astype(np.float32)),
        "rotation": jnp.asarray(rng.normal(size=(cap, 4)).astype(np.float32)),
        "shs": jnp.asarray(rng.normal(size=(cap, 3, 3)).astype(np.float32)),
    }
    a = _compact_slices_sort(params, keep, k)
    b = _compact_slices_gather(params, keep, k)
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))
    for name in params:
        np.testing.assert_array_equal(
            np.asarray(a[0][name]), np.asarray(b[0][name]), err_msg=name
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
