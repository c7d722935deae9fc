"""Pallas stream compaction == compaction-by-sort (exact).

ops/compact_pallas.py replaces the payload sort on the render frame's
capacity axis with a single-pass carry-aligned stream compaction; outputs
must match train_step._compact_flat_cols_sort bit for bit (the one-hot
matmul moves values exactly: every output column sums one nonzero f32
product at HIGHEST precision; u32 columns ride as exact 16-bit halves).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from log_tpu.model.train_step import _compact_flat_cols_sort
from log_tpu.ops.compact_pallas import STEP, stream_compact_cols


@pytest.mark.parametrize("density,k_frac", [(0.13, 0.25), (0.8, 0.5),
                                            (0.02, 0.05), (1.0, 1.0)])
def test_stream_compact_matches_sort(density, k_frac):
    cap = 2 * STEP
    k = max(128, int(cap * k_frac) // 128 * 128)
    rng = np.random.default_rng(int(density * 100))
    keep = jnp.asarray(rng.random(cap) < density)
    cols = {
        "px": jnp.asarray(rng.normal(size=cap).astype(np.float32) * 500),
        "depth": jnp.asarray(rng.random(cap).astype(np.float32) * 80),
        "p1": jnp.asarray(rng.integers(0, 1 << 32, cap, dtype=np.uint32)),
        "p2": jnp.asarray(rng.integers(0, 1 << 32, cap, dtype=np.uint32)),
        "root_id": jnp.asarray(
            rng.integers(0, cap, cap, dtype=np.int32)
        ),
    }
    want_sl, want_idx, want_lv = _compact_flat_cols_sort(cols, keep, k)
    got_sl, got_idx, got_lv = stream_compact_cols(
        cols, keep, k, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got_lv), np.asarray(want_lv))
    np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(want_idx))
    for n in cols:
        np.testing.assert_array_equal(
            np.asarray(got_sl[n]), np.asarray(want_sl[n]), err_msg=n
        )


def test_stream_compact_empty_and_full_chunks():
    cap = 2 * STEP
    k = cap
    # adversarial: empty sub-chunks, a full grid step, carry straddles
    # both sub-chunks and grid steps
    keep = np.zeros(cap, bool)
    keep[:STEP - 1] = True                  # nearly-full first step
    keep[STEP + 7: STEP + 70] = True        # partial, offset carry
    keep[-1] = True
    cols = {"v": jnp.arange(cap, dtype=jnp.float32)}
    want = _compact_flat_cols_sort(cols, jnp.asarray(keep), k)
    got = stream_compact_cols(cols, jnp.asarray(keep), k, interpret=True)
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))
    np.testing.assert_array_equal(
        np.asarray(got[0]["v"]), np.asarray(want[0]["v"])
    )
