"""Pallas one-hot expansion vs the jnp piecewise construction.

Contract under test (expand_pallas.py): tail-only zero runs, counts >= 1
for valid lanes. The Pallas path selects each run's value EXACTLY (single
nonzero term per matmul sum); the jnp telescoping cumsum accumulates
rounding, so float comparisons use a tolerance while integer-valued
floats must match bitwise.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from log_tpu.ops.expand_pallas import CHUNK, W, piecewise_expand_pallas
from log_tpu.ops.rasterize_tiled import piecewise_expand


def make_runs(rng, P, n_valid, A, max_count=9):
    counts = np.zeros(P, np.int64)
    counts[:n_valid] = rng.integers(1, max_count, n_valid)
    offs = np.cumsum(counts) - counts
    total = int(offs[n_valid - 1] + counts[n_valid - 1]) if n_valid else 0
    assert total <= A
    offs = np.minimum(offs, A)
    offs[n_valid:] = A
    return jnp.asarray(offs.astype(np.int32)), total


@pytest.mark.parametrize("R", [1, 13])
def test_expand_matches_jnp(R):
    rng = np.random.default_rng(0)
    P, n_valid, A = 1024, 700, CHUNK * 8
    offs, total = make_runs(rng, P, n_valid, A)
    vals = jnp.asarray(
        rng.integers(-1000, 1000, (R, P)).astype(np.float32)
    )
    got = piecewise_expand_pallas(vals, offs, A, interpret=True)
    want = piecewise_expand(vals, offs, A)
    np.testing.assert_array_equal(
        np.asarray(got)[:, :total], np.asarray(want)[:, :total]
    )
    # overcover region beyond total: last valid run's value (both paths)
    np.testing.assert_array_equal(
        np.asarray(got)[:, total:], np.asarray(want)[:, total:]
    )


def test_expand_float_tolerance():
    rng = np.random.default_rng(1)
    P, n_valid, A = 2048, 2000, CHUNK * 24
    offs, total = make_runs(rng, P, n_valid, A)
    vals = jnp.asarray(rng.normal(0, 3, (5, P)).astype(np.float32))
    got = np.asarray(piecewise_expand_pallas(vals, offs, A, interpret=True))
    want = np.asarray(piecewise_expand(vals, offs, A))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # the Pallas path is an exact selection: verify against the direct
    # searchsorted oracle bitwise
    offs_np = np.asarray(offs)
    r = np.searchsorted(offs_np, np.arange(total), side="right") - 1
    np.testing.assert_array_equal(got[:, :total], np.asarray(vals)[:, r])


def test_expand_empty_tail_window():
    # n_valid runs ending far before A: every tail chunk must read the
    # sentinel-padded window and emit the last run's value (overcover)
    rng = np.random.default_rng(2)
    P, n_valid, A = 256, 64, CHUNK * 16
    offs, total = make_runs(rng, P, n_valid, A, max_count=3)
    vals = jnp.asarray(rng.integers(0, 50, (2, P)).astype(np.float32))
    got = np.asarray(piecewise_expand_pallas(vals, offs, A, interpret=True))
    assert np.isfinite(got).all()
    np.testing.assert_array_equal(
        got[:, total:], np.broadcast_to(
            np.asarray(vals)[:, n_valid - 1 : n_valid], (2, A - total)
        ),
    )


def test_expand_vjp_matches_jnp():
    rng = np.random.default_rng(3)
    P, n_valid, A = 512, 400, CHUNK * 6
    offs, total = make_runs(rng, P, n_valid, A)
    vals = jnp.asarray(rng.normal(0, 1, (3, P)).astype(np.float32))
    ct = jnp.asarray(rng.normal(0, 1, (3, A)).astype(np.float32))

    def f_pallas(v):
        return jnp.vdot(piecewise_expand_pallas(v, offs, A, interpret=True), ct)

    def f_jnp(v):
        return jnp.vdot(piecewise_expand(v, offs, A), ct)

    g_p = np.asarray(jax.grad(f_pallas)(vals))
    g_j = np.asarray(jax.grad(f_jnp)(vals))
    np.testing.assert_allclose(g_p, g_j, rtol=2e-4, atol=2e-4)


def test_expand_window_worst_case():
    """Adversarial W=640 bound: a straddler at maximum window
    misalignment (lo = 127, w0 = 0) followed by 512 count-1 runs — the
    furthest needed run sits at index lo+512 = 639 = the window's last
    lane."""
    A = CHUNK * 4
    counts = np.concatenate([
        np.ones(127, np.int64),      # runs 0..126: [0, 127)
        [386],                       # run 127: [127, 513) straddles chunk 1
        np.ones(A - 513, np.int64),  # count-1 runs from 513
    ])
    P = counts.shape[0]
    offs_np = np.cumsum(counts) - counts
    total = int(offs_np[-1] + counts[-1])
    assert total == A
    offs = jnp.asarray(offs_np.astype(np.int32))
    vals = jnp.asarray(
        np.arange(P, dtype=np.float32)[None, :].repeat(2, 0)
    )
    got = np.asarray(piecewise_expand_pallas(vals, offs, A, interpret=True))
    r = np.searchsorted(offs_np, np.arange(A), side="right") - 1
    np.testing.assert_array_equal(got[:, :total], np.asarray(vals)[:, r])
