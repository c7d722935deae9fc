"""Native grid-hash KNN vs scipy cKDTree oracle."""
import numpy as np
import pytest


def test_native_knn_matches_scipy(rng):
    from log_tpu.native import knn_mean_sq_dist as native_knn

    xyz = rng.normal(size=(5000, 3)).astype(np.float32)
    out = native_knn(xyz, k=3)
    if out is None:
        pytest.skip("native toolchain unavailable")
    from scipy.spatial import cKDTree

    d, _ = cKDTree(xyz).query(xyz, k=4)
    want = np.mean(d[:, 1:] ** 2, axis=1)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-6)


def test_native_knn_clustered(rng):
    from log_tpu.native import knn_mean_sq_dist as native_knn

    # pathological distribution: dense cluster + far outliers
    a = rng.normal(size=(2000, 3)).astype(np.float32) * 0.01
    b = rng.normal(size=(50, 3)).astype(np.float32) * 100.0
    xyz = np.concatenate([a, b])
    out = native_knn(xyz, k=3)
    if out is None:
        pytest.skip("native toolchain unavailable")
    from scipy.spatial import cKDTree

    d, _ = cKDTree(xyz).query(xyz, k=4)
    want = np.mean(d[:, 1:] ** 2, axis=1)
    np.testing.assert_allclose(out, want, rtol=1e-3, atol=1e-8)
