"""Identity fast path (k_leaf == cap) == the compacted sparse path.

When the leaf bucket covers the whole capacity axis, _train_step_core
skips the compaction sort and runs dense masked Adam instead of
gather -> Adam -> scatter (round-5 dissection: the sparse path's 3
capacity-sized gathers + 3 scatters were ~35 ms of a 43 ms optimizer
tail at K = cap). The two paths must produce identical rows: the sparse
path's sentinel-index drops ARE the dense path's mask keeps.

A/B harness: the same scene stepped once (a) at capacity == k_leaf
(identity path) and (b) zero-padded to 2x capacity with the same k_leaf
(compacted path) — alive rows coincide, so params/moments/counter rows
must match on the original capacity prefix.
"""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from log_tpu.dataset.base import prepare_camera
from log_tpu.model.counter import init_counter
from log_tpu.model.train_step import StepConfig, fused_train_step
from log_tpu.render.renderer import camera_device

H, W = 64, 96
CAP = 256
N = 200


def make_scene(cap):
    ks = jax.random.split(jax.random.PRNGKey(7), 8)
    ext = 6.0
    xyz = jnp.stack([
        jax.random.uniform(ks[0], (cap,), minval=-ext, maxval=ext),
        jax.random.uniform(ks[1], (cap,), minval=-ext, maxval=ext),
        jax.random.uniform(ks[2], (cap,), minval=0.0, maxval=2.0),
    ], axis=1)
    q = jax.random.normal(ks[4], (cap, 4))
    opac = jax.random.uniform(ks[5], (cap, 1), minval=0.3, maxval=0.9)
    params = {
        "xyz": xyz,
        "colors": jax.random.uniform(ks[6], (cap, 3)) * 2 - 1,
        "scaling": jnp.log(
            jax.random.uniform(ks[3], (cap, 3), minval=0.1, maxval=0.5)
        ),
        "opacity": jnp.log(opac / (1 - opac)),
        "rotation": q / jnp.linalg.norm(q, axis=1, keepdims=True),
        "shs": jax.random.normal(ks[7], (cap, 3, 3)) * 0.01,
    }
    # zero out rows past N (dead padding, as after densify removal)
    alive = (jnp.arange(cap) < N)[:, None]
    params = {
        k: jnp.where(alive.reshape((cap,) + (1,) * (v.ndim - 1)), v, 0.0)
        for k, v in params.items()
    }
    return params


def pad_rows(d, cap2):
    return {
        k: jnp.concatenate(
            [v, jnp.zeros((cap2 - v.shape[0],) + v.shape[1:], v.dtype)]
        )
        for k, v in d.items()
    }


def make_cam():
    pos = np.array([0.0, -14.0, 8.0])
    fwd = -pos / np.linalg.norm(pos)
    right = np.cross(fwd, np.array([0, 0, 1.0]))
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    R = np.stack([right, up, fwd])
    T = (-R @ pos).reshape(3, 1)
    K = np.array([[90.0, 0, W / 2], [0, 90.0, H / 2], [0, 0, 1]])
    return camera_device(prepare_camera(
        {"K": K, "R": R, "T": T, "H": H, "W": W, "center": pos.reshape(3, 1)},
        1, 0.01, 100.0))


def run_step(params, cap, keep):
    moments = {
        "exp_avg": {k: jnp.zeros_like(v) for k, v in params.items()},
        "exp_avg_sq": {k: jnp.zeros_like(v) for k, v in params.items()},
    }
    counter = {k: jnp.asarray(v) for k, v in init_counter(cap).items()}
    cfg = StepConfig(
        image_height=H, image_width=W, k_leaf=CAP, k_node=0,
        sh_degree=1, mode="antialias", backend="tiled", max_pairs=1 << 13,
    )
    lrs = {k: jnp.float32(1e-2) for k in
           ("xyz", "colors", "scaling", "opacity", "rotation", "shs")}
    corr = {
        "values": jnp.ones((1, 3)), "m1": jnp.zeros((1, 3)),
        "m2": jnp.zeros((1, 3)), "vmax": jnp.zeros((1, 3)),
        "steps": jnp.zeros((1,), jnp.int32),
    }
    gt = (jax.random.uniform(jax.random.PRNGKey(3), (3, H, W)) * 255
          ).astype(jnp.uint8)
    p, m, c, _co, metrics, aux = fused_train_step(
        params, moments, counter, keep, jnp.zeros((cap,), bool),
        make_cam(), gt, jnp.zeros(3), lrs, jnp.float32(1), corr,
        jnp.int32(0), jnp.ones((1, 1, 1)), jnp.ones((1, 1)),
        jax.random.PRNGKey(1), cfg=cfg,
    )
    return p, m, c, metrics


def test_identity_path_matches_compacted():
    # fused_train_step donates params/moments/counter: hand each run its
    # own pytree and keep a host copy for the padding-row check
    params_np = {k: np.asarray(v) for k, v in make_scene(CAP).items()}
    params = {k: jnp.asarray(v) for k, v in params_np.items()}
    keep = jnp.arange(CAP) < N

    # (a) identity path: k_leaf == cap
    p_a, m_a, c_a, met_a = run_step(params, CAP, keep)

    # (b) compacted path: same rows inside a 2x capacity (k_leaf < cap,
    # packed-cat Adam)
    params2 = pad_rows({k: jnp.asarray(v) for k, v in params_np.items()},
                       2 * CAP)
    keep2 = jnp.arange(2 * CAP) < N
    p_b, m_b, c_b, met_b = run_step(params2, 2 * CAP, keep2)

    # (c) small-bucket path: 16x capacity (k_leaf <= cap // 8 picks the
    # index-sort+gather compaction AND the per-key no-concat sparse Adam)
    params3 = pad_rows({k: jnp.asarray(v) for k, v in params_np.items()},
                       16 * CAP)
    keep3 = jnp.arange(16 * CAP) < N
    p_c, m_c, c_c, met_c = run_step(params3, 16 * CAP, keep3)
    assert np.allclose(float(met_c["loss"]), float(met_b["loss"]), atol=1e-6)
    for k in p_b:
        np.testing.assert_allclose(
            np.asarray(p_c[k])[:N], np.asarray(p_b[k])[:N],
            rtol=1e-5, atol=1e-7, err_msg=f"small-bucket param {k}",
        )
    for kind in ("exp_avg", "exp_avg_sq"):
        for k in m_b[kind]:
            np.testing.assert_allclose(
                np.asarray(m_c[kind][k])[:N], np.asarray(m_b[kind][k])[:N],
                rtol=1e-5, atol=1e-8, err_msg=f"small-bucket {kind}/{k}",
            )

    assert np.allclose(float(met_a["loss"]), float(met_b["loss"]), atol=1e-6)
    for k in p_a:
        np.testing.assert_allclose(
            np.asarray(p_a[k])[:N], np.asarray(p_b[k])[:N],
            rtol=1e-5, atol=1e-7, err_msg=f"param {k}",
        )
    for kind in ("exp_avg", "exp_avg_sq"):
        for k in m_a[kind]:
            np.testing.assert_allclose(
                np.asarray(m_a[kind][k])[:N], np.asarray(m_b[kind][k])[:N],
                rtol=1e-5, atol=1e-8, err_msg=f"{kind}/{k}",
            )
    for k in ("weights_max", "weights_sum", "visible_count"):
        np.testing.assert_allclose(
            np.asarray(c_a[k])[:N], np.asarray(c_b[k])[:N],
            rtol=1e-5, atol=1e-7, err_msg=f"counter {k}",
        )
    # rows past N must be untouched by both
    for k in p_a:
        np.testing.assert_array_equal(
            np.asarray(p_a[k])[N:], params_np[k][N:],
            err_msg=f"padding rows of {k} changed",
        )
