"""Host moment spill (the reference's 50M/100M CPU offload,
LoG/model/splitter.py:198-204): past a point-count threshold the Adam
moments move to host numpy and the step runs host-gather -> device Adam on
slices -> host-scatter. Training near the HBM ceiling degrades instead of
OOMing — and produces EXACTLY the same numbers as the device path."""
import numpy as np
import pytest

from log_tpu.dataset.synthetic import SyntheticDataset

from test_train_smoke import build_model


@pytest.fixture(scope="module")
def dataset():
    return SyntheticDataset(n_gaussians=120, n_views=6, H=48, W=64, seed=0)


def run_steps(model, dataset, n_steps=6, use_iteration=False):
    bg = dataset.background
    rng = np.random.default_rng(0)
    for _ in range(n_steps):
        item = dataset[int(rng.integers(len(dataset)))]
        gt = item["image"].transpose(2, 0, 1)
        if use_iteration:
            model.training_iteration(
                item["camera"], gt, bg, view_index=item["index"]
            )
        else:
            model.prepare_from_camera(item["camera"])
            model.train_step(item["camera"], gt, bg, view_index=item["index"])


def test_spill_matches_device_path(dataset, monkeypatch):
    # pin the device model to the SPARSE executable: the spill path cannot
    # take the identity fast path (host moments arrive as slices), and this
    # test's tight tolerances assume both sides run the same graph modulo
    # the spilled flag. Identity-vs-sparse equality is covered by
    # tests/test_train_step_identity.py.
    monkeypatch.setenv("LOG_TPU_IDENTITY_STEP", "0")
    ref = build_model(dataset)
    run_steps(ref, dataset)

    spill = build_model(dataset)
    spill.optimizer.to_host(("exp_avg_sq", "exp_avg"))
    assert spill.optimizer.spilled == ("exp_avg", "exp_avg_sq")
    run_steps(spill, dataset)

    # 1-2 ULP tolerance: the spilled flag changes the jitted graph, and
    # XLA may fuse/vectorize the transcendental-heavy sections differently
    n = ref.num_points
    for k in ref.gaussian.keys:
        np.testing.assert_allclose(
            np.asarray(ref.gaussian.get(k))[:n],
            np.asarray(spill.gaussian.get(k))[:n],
            rtol=1e-5, atol=2e-6, err_msg=f"param {k}",
        )
    ref_m = ref.optimizer.to_numpy(n)
    sp_m = spill.optimizer.to_numpy(n)
    for mk in ("exp_avg", "exp_avg_sq"):
        for k in ref_m[mk]:
            np.testing.assert_allclose(
                ref_m[mk][k], sp_m[mk][k], rtol=1e-6, atol=1e-9,
                err_msg=f"{mk}/{k}",
            )


def test_spill_training_iteration_path(dataset):
    """training_iteration (the fused driver) falls back to the two-phase
    step in spill mode and keeps optimizing."""
    model = build_model(dataset)
    model.optimizer.to_host(("exp_avg_sq",))
    bg = dataset.background
    item = dataset[0]
    gt = item["image"].transpose(2, 0, 1)
    metrics, _ = model.training_iteration(
        item["camera"], gt, bg, view_index=item["index"]
    )
    assert np.isfinite(float(metrics["loss"]))
    # moments actually moved: device dict empty, host dict populated
    assert model.optimizer.moments["exp_avg_sq"] == {}
    assert any(
        np.any(v != 0) for v in model.optimizer.host_moments["exp_avg_sq"].values()
    )


def test_auto_spill_threshold(dataset):
    model = build_model(dataset)
    model.optimizer.spill_points = model.num_points - 1  # force
    assert model.optimizer.maybe_spill(model.num_points)
    assert model.optimizer.spilled == ("exp_avg_sq",)
    # second call is a no-op
    assert not model.optimizer.maybe_spill(model.num_points)


def test_spill_survives_host_densify(dataset):
    """The host densify rebuild routes spilled moments through numpy
    (set_numpy/to_numpy are spill-aware) and training continues."""
    model = build_model(dataset)
    run_steps(model, dataset, n_steps=8)
    model.optimizer.to_host(("exp_avg_sq",))
    model.update_init_stage()
    assert model.optimizer.spilled == ("exp_avg_sq",)
    # rebuilt host arrays match the new capacity
    for v in model.optimizer.host_moments["exp_avg_sq"].values():
        assert v.shape[0] == model.capacity
    run_steps(model, dataset, n_steps=2)
