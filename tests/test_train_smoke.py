"""End-to-end smoke: fit a LoG model to a synthetic scene and check that the
fused train step optimizes (loss drops, PSNR rises). Exercises init-stage
visibility, the fused step (gather/render/loss/grad/counter/Adam/scatter),
and the init-stage densify."""
import numpy as np
import pytest

from log_tpu.dataset.synthetic import SyntheticDataset
from log_tpu.model.level_of_gaussian import LoG


MODEL_CFG = dict(
    gaussian=dict(sh_degree=1, xyz_scale=1.0),
    tree=dict(max_child=4, max_level=30),
    optimizer=dict(
        optimize_keys=["xyz", "colors", "scaling", "opacity", "rotation", "shs"],
        opt_all_levels=True,
        lr_dict=dict(
            xyz=0.00016,
            xyz_final=0.0000016,
            colors=0.0025,
            shs=0.000125,
            scaling=0.005,
            opacity=0.05,
            rotation=0.001,
            max_steps=600,
        ),
    ),
    densify_and_remove=dict(
        upgrade_sh_iter=10,
        densify_from_iter=1,
        densify_every_iter=1,
        upgrade_repeat=50,
        init_split_method="split_by_2d",
        init_radius_min=4,
        init_radius_split=16,
        init_weight_min=0.1,
        min_steps=50,
        method="naive",
        split_grad_thres=0.0002,
        radius2d_thres=6,
        remove_weights_thres=0.005,
        max_split_points=20000,
        sort_method="radii",
        min_steps_split=100,
        scaling_decay=0.9,
    ),
)


@pytest.fixture(scope="module")
def dataset():
    return SyntheticDataset(n_gaussians=120, n_views=6, H=48, W=64, seed=0)


def build_model(dataset):
    cfg = dict(MODEL_CFG)
    pc = dataset.noisy_pointcloud()
    model = LoG(**cfg)
    from log_tpu.utils.file import knn_mean_sq_dist

    scales = np.sqrt(np.maximum(knn_mean_sq_dist(pc["xyz"]), 1e-7))
    model.gaussian.register_by_pointcloud(
        pc["xyz"], pc["colors"], scales, init_opacity=0.5
    )
    model.counter.reset(model.num_points, model.capacity)
    model.counter.set_numpy(
        {
            "radius3d_min": np.full(model.num_points, 1e-4, np.float32),
            "radius3d_max": np.full(model.num_points, 1.0, np.float32),
        },
        model.capacity,
    )
    model.base_iter = 10
    model.training_setup()
    return model


def psnr(a, b):
    mse = np.mean((a - b) ** 2)
    return -10 * np.log10(mse)


@pytest.mark.slow
def test_fit_synthetic_scene(dataset):
    model = build_model(dataset)
    bg = dataset.background
    losses = []
    n_steps = 60
    rng = np.random.default_rng(0)
    for step in range(n_steps):
        item = dataset[int(rng.integers(len(dataset)))]
        camera = item["camera"]
        gt = item["image"].transpose(2, 0, 1)
        model.prepare_from_camera(camera)
        metrics, aux = model.train_step(camera, gt, bg, view_index=item["index"])
        losses.append(float(metrics["loss"]))
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.9, losses

    # PSNR on a held-out-ish view should beat the init render
    from log_tpu.render.renderer import NaiveRendererAndLoss

    renderer = NaiveRendererAndLoss(split="val", background=tuple(bg))
    model.eval()
    item = dataset[0]
    model.prepare_from_camera(item["camera"])
    out = renderer.render_one(model, item["camera"], bg)
    p = psnr(np.asarray(out["render"]), item["image"].transpose(2, 0, 1))
    assert p > 11.5, f"PSNR {p}"


@pytest.mark.slow
def test_init_stage_densify(dataset):
    model = build_model(dataset)
    bg = dataset.background
    rng = np.random.default_rng(0)
    # accumulate enough counter statistics to activate splits
    for step in range(55):
        item = dataset[int(rng.integers(len(dataset)))]
        gt = item["image"].transpose(2, 0, 1)
        model.prepare_from_camera(item["camera"])
        model.train_step(item["camera"], gt, bg)
    n_before = model.num_points
    model.update_init_stage()
    n_after = model.num_points
    assert n_after > 0
    # model must still train after the rebuild
    item = dataset[0]
    gt = item["image"].transpose(2, 0, 1)
    model.prepare_from_camera(item["camera"])
    metrics, _ = model.train_step(item["camera"], gt, bg)
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_view_correction_training(dataset):
    """Per-view gain adapts in-jit after base_iter (Corrector contract)."""
    cfg = dict(MODEL_CFG)
    cfg["use_view_correction"] = True
    model = LoG(**cfg)
    from log_tpu.utils.file import knn_mean_sq_dist

    pc = dataset.noisy_pointcloud()
    scales = np.sqrt(np.maximum(knn_mean_sq_dist(pc["xyz"]), 1e-7))
    model.gaussian.register_by_pointcloud(
        pc["xyz"], pc["colors"], scales, init_opacity=0.5
    )
    model.counter.reset(model.num_points, model.capacity)
    model.counter.set_numpy(
        {
            "radius3d_min": np.full(model.num_points, 1e-4, np.float32),
            "radius3d_max": np.full(model.num_points, 1.0, np.float32),
        },
        model.capacity,
    )
    model.base_iter = 2  # enable correction quickly
    model.view_correction.init(len(dataset))
    model.training_setup()
    bg = dataset.background
    rng = np.random.default_rng(0)
    for step in range(8):
        item = dataset[int(rng.integers(len(dataset)))]
        gt = item["image"].transpose(2, 0, 1) * 0.7  # force a gain mismatch
        model.prepare_from_camera(item["camera"])
        model.train_step(item["camera"], gt, bg, view_index=item["index"])
    model._sync_corrector_to_host()
    gains = model.view_correction.values
    assert gains.shape == (len(dataset), 3)
    # at least one view's gain moved off 1.0 toward darkening
    assert (np.abs(gains - 1.0) > 1e-4).any(), gains
    sd = model.state_dict()
    assert "view_correction.view_correction" in sd


@pytest.mark.slow
def test_merged_training_iteration(dataset):
    """training_iteration (prepare fused into the step, lagged bucket) must
    optimize like the two-phase path."""
    model = build_model(dataset)
    bg = dataset.background
    rng = np.random.default_rng(0)
    losses = []
    for step in range(24):
        item = dataset[int(rng.integers(len(dataset)))]
        gt = item["image"].transpose(2, 0, 1)
        metrics, aux = model.training_iteration(
            item["camera"], gt, bg, view_index=item["index"]
        )
        losses.append(float(metrics["loss"]))
    assert np.mean(losses[-6:]) < np.mean(losses[:6])
    assert "keep_mask" in model.visibility_flag  # inference can reuse the cut


def test_foreground_crop_loss_matches_cropped_oracle(dataset):
    """crop_loss (MaskForeground training) must equal computing L1 + SSIM on
    the literal (padded) bbox crop, as the reference does by slicing
    (LoG/render/renderer.py:344-368)."""
    import jax.numpy as jnp

    from log_tpu.model.level_of_gaussian import _fg_mask_bbox
    from log_tpu.ops.ssim import ssim_map

    model = build_model(dataset)
    item = dataset[0]
    camera = item["camera"]
    gt = item["image"].transpose(2, 0, 1)
    H, W = gt.shape[1], gt.shape[2]
    mask = np.zeros((H, W), np.float32)
    mask[10:34, 16:52] = 1.0
    bg = np.array([0.3, 0.5, 0.7], np.float32)

    model.prepare_from_camera(camera)
    metrics, aux = model.train_step(
        camera, gt, bg, view_index=0, fg_mask=mask
    )
    l1_step = float(metrics["l1"])
    ssim_step = float(metrics["ssim"])

    # oracle: literal crop
    _, bbox = _fg_mask_bbox(mask, H, W)
    t, b, l, r = [int(v) for v in np.asarray(bbox)]
    b, r = min(b, H - 1), min(r, W - 1)
    render = np.asarray(aux["render"])
    gt_eff = gt * mask[None] + (1 - mask[None]) * bg[:, None, None]
    rc = render[:, t : b + 1, l : r + 1]
    gc = gt_eff[:, t : b + 1, l : r + 1]
    l1_ref = float(np.mean(np.abs(rc - gc)))
    ssim_ref = float(
        1.0 - np.mean(np.asarray(ssim_map(jnp.asarray(rc), jnp.asarray(gc))))
    )
    assert abs(l1_step - l1_ref) < 2e-5, (l1_step, l1_ref)
    assert abs(ssim_step - ssim_ref) < 2e-4, (ssim_step, ssim_ref)
