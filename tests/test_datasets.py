"""Dataset-layer tests: COLMAP-style ingest + cache, crops, demo paths."""
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    """Synthetic scene in the on-disk layout the pipeline expects."""
    out = tmp_path_factory.mktemp("scene")
    import cv2

    from log_tpu.dataset.camera_utils import write_camera
    from log_tpu.dataset.synthetic import SyntheticDataset

    ds = SyntheticDataset(n_gaussians=50, n_views=4, H=64, W=80, seed=2)
    os.makedirs(out / "images" / "cam", exist_ok=True)
    cameras = {}
    for i, cam in enumerate(ds.cameras):
        name = f"cam/{i:04d}"
        img = (np.clip(ds.images[i], 0, 1)[:, :, ::-1] * 255).astype(np.uint8)
        cv2.imwrite(str(out / "images" / (name + ".jpg")), img)
        cameras[name] = {
            "K": cam["K"], "R": cam["R"], "T": cam["T"].reshape(3, 1),
            "H": 64, "W": 80, "dist": np.zeros((1, 5)),
        }
    write_camera(cameras, str(out))
    np.savez(
        out / "sparse.npz",
        xyz=ds.scene["xyz"],
        rgb=(ds.scene["colors"] * 255).astype(np.uint8),
    )
    return str(out)


def test_image_dataset_cache_and_scales(scene_dir):
    from log_tpu.dataset.colmap import ImageDataset

    ds = ImageDataset(
        root=scene_dir, cameras="", scales=[1, 2], znear=0.01, zfar=100.0,
        scale3d=1.0, ext=".jpg", share_camera=True,
    )
    assert len(ds) == 4
    assert os.path.exists(os.path.join(scene_dir, "cache.pkl"))
    assert os.path.exists(os.path.join(scene_dir, "cache", "2"))
    ds.set_state(scale=2)
    item = ds[0]
    assert item["image"].shape == (32, 40, 3)
    assert item["camera"]["image_width"] == 40
    # second construction reads the pickle cache
    ds2 = ImageDataset(
        root=scene_dir, cameras="", scales=[1, 2], znear=0.01, zfar=100.0,
        scale3d=1.0, ext=".jpg", share_camera=True,
    )
    assert len(ds2) == 4


def test_image_dataset_crop(scene_dir):
    from log_tpu.dataset.colmap import ImageDataset

    ds = ImageDataset(
        root=scene_dir, cameras="", scales=[1], znear=0.01, zfar=100.0,
        scale3d=1.0, ext=".jpg", share_camera=True, crop_size=[32, 48],
    )
    ds.set_state(scale=1)
    item = ds[1]
    assert item["image"].shape == (32, 48, 3)
    # K principal point shifted into the crop
    assert item["camera"]["image_width"] == 48


def test_camera_yaml_roundtrip(scene_dir):
    from log_tpu.dataset.camera_utils import read_cameras

    cams = read_cameras(scene_dir)
    assert len(cams) == 4
    c = cams["cam/0000"]
    assert c["K"].shape == (3, 3) and c["R"].shape == (3, 3)
    np.testing.assert_allclose(
        c["center"].reshape(3), (-c["R"].T @ c["T"]).reshape(3), atol=1e-6
    )


def test_demo_datasets(scene_dir):
    from log_tpu.dataset.demo import InterpolatePath, ShowLevel, ZoomInOut
    from log_tpu.dataset.overlook import LookAt, OverlookByScale

    interp = InterpolatePath(
        cameras=scene_dir, steps=12, scale=2,
        subs=["cam/0000", "cam/0001", "cam/0002", "cam/0003", "cam/0000"],
    )
    assert len(interp) == 12
    item = interp[3]
    assert item["camera"]["image_width"] == 40  # scale 2 of W=80
    zoom = ZoomInOut(
        cameras=scene_dir, sub="cam/0001", zranges=[-1.0, 1.0], steps=5
    )
    assert len(zoom) == 5
    show = ShowLevel(cameras=scene_dir, sub="cam/0000", steps=4, mode="pixel")
    it = show[1]
    assert "model_state" in it and "min_resolution_pixel" in it["model_state"]
    over = OverlookByScale(
        focal=100.0, shape=[64, 48], ground_height=0.0, step=3,
        scales=[0.5, 2.0],
    )
    assert len(over) == 3
    look = LookAt(
        K=[[100, 0, 32], [0, 100, 24], [0, 0, 1]], H=48, W=64, scale=1,
        lookat=[0, 0, 0], radius=[2.0, 4.0, 5], angle=30.0,
        ranges=[0, 360, 5],
    )
    assert len(look.infos) == 5


def test_interp_cameras(scene_dir):
    from log_tpu.dataset.camera_utils import interp_cameras, read_cameras

    cams = read_cameras(scene_dir)
    new = interp_cameras(cams, ["cam/0000", "cam/0002"], step=4)
    assert len(new) == 8
    for cam in new.values():
        R = cam["R"]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_mask_foreground_processing(rng):
    from log_tpu.render.renderer import MaskForeground

    r = MaskForeground(split="val", background=(1.0, 1.0, 1.0))
    H, W = 20, 26
    img = rng.random((1, H, W, 3)).astype(np.float32)
    mask = np.zeros((1, H, W), np.float32)
    mask[0, 5:15, 8:20] = 1.0
    batch = {"image": img, "mask": mask}
    gt = r.process_gt(batch)
    assert gt.shape == (1, 3, 10, 12)
    pred = rng.random((3, H, W)).astype(np.float32)
    cropped = r.process_pred(batch, pred)
    assert cropped.shape == (3, 10, 12)
