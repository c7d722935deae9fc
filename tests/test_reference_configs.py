"""Load the ACTUAL reference YAML files byte-unchanged through Config +
load_object and instantiate the full object graph (VERDICT round-1 item 7).

The reference config tree (/root/reference/config) is copied verbatim into a
tmpdir (byte-equality asserted), a synthetic feicuiwan_sample_folder dataset
is built at exactly the paths the YAMLs name, and every load goes through the
same Config.load / update_global_variable / load_object path as apps/train.py.
"""
import os
import shutil

import numpy as np
import pytest

REF_CFG = "/root/reference/config"

VAL_NAMES = [
    "y/8y01073", "q/8q01283", "h/8h01559",
    "y/8y01755", "q/8q01543", "q/8q01330",
]
EXTRA_NAMES = ["y/8y00001", "h/8h00002"]
H, W = 64, 80  # divisible by every scale in dataset.yml (1, 2, 4, 8)


@pytest.fixture(scope="module")
def ref_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("refcfg")
    shutil.copytree(REF_CFG, root / "config")
    # the test is only meaningful on byte-identical copies
    for dirpath, _, files in os.walk(REF_CFG):
        for name in files:
            src = os.path.join(dirpath, name)
            rel = os.path.relpath(src, REF_CFG)
            with open(src, "rb") as f1, open(root / "config" / rel, "rb") as f2:
                assert f1.read() == f2.read(), rel

    import cv2

    from log_tpu.dataset.camera_utils import write_camera
    from log_tpu.dataset.synthetic import SyntheticDataset

    data = root / "data" / "feicuiwan_sample_folder"
    os.makedirs(data / "sparse" / "0", exist_ok=True)
    names = VAL_NAMES + EXTRA_NAMES
    ds = SyntheticDataset(n_gaussians=60, n_views=len(names), H=H, W=W, seed=5)
    cameras = {}
    for i, name in enumerate(names):
        cam = ds.cameras[i]
        img = (np.clip(ds.images[i], 0, 1)[:, :, ::-1] * 255).astype(np.uint8)
        imgpath = data / "images" / (name + ".JPG")
        os.makedirs(imgpath.parent, exist_ok=True)
        cv2.imwrite(str(imgpath), img)
        cameras[name] = {
            "K": cam["K"], "R": cam["R"], "T": cam["T"].reshape(3, 1),
            "H": H, "W": W, "dist": np.zeros((1, 5)),
        }
    # dataset.yml: cameras default 'sparse/0'; PLYNAME points into sparse/0
    write_camera(cameras, str(data / "sparse" / "0"))
    np.savez(
        data / "sparse" / "0" / "sparse.npz",
        xyz=ds.scene["xyz"],
        rgb=(ds.scene["colors"] * 255).astype(np.uint8),
    )
    return root


@pytest.fixture()
def ref_cfg(ref_tree, monkeypatch):
    monkeypatch.chdir(ref_tree)
    from log_tpu.utils.command import update_global_variable
    from log_tpu.utils.config import Config

    cfg = Config.load("config/example/test/train.yml")
    return update_global_variable(cfg, cfg)


def test_train_yml_structure(ref_cfg):
    cfg = ref_cfg
    assert cfg.exp == "output/example/test/log"
    assert cfg.max_steps == 750
    # $var substitution resolved the stage/render/dataset references
    assert cfg.train.render.module == "LoG.render.renderer.NaiveRendererAndLoss"
    assert list(cfg.train.stages.keys()) == ["init", "tree"]
    assert cfg.train.stages.init.dataset_state.scale == 8
    assert cfg.train.stages.tree.loader.args.iterations == 550
    assert cfg.train.stages.tree.model_state.enable_sh is True
    # max_steps propagated into the optimizer lr schedule via $max_steps
    assert cfg.model.args.optimizer.lr_dict.max_steps == 750


def test_model_instantiates(ref_cfg):
    from log_tpu.model.level_of_gaussian import LoG
    from log_tpu.utils.config import load_object

    model = load_object(ref_cfg.model.module, ref_cfg.model.args)
    assert isinstance(model, LoG)
    assert model.num_points == 60
    assert model.gaussian.max_sh_degree == 1
    assert model.view_correction is not None
    assert model.splitter.N == 4
    assert model.splitter.split_method == "uniform"
    assert model.densify_and_remove["max_split_points"] == 20000


def test_train_and_val_datasets_instantiate(ref_cfg):
    from log_tpu.dataset.colmap import ImageDataset
    from log_tpu.utils.config import load_object

    ds = load_object(ref_cfg.train.dataset.module, ref_cfg.train.dataset.args)
    assert isinstance(ds, ImageDataset)
    assert len(ds) == len(VAL_NAMES) + len(EXTRA_NAMES)
    ds.set_state(scale=8)
    item = ds[0]
    assert item["image"].shape == (H // 8, W // 8, 3)
    assert item["camera"]["image_width"] == W // 8

    val = load_object(
        ref_cfg.val_dataset.module, ref_cfg.val_dataset.args
    )
    assert len(val) == len(VAL_NAMES)
    val.set_state(scale=4)
    assert val[0]["image"].shape == (H // 4, W // 4, 3)


def test_renderer_and_demo_datasets_instantiate(ref_cfg):
    from log_tpu.dataset.demo import InterpolatePath, ShowLevel, ZoomInOut
    from log_tpu.render.renderer import NaiveRendererAndLoss
    from log_tpu.utils.config import load_object

    r = load_object(ref_cfg.train.render.module, ref_cfg.train.render.args)
    assert isinstance(r, NaiveRendererAndLoss)
    assert r.use_randback and not r.use_origin_render

    interp = load_object(
        ref_cfg.demo_interpolate.dataset.module,
        ref_cfg.demo_interpolate.dataset.args,
    )
    assert isinstance(interp, InterpolatePath) and len(interp) == 300
    assert interp[0]["camera"]["image_width"] == W // 4

    level = load_object(
        ref_cfg.demo_level.dataset.module, ref_cfg.demo_level.dataset.args
    )
    assert isinstance(level, ShowLevel) and len(level) == 10

    lod = load_object(
        ref_cfg.demo_lod.dataset.module, ref_cfg.demo_lod.dataset.args
    )
    assert isinstance(lod, ZoomInOut)


def test_train_wdepth_yml_merges(ref_tree, monkeypatch):
    """train_wdepth.yml overrides only dataset.module (+depth_scale) and the
    render block — the parent's dataset args must survive the merge."""
    monkeypatch.chdir(ref_tree)
    from log_tpu.utils.command import update_global_variable
    from log_tpu.utils.config import Config

    cfg = Config.load("config/example/test/train_wdepth.yml")
    cfg = update_global_variable(cfg, cfg)
    assert cfg.train.dataset.module == "LoG.dataset.colmap.DepthDataset"
    assert cfg.train.dataset.args.depth_scale == 8
    assert cfg.train.dataset.args.root == "data/feicuiwan_sample_folder"
    assert cfg.train.dataset.args.scales == [1, 2, 4, 8]
    assert cfg.train.render.args.render_depth is True


def test_campus_configs_parse(ref_tree, monkeypatch):
    monkeypatch.chdir(ref_tree)
    from log_tpu.utils.command import update_global_variable
    from log_tpu.utils.config import Config

    cfg = Config.load("config/example/Campus/train.yml")
    cfg = update_global_variable(cfg, cfg)
    assert cfg.model.args.densify_and_remove.upgrade_repeat == 5
    assert cfg.model.args.densify_and_remove.max_split_points == 100000
    assert cfg.train.render.module == "LoG.render.renderer.NaiveRendererAndLoss"


def test_const_freeze_and_no_merge():
    """yacs parity: `_const_: True` freezes a node against attribute-style
    assignment (reference yacs.py:95-97, 138-141); `_no_merge_: True`
    replaces the target node instead of key-merging (yacs.py:431-435)."""
    from log_tpu.utils.config import CfgNode

    n = CfgNode({"a": {"_const_": True, "x": 1}, "b": {"y": 2}})
    assert n.a.x == 1 and "_const_" not in n.a
    assert n.a.is_frozen() and not n.b.is_frozen()
    import pytest as _pytest

    with _pytest.raises(AttributeError):
        n.a.x = 5
    n.b.y = 3  # unfrozen nodes stay writable
    n.merge_from_other_cfg(CfgNode({"b": {"_no_merge_": True, "z": 9}}))
    assert dict(n.b) == {"z": 9}
