"""ShardedExecutor: host orchestration of the multi-chip production step.

Owns the PACKED, point-sharded device state (param columns, Adam moments,
counters, replicated tree + corrector) between steps so the per-step host
work is only camera staging — state never round-trips through host memory
except at densify / checkpoint / validation boundaries, where it syncs back
into the single-chip `LoG` model (whose host-side densify machinery —
LoG/model/splitter.py:138-205 semantics — then rebuilds and the executor
re-shards).

Used by Trainer when >1 device is visible (cfg.train.parallel), and by the
driver's `dryrun_multichip`.
"""
from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..model.gaussian import next_capacity
from ..model.level_of_gaussian import _host_lrs
from .sharded_step import (
    AXIS,
    ShardedStepConfig,
    _META_CACHE,
    _meta_for,
    _sharded_step_jit,
    make_flat_mesh,
    pack_columns,
    unpack_columns,
)


def stack_cameras(pcams):
    """Host camera dicts -> (cam_mats (B,2,4,4), cam_scalars (B,4),
    cam_center (B,3)) stacked arrays for the sharded step."""
    mats, scalars, centers = [], [], []
    for pc in pcams:
        H, W = int(pc["image_height"]), int(pc["image_width"])
        tx = math.tan(float(pc["FoVx"]) * 0.5)
        ty = math.tan(float(pc["FoVy"]) * 0.5)
        mats.append(np.stack([
            np.asarray(pc["world_view_transform"], np.float32),
            np.asarray(pc["full_proj_transform"], np.float32),
        ]))
        scalars.append([W / (2 * tx), H / (2 * ty), tx, ty])
        centers.append(np.asarray(pc["camera_center"], np.float32).reshape(3))
    return (
        np.stack(mats).astype(np.float32),
        np.stack(scalars).astype(np.float32),
        np.stack(centers).astype(np.float32),
    )


class ShardedExecutor:
    def __init__(self, model, n_devices: int | None = None,
                 cams_per_device: int = 1, backend: str | None = None,
                 check_cull: bool = True, check_scale: int | None = None):
        self.model = model
        self.mesh = make_flat_mesh(n_devices)
        self.n_devices = self.mesh.devices.size
        self.cams_per_device = int(cams_per_device)
        self.batch = self.n_devices * self.cams_per_device
        if backend is None:
            from ..ops import pick_backend

            backend = pick_backend(model.capacity)
        self.backend = backend
        self.check_cull = bool(check_cull)
        self.check_scale = (
            int(check_scale)
            if check_scale is not None
            else int(getattr(model, "check_render_scale", 1))
        )
        self._sh = NamedSharding(self.mesh, P(AXIS))
        self._rep = NamedSharding(self.mesh, P())
        self._bucket = None
        self.refresh_from_model()

    # ------------------------------------------------------------- state
    def _put(self, a, sharded=True):
        return jax.device_put(jnp.asarray(a), self._sh if sharded else self._rep)

    def refresh_from_model(self):
        """(Re)shard model state onto the mesh (after init/densify/load)."""
        model = self.model
        cap = model.capacity
        assert cap % self.n_devices == 0, (cap, self.n_devices)
        params = model.gaussian.params()
        self.meta_key = _meta_for(params, tuple(model.gaussian.keys))
        meta = _META_CACHE[self.meta_key]
        self.keys, self.dims, self.shapes = (
            meta["keys"], meta["dims"], meta["shapes"],
        )
        packed, _, _ = pack_columns(params, self.keys)
        m1, _, _ = pack_columns(model.optimizer.moments["exp_avg"], self.keys)
        m2, _, _ = pack_columns(
            model.optimizer.moments["exp_avg_sq"], self.keys
        )
        self.packed = self._put(packed)
        self.m1 = self._put(m1)
        self.m2 = self._put(m2)
        self.counter = {
            k: self._put(v) for k, v in model.counter.data.items()
        }
        self.tree_rep = {
            k: self._put(v, sharded=False)
            for k, v in model.tree.device_arrays(cap).items()
        }
        if model.tree.num_nodes > 0:
            if model.optimizer_cfg.get("opt_all_levels", True):
                leaf_opt = (model.tree.node_index == -1) & (
                    model.tree.depth > 0
                )
            else:
                leaf_opt = model.tree.depth == model.current_depth
            pad = np.zeros((cap,), bool)
            pad[: leaf_opt.shape[0]] = leaf_opt
            self.is_leaf_opt = self._put(pad, sharded=False)
        else:
            self.is_leaf_opt = self._put(np.zeros((cap,), bool), sharded=False)
        if model.view_correction is not None and model.view_correction.values.size:
            c = model.view_correction
            if not c._setup:
                c.training_setup()
            self.corr = {
                "values": self._put(c.values, sharded=False),
                "m1": self._put(c.exp_avg, sharded=False),
                "m2": self._put(c.exp_avg_sq, sharded=False),
                "vmax": self._put(c.max_exp_avg_sq, sharded=False),
                "steps": self._put(c.steps.astype(np.int32), sharded=False),
            }
        else:
            self.corr = {
                "values": self._put(np.ones((1, 3), np.float32), sharded=False),
                "m1": self._put(np.zeros((1, 3), np.float32), sharded=False),
                "m2": self._put(np.zeros((1, 3), np.float32), sharded=False),
                "vmax": self._put(np.zeros((1, 3), np.float32), sharded=False),
                "steps": self._put(np.zeros((1,), np.int32), sharded=False),
            }
        self._bucket = None

    def sync_to_model(self):
        """Write device state back into the LoG model (host authority)."""
        model = self.model
        params = unpack_columns(self.packed, self.keys, self.dims, self.shapes)
        for k, v in params.items():
            model.gaussian.set(k, v)
        mom1 = unpack_columns(self.m1, self.keys, self.dims, self.shapes)
        mom2 = unpack_columns(self.m2, self.keys, self.dims, self.shapes)
        model.optimizer.moments = {"exp_avg": mom1, "exp_avg_sq": mom2}
        model.counter.data = dict(self.counter)
        if model.view_correction is not None and model.view_correction.values.size:
            c = model.view_correction
            c.values = np.asarray(self.corr["values"])
            c.exp_avg = np.asarray(self.corr["m1"])
            c.exp_avg_sq = np.asarray(self.corr["m2"])
            c.max_exp_avg_sq = np.asarray(self.corr["vmax"])
            c.steps = np.asarray(self.corr["steps"]).astype(np.int64)
        model._bucket = None
        model._counts_dev = None
        model._refresh_device_caches()

    # -------------------------------------------------------------- step
    def _seed_bucket(self, camera):
        """First step of a stage: one single-chip prepare sizes the slice
        bucket (the same lagged-bucket scheme as training_iteration)."""
        self.sync_to_model()
        self.model.clear()
        vf = self.model.prepare_from_camera(camera)
        self._bucket = (max(vf["k_leaf"], 256), vf["k_node"])
        self.model.clear()

    def step(self, cameras, gts, view_indices=None, backgrounds=None,
             min_res=None):
        """One data-parallel step over up to `self.batch` cameras.

        cameras: list of <=batch host camera dicts (same H/W); padded with
          camera 0 at loss weight 0. gts: list of (3,H,W) or (H,W,3) images
          (f32 [0,1] or uint8).
        Returns (metrics dict of device scalars, counts (B,2) ndarray).
        """
        model = self.model
        B = self.batch
        n_real = len(cameras)
        assert 1 <= n_real <= B, (n_real, B)
        if self._bucket is None:
            self._seed_bucket(cameras[0])
        k_leaf, k_node = self._bucket
        cam_pad = list(cameras) + [cameras[0]] * (B - n_real)
        weight = np.zeros((B,), np.float32)
        weight[:n_real] = 1.0
        cam_mats, cam_scalars, cam_center = stack_cameras(cam_pad)
        gt_list = []
        for g in list(gts) + [gts[0]] * (B - n_real):
            g = np.asarray(g)
            if g.ndim == 3 and g.shape[0] != 3:
                g = g.transpose(2, 0, 1)
            gt_list.append(g)
        gt = np.stack(gt_list)
        if view_indices is None:
            view_indices = [0] * n_real
        vidx = np.zeros((B,), np.int32)
        vidx[:n_real] = np.asarray(view_indices, np.int32)
        if backgrounds is None:
            bg = np.zeros((B, 3), np.float32)
        else:
            bg = np.zeros((B, 3), np.float32)
            bg[:n_real] = np.asarray(backgrounds, np.float32).reshape(n_real, 3)
        if min_res is None:
            mr = np.full((B,), float(model.tree.min_resolution_pixel),
                         np.float32)
        else:
            mr = np.full((B,), float(model.tree.min_resolution_pixel),
                         np.float32)
            mr[:n_real] = np.asarray(min_res, np.float32)

        H, W = gt.shape[-2:]
        from ..ops import pick_max_pairs

        use_corr = (
            model.view_correction is not None
            and int(self.corr["values"].shape[0]) > 1
            and model.optimizer.global_steps >= model.base_iter
        )
        cfg = ShardedStepConfig(
            image_height=int(H), image_width=int(W), k_leaf=k_leaf,
            k_node=k_node, sh_degree=model.gaussian.active_sh_degree,
            n_devices=self.n_devices, cams_per_device=self.cams_per_device,
            mode="antialias", use_correction=use_corr,
            opt_keys=tuple(self.keys), backend=self.backend,
            max_pairs=pick_max_pairs(k_leaf + k_node),
            stage_has_tree=model.tree.num_nodes > 0,
            num_levels=(int(model.tree.depth.max()) + 1
                        if model.tree.num_points else 1),
            check_cull=self.check_cull, check_scale=self.check_scale,
            prep_backend=self.backend,
            prep_max_pairs=pick_max_pairs(model.capacity),
        )
        model.optimizer.global_steps += 1
        step = model.optimizer.global_steps
        host_lrs = _host_lrs(model.optimizer, step)
        model.lr = host_lrs.get("xyz", 0.0)
        lr_cols = jnp.concatenate([
            jnp.broadcast_to(
                jnp.asarray(host_lrs.get(k, 0.0), jnp.float32), (d,)
            )
            for k, d in zip(self.keys, self.dims)
        ])
        (self.packed, self.m1, self.m2, self.counter, self.corr, metrics,
         counts) = _sharded_step_jit(
            self.packed, self.m1, self.m2, self.counter, self.tree_rep,
            self.is_leaf_opt, jnp.int32(model.num_points),
            jnp.int32(model.current_depth), self._put(mr), self._put(cam_mats),
            self._put(cam_scalars), self._put(cam_center), self._put(bg),
            self._put(gt), self._put(weight),
            jnp.float32(max(float(weight.sum()), 1e-8)), lr_cols,
            jnp.float32(step), self.corr, self._put(vidx), cfg, self.meta_key,
        )
        # grow/shrink the bucket from this step's counts (one-step lag)
        c = np.asarray(counts)
        need_leaf = next_capacity(int(c[:n_real, 0].max()), 256)
        cmax_node = int(c[:n_real, 1].max())
        need_node = 0 if cmax_node == 0 else next_capacity(cmax_node, 256)
        bl, bn = self._bucket
        if need_leaf > bl or need_leaf * 2 < bl:
            bl = need_leaf
        if need_node > bn or need_node * 2 < bn:
            bn = need_node
        self._bucket = (bl, bn)
        return metrics, c


def toy_tree_model(n: int = 384, seed: int = 0):
    """Self-contained LoG model with a genuine 2-level tree (no files) —
    used by the driver dryrun."""
    from ..dataset.synthetic import random_gaussians
    from ..model.level_of_gaussian import LoG

    rng = np.random.default_rng(seed)
    scene = random_gaussians(n, rng)
    model = LoG(
        gaussian={"sh_degree": 1, "xyz_scale": 1.0},
        tree={"max_child": 4, "max_level": 30},
        optimizer={
            "optimize_keys": ["xyz", "colors", "scaling", "opacity",
                              "rotation", "shs"],
            "opt_all_levels": True,
            "lr_dict": {
                "xyz": 0.00016, "xyz_final": 0.0000016, "colors": 0.0025,
                "shs": 0.000125, "scaling": 0.005, "opacity": 0.05,
                "rotation": 0.001, "max_steps": 600,
            },
        },
        densify_and_remove={
            "upgrade_sh_iter": 10, "densify_from_iter": 1,
            "densify_every_iter": 1, "upgrade_repeat": 50,
            "init_split_method": "split_by_2d", "init_radius_min": 4,
            "init_radius_split": 16, "init_weight_min": 0.1, "min_steps": 50,
            "method": "naive", "split_grad_thres": 0.0002,
            "radius2d_thres": 6, "remove_weights_thres": 0.005,
            "max_split_points": 20000, "sort_method": "radii",
            "min_steps_split": 100, "scaling_decay": 0.9,
        },
    )
    scales = np.full((n,), float(scene["scaling"].mean()), np.float32)
    model.gaussian.register_by_pointcloud(
        scene["xyz"], scene["colors"], scales, init_opacity=0.3
    )
    model.counter.reset(model.num_points, model.capacity)
    model.training_setup()
    model.upgrade_tree()
    n0 = model.num_points
    cnt = {k: np.array(v) for k, v in model.counter.to_numpy(n0).items()}
    cnt["create_steps"][:] = 1000
    cnt["grad_sum"][:16] = 100.0
    cnt["area_sum"][:] = 1
    cnt["radii_max_max"][:16] = 10_000
    model.counter.set_numpy(cnt, model.capacity)
    model.update_depth_stage(0)
    return model
