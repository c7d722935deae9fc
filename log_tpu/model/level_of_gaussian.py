"""LoG: the level-of-Gaussians composite model (orchestrator).

API + schedule semantics mirror LoG/model/level_of_gaussian.py:174-592. The
hot per-step path is fully jitted (see train_step.py); this class owns:
  * per-camera visibility preparation (jit call + bucket selection),
  * the densify / SH-upgrade / tree-upgrade schedule (host),
  * split/remove policies over host arrays (update_init_stage /
    update_depth_stage / upgrade_tree),
  * checkpoint (de)serialization with reference-compatible key names.
"""
from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from .corrector import Corrector
from .counter import Counter, str_min_mean_max
from .gaussian import GaussianPoint, next_capacity
from .sparse_optimizer import SparseOptimizer, expon_lr
from .splitter import Splitter
from .tensor_tree import TensorTree
from .train_step import StepConfig, fused_train_step, prepare_visibility

MIN_PIXEL = 3


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


class LoG:
    def __init__(
        self,
        gaussian: dict,
        tree: dict,
        optimizer: dict,
        densify_and_remove: dict,
        use_view_correction: bool = False,
        check_render_scale: int = 1,
    ):
        self.optimizer_cfg = dict(optimizer)
        self.gaussian = GaussianPoint(**gaussian)
        self.tree = TensorTree(**tree)
        self.counter = Counter(self.gaussian.capacity)
        # the reference hardcodes split_method='uniform'
        # (LoG/model/level_of_gaussian.py:182); we additionally let YAML
        # select 'sample' (LoG/model/splitter.py:59-93) via densify_and_remove
        self.splitter = Splitter(
            N=tree.get("max_child", 2),
            split_method=densify_and_remove.get("split_method", "uniform"),
        )
        self.densify_and_remove = dict(densify_and_remove)
        # densification random draws run under the global seed set by
        # seed_everything (reference: torch global seed,
        # LoG/model/level_of_gaussian.py:413-414) — derive a stream from it
        # so two identical seeded runs densify identically
        self._rng = np.random.default_rng(np.random.randint(0, 2**31 - 1))
        self.fix_parent = True
        self.use_view_correction = use_view_correction
        self.view_correction = Corrector(use_view_correction) if use_view_correction else None
        self.check_render_scale = check_render_scale
        # weight-cull refresh cadence for the fused inference frame:
        # 1 = per frame (reference semantics); K > 1 caches the capacity-
        # axis cull mask for K frames (the cull is a conservative 1e-8
        # occlusion test, so staleness changes the image below 8-bit
        # visibility) and the frame pays neither the check render nor the
        # slice-axis weight gather — see fused_root_cull
        self.check_render_every = 1
        self._cull_mask_dev = None
        self._cull_frame_i = 0
        self._cull_bucket = None
        self._block_cache = None
        self._layout_optimized = False
        self._cull_seg_starts = None
        self.current_depth = 0
        self.training = True
        self.stage_name = "init"
        self.base_iter = 1
        self.optimizer: SparseOptimizer | None = None
        self.lr = 0.0
        self.visibility_flag = None
        self._tree_dev = None
        self._leaf_opt_dev = None
        self._bucket = None  # lagged (k_leaf, k_node) for the merged step
        self._counts_dev = None

    # ------------------------------------------------------------ basics
    @property
    def num_points(self) -> int:
        return self.gaussian.num_points

    @property
    def capacity(self) -> int:
        return self.gaussian.capacity

    def train(self):
        self.training = True

    def eval(self):
        self.training = False

    def clear(self):
        self.visibility_flag = None

    def __repr__(self):
        scal = np.asarray(self.gaussian.get("scaling"))[: self.num_points]
        radius = np.exp(scal).max(axis=-1)
        opac = _sigmoid(np.asarray(self.gaussian.get("opacity"))[: self.num_points, 0])
        return (
            f"Gaussian {self.num_points} points\n"
            f"    radius [{radius.min():.4f}~{radius.mean():.4f}~{radius.max():.4f}]\n"
            f"    opacity: {opac.mean():.2f}, {(opac < 0.05).sum()} < 0.05, "
            f"{(opac < 0.1).sum()} < 0.1, "
        )

    # ----------------------------------------------------- state schedule
    def set_stage(self, stage_name: str):
        self.stage_name = stage_name
        self._bucket = None
        self._counts_dev = None

    def set_state(
        self,
        active_sh_degree=None,
        enable_sh=None,
        min_resolution_pixel=None,
        current_depth=None,
        scaling_modifier=1.0,
        log_query=None,
        reset_created_steps=False,
        check_render_every=None,
    ):
        if active_sh_degree is not None or enable_sh is not None:
            if enable_sh:
                self.gaussian.active_sh_degree = self.gaussian.max_sh_degree
            else:
                self.gaussian.active_sh_degree = min(
                    int(active_sh_degree), self.gaussian.max_sh_degree
                )
            print(
                f"[{self.__class__.__name__}] active_sh_degree: "
                f"{self.gaussian.active_sh_degree}"
            )
        if reset_created_steps:
            self.counter.reset_create_steps()
            print(f"[{self.__class__.__name__}] reset created steps")
        if min_resolution_pixel is not None:
            self.tree.min_resolution_pixel = float(min_resolution_pixel)
        if current_depth is not None:
            self.current_depth = int(current_depth)
            print(
                f"[{self.__class__.__name__}] set current depth -> "
                f"{self.current_depth}"
            )
        if log_query is not None:
            self.tree.log_query = bool(log_query)
        if check_render_every is not None:
            self.check_render_every = int(check_render_every)
            self._cull_mask_dev = None

    # ------------------------------------------------------- device caches
    @property
    def cut_method(self) -> str:
        """'flat' (one-gather cut via the parent-attr cache) unless the
        config opted out or parents are optimized (opt_all_levels=False puts
        depth==current_depth parents in the Adam set, which would stale the
        cache between densifies)."""
        cm = getattr(self.tree, "cut_method", "flat")
        if cm not in ("flat", "flat_slice"):
            return "traverse"
        if not self.optimizer_cfg.get("opt_all_levels", True):
            return "traverse"
        return cm

    @property
    def cut_method_train(self) -> str:
        """The training/two-phase-prepare paths run the weight cull on the
        capacity axis; 'flat_slice' (slice-axis cull) is render-only for
        now."""
        cm = self.cut_method
        return "flat" if cm == "flat_slice" else cm

    @property
    def n_roots_bucket(self) -> int:
        """Static row-count bucket covering the root prefix [0, n_roots)."""
        from .gaussian import next_capacity

        n = int(self.tree.root_index.shape[0]) if self.tree.num_points else 0
        if n == 0:
            return 0
        return min(next_capacity(n, 256), self.capacity)

    def _refresh_device_caches(self):
        self._cull_mask_dev = None  # state changed: stale cull mask
        cap = self.capacity
        self._tree_dev = self.tree.device_arrays(cap) if self.tree.num_points else None
        if self.tree.num_points:
            if self.optimizer_cfg.get("opt_all_levels", True):
                leaf_opt = (self.tree.node_index == -1) & (self.tree.depth > 0)
            else:
                leaf_opt = self.tree.depth == self.current_depth
            pad = np.zeros((cap,), bool)
            pad[: leaf_opt.shape[0]] = leaf_opt
            self._leaf_opt_dev = jnp.asarray(pad)
            if self.cut_method in ("flat", "flat_slice"):
                self.tree.ensure_root_id()
                rid = np.zeros((cap,), np.int32)
                rid[: self.tree.root_id.shape[0]] = self.tree.root_id
                self._tree_dev["root_id"] = jnp.asarray(rid)
                # parent-attribute cache (device gather, densify cadence):
                # parents are frozen between densifies, so their projected
                # radius can be computed without per-frame parent gathers
                parent = np.arange(cap, dtype=np.int32)
                ip = self.tree.index_parent
                nz = ip >= 0
                parent[: ip.shape[0]][nz] = ip[nz]
                parent_dev = jnp.asarray(parent)
                params = self.gaussian.params()
                self._tree_dev["parent_xyz"] = jnp.take(
                    params["xyz"], parent_dev, axis=0
                )
                self._tree_dev["parent_scaling"] = jnp.take(
                    params["scaling"], parent_dev, axis=0
                )
                self._tree_dev["parent_rotation"] = jnp.take(
                    params["rotation"], parent_dev, axis=0
                )
                # per-point root-center cache (flat_slice cut)
                self._tree_dev["root_xyz"] = jnp.take(
                    params["xyz"],
                    jnp.clip(self._tree_dev["root_id"], 0, cap - 1),
                    axis=0,
                )
                seg = getattr(self, "_cull_seg_starts", None)
                if seg is not None:
                    # static segment starts (root_major layout): rows past
                    # the known roots scatter at num_points (dead rows)
                    pad_seg = np.full(cap, self.num_points, np.int32)
                    pad_seg[: seg.shape[0]] = seg
                    self._tree_dev["cull_seg_starts"] = jnp.asarray(pad_seg)
                if getattr(self, "_layout_optimized", False):
                    from .block_render import (
                        block_size_for, build_block_cache,
                    )

                    S = block_size_for(cap)
                    cols, meta = build_block_cache(
                        params, self._tree_dev, self._leaf_opt_dev,
                        jnp.int32(self.num_points), S,
                    )
                    self._block_cache = {"cols": cols, "meta": meta, "S": S}
                    self._kb_bucket = None
        else:
            self._leaf_opt_dev = jnp.zeros((cap,), bool)

    def tree_device(self):
        if self._tree_dev is None and self.tree.num_points:
            self._refresh_device_caches()
        return self._tree_dev

    # -------------------------------------------------------- preparation
    def prepare_from_camera(self, camera: dict):
        """Visibility + LoD cut for one camera; stores bucketed keep flags."""
        from ..render.renderer import camera_device

        cam = camera_device(camera)
        stage_has_tree = self.tree.num_nodes > 0
        if stage_has_tree and self._tree_dev is None:
            self._refresh_device_caches()
        if stage_has_tree:
            tree_arrays = self._tree_dev
            leaf_opt = self._leaf_opt_dev
            num_levels = int(self.tree.depth.max()) + 1 if self.tree.num_points else 1
        else:
            cap = self.capacity
            tree_arrays = {
                "node_index": jnp.zeros((cap,), jnp.int32),
                "index_parent": jnp.zeros((cap,), jnp.int32),
                "depth": jnp.zeros((cap,), jnp.int32),
            }
            leaf_opt = jnp.zeros((cap,), bool)
            num_levels = 1
        from ..ops import pick_backend, pick_max_pairs

        keep_leaf, keep_node, counts = prepare_visibility(
            self.gaussian.params(),
            tree_arrays,
            cam,
            jnp.int32(self.num_points),
            leaf_opt,
            jnp.float32(self.tree.min_resolution_pixel),
            jnp.int32(self.current_depth),
            cam["image_height"],
            cam["image_width"],
            stage_has_tree,
            num_levels,
            backend=pick_backend(self.capacity),
            max_pairs=pick_max_pairs(self.capacity),
            check_scale=int(getattr(self, "check_render_scale", 1)),
            cut_method=self.cut_method_train if stage_has_tree else "traverse",
            n_roots=self.n_roots_bucket if stage_has_tree else 0,
        )
        c = np.asarray(counts)
        k_leaf = next_capacity(int(c[0]), 256)
        k_node = 0 if int(c[1]) == 0 else next_capacity(int(c[1]), 256)
        self.visibility_flag = {
            "keep_leaf": keep_leaf,
            "keep_node": keep_node,
            "keep_mask": keep_leaf | keep_node,
            "counts": (int(c[0]), int(c[1])),
            "k_leaf": k_leaf,
            "k_node": k_node,
        }
        return self.visibility_flag

    # alias used by renderer.vis
    prepare = prepare_from_camera

    # ----------------------------------------------------- training setup
    def training_setup(self):
        if self.optimizer is not None:
            print(f"[{self.__class__.__name__}] optimizer is already setup")
            self.counter.reset(self.num_points, self.capacity)
            return 0
        cfg = dict(self.optimizer_cfg)
        lr_dict = dict(cfg["lr_dict"])
        lr_dict["max_steps"] = int(lr_dict["max_steps"]) * self.base_iter
        self.optimizer = SparseOptimizer(
            cfg["optimize_keys"],
            lr_dict,
            self.gaussian,
            xyz_scale=self.gaussian.xyz_scale,
        )
        print(
            f"[{self.__class__.__name__}] optimizer setup: max steps = "
            f"{lr_dict['max_steps']}"
        )
        self.lr = lr_dict["xyz"]
        self.counter.reset(self.num_points, self.capacity)
        if self.view_correction is not None:
            self.view_correction.training_setup()

    # ------------------------------------------------------- fused step
    def train_step(self, camera: dict, gt_image, background, mask_ignore=None,
                   view_index: int = 0, gt_depth=None, render_depth=False,
                   fg_mask=None):
        """One fused optimization step. Requires prepare_from_camera first."""
        from ..render.renderer import camera_device

        assert self.visibility_flag is not None, "call prepare_from_camera first"
        assert self.optimizer is not None, "call training_setup first"
        vf = self.visibility_flag
        cam = camera_device(camera)
        from ..ops import pick_backend, pick_max_pairs

        k_total = vf["k_leaf"] + vf["k_node"]
        cfg = StepConfig(
            image_height=cam["image_height"],
            image_width=cam["image_width"],
            k_leaf=vf["k_leaf"],
            k_node=vf["k_node"],
            sh_degree=self.gaussian.active_sh_degree,
            mode="antialias",
            # the reference steps the per-view gain only after base_iter
            # (LoG/model/level_of_gaussian.py:395-398); before that the gain
            # is 1.0, so gating apply+update together is equivalent
            use_correction=(
                self.view_correction is not None
                and self.view_correction.values.shape[0] > 0
                and self.optimizer.global_steps >= self.base_iter
            ),
            has_mask=mask_ignore is not None,
            opt_keys=tuple(k for k in self.gaussian.keys),
            backend=pick_backend(k_total),
            max_pairs=pick_max_pairs(k_total),
            render_depth=render_depth and gt_depth is not None,
            crop_loss=fg_mask is not None,
            spilled=self.optimizer.spilled,
        )
        m_slices = None
        if self.optimizer.spilled:
            # host-moment (spill) mode: gather the visible rows' moment
            # slices on the host before the step (reference CPU-offload
            # analog, LoG/model/splitter.py:198-204). Index order matches
            # _compact_slices_sort: kept positions ascending, padded with
            # the cap sentinel.
            host_index = _host_compact_index(
                np.asarray(vf["keep_leaf"]), cfg.k_leaf, self.capacity
            )
            if cfg.k_node > 0:
                host_index = np.concatenate([
                    host_index,
                    _host_compact_index(
                        np.asarray(vf["keep_node"]), cfg.k_node, self.capacity
                    ),
                ])
            m_slices = self.optimizer.host_gather(host_index)
        fg_dev = bbox_dev = None
        if fg_mask is not None:
            fg_dev, bbox_dev = _fg_mask_bbox(
                fg_mask, cam["image_height"], cam["image_width"]
            )
        self.optimizer.global_steps += 1
        step = self.optimizer.global_steps
        host_lrs = _host_lrs(self.optimizer, step)
        lrs = {k: jnp.asarray(v, jnp.float32) for k, v in host_lrs.items()}
        self.lr = host_lrs.get("xyz", 0.0)
        self.optimizer.xyz_lr = self.lr
        corr_state = self._corr_device_state() if cfg.use_correction else {
            "values": jnp.ones((1, 3), jnp.float32),
            "m1": jnp.zeros((1, 3), jnp.float32),
            "m2": jnp.zeros((1, 3), jnp.float32),
            "vmax": jnp.zeros((1, 3), jnp.float32),
            "steps": jnp.zeros((1,), jnp.int32),
        }
        mask = (
            jnp.asarray(mask_ignore)[None]
            if mask_ignore is not None
            else jnp.ones((1, 1, 1), jnp.float32)
        )
        depth_arr = (
            jnp.asarray(gt_depth)
            if cfg.render_depth
            else jnp.ones((1, 1), jnp.float32)
        )
        params, moments, counter, corr_state, metrics, aux = fused_train_step(
            self.gaussian.params(),
            self.optimizer.moments,
            self.counter.data,
            vf["keep_leaf"],
            vf["keep_node"],
            cam,
            jnp.asarray(gt_image),
            jnp.asarray(background),
            lrs,
            jnp.float32(step),
            corr_state,
            jnp.int32(view_index),
            mask,
            depth_arr,
            jax.random.PRNGKey(int(step)),
            cfg,
            fg_mask=fg_dev,
            bbox=bbox_dev,
            m_slices=m_slices,
        )
        for k, v in params.items():
            self.gaussian.set(k, v)
        self.optimizer.moments = moments
        self.counter.data = counter
        if cfg.spilled:
            self.optimizer.host_scatter(
                host_index, aux.pop("m_slices"),
                np.asarray(aux.pop("update_mask")),
            )
        if cfg.use_correction:
            self._corr_dev = corr_state
        return metrics, aux

    def training_iteration(
        self,
        camera: dict,
        gt_image,
        background,
        mask_ignore=None,
        view_index: int = 0,
        gt_depth=None,
        render_depth: bool = False,
        fg_mask=None,
    ):
        """One training step with visibility fused into the same executable.

        The slice bucket lags one step behind the actual visible counts
        (temporal coherence across consecutive training cameras); the first
        step of a stage seeds it with a standalone prepare."""
        from ..render.renderer import camera_device
        from ..ops import pick_backend, pick_max_pairs

        if self.optimizer is not None and self.optimizer.spilled:
            # spill (host-moment) mode needs the visible index on the host
            # BEFORE the step — use the two-phase prepare + step path
            self.prepare_from_camera(camera)
            return self.train_step(
                camera, gt_image, background, mask_ignore=mask_ignore,
                view_index=view_index, gt_depth=gt_depth,
                render_depth=render_depth, fg_mask=fg_mask,
            )
        if self._bucket is None:
            self.prepare_from_camera(camera)
            vf = self.visibility_flag
            self._bucket = (vf["k_leaf"], vf["k_node"])
            return self.train_step(
                camera, gt_image, background, mask_ignore=mask_ignore,
                view_index=view_index, gt_depth=gt_depth,
                render_depth=render_depth, fg_mask=fg_mask,
            )
        # refresh the bucket from last step's counts (device array has had a
        # full step to materialize — cheap fetch)
        if self._counts_dev is not None:
            c = np.asarray(self._counts_dev)
            k_leaf = next_capacity(int(c[0]), 256)
            k_node = 0 if int(c[1]) == 0 else next_capacity(int(c[1]), 256)
            bl, bn = self._bucket
            if k_leaf > bl or (k_leaf * 2 < bl):
                bl = k_leaf
            if k_node > bn or (k_node * 2 < bn):
                bn = k_node
            self._bucket = (bl, bn)
        assert self.optimizer is not None, "call training_setup first"
        cam = camera_device(camera)
        stage_has_tree = self.tree.num_nodes > 0
        if stage_has_tree and self._tree_dev is None:
            self._refresh_device_caches()
        if stage_has_tree:
            tree_arrays = self._tree_dev
            leaf_opt = self._leaf_opt_dev
            num_levels = int(self.tree.depth.max()) + 1
        else:
            cap = self.capacity
            tree_arrays = {
                "node_index": jnp.zeros((cap,), jnp.int32),
                "index_parent": jnp.zeros((cap,), jnp.int32),
                "depth": jnp.zeros((cap,), jnp.int32),
            }
            leaf_opt = jnp.zeros((cap,), bool)
            num_levels = 1
        k_leaf, k_node = self._bucket
        k_total = k_leaf + k_node
        cfg = StepConfig(
            image_height=cam["image_height"],
            image_width=cam["image_width"],
            k_leaf=k_leaf,
            k_node=k_node,
            sh_degree=self.gaussian.active_sh_degree,
            mode="antialias",
            use_correction=(
                self.view_correction is not None
                and self.view_correction.values.shape[0] > 0
                and self.optimizer.global_steps >= self.base_iter
            ),
            has_mask=mask_ignore is not None,
            opt_keys=tuple(self.gaussian.keys),
            backend=pick_backend(k_total),
            max_pairs=pick_max_pairs(k_total),
            render_depth=render_depth and gt_depth is not None,
            crop_loss=fg_mask is not None,
        )
        fg_dev = bbox_dev = None
        if fg_mask is not None:
            fg_dev, bbox_dev = _fg_mask_bbox(
                fg_mask, cam["image_height"], cam["image_width"]
            )
        self.optimizer.global_steps += 1
        step = self.optimizer.global_steps
        host_lrs = _host_lrs(self.optimizer, step)
        lrs = {k: jnp.asarray(v, jnp.float32) for k, v in host_lrs.items()}
        self.lr = host_lrs.get("xyz", 0.0)
        corr_state = self._corr_device_state() if cfg.use_correction else {
            "values": jnp.ones((1, 3), jnp.float32),
            "m1": jnp.zeros((1, 3), jnp.float32),
            "m2": jnp.zeros((1, 3), jnp.float32),
            "vmax": jnp.zeros((1, 3), jnp.float32),
            "steps": jnp.zeros((1,), jnp.int32),
        }
        mask = (
            jnp.asarray(mask_ignore)[None]
            if mask_ignore is not None
            else jnp.ones((1, 1, 1), jnp.float32)
        )
        depth_arr = (
            jnp.asarray(gt_depth)
            if cfg.render_depth
            else jnp.ones((1, 1), jnp.float32)
        )
        from .train_step import fused_prepare_train_step

        params, moments, counter, corr_state, metrics, aux = (
            fused_prepare_train_step(
                self.gaussian.params(),
                self.optimizer.moments,
                self.counter.data,
                tree_arrays,
                jnp.int32(self.num_points),
                leaf_opt,
                jnp.float32(self.tree.min_resolution_pixel),
                jnp.int32(self.current_depth),
                cam,
                jnp.asarray(gt_image),
                jnp.asarray(background),
                lrs,
                jnp.float32(step),
                corr_state,
                jnp.int32(view_index),
                mask,
                depth_arr,
                jax.random.PRNGKey(int(step)),
                stage_has_tree,
                num_levels,
                pick_backend(self.capacity),
                pick_max_pairs(self.capacity),
                int(self.check_render_scale),
                cfg,
                fg_mask=fg_dev,
                bbox=bbox_dev,
                cut_method=self.cut_method_train if stage_has_tree else "traverse",
                n_roots=self.n_roots_bucket if stage_has_tree else 0,
            )
        )
        for k, v in params.items():
            self.gaussian.set(k, v)
        self.optimizer.moments = moments
        self.counter.data = counter
        if cfg.use_correction:
            self._corr_dev = corr_state
        self._counts_dev = metrics["counts"]
        # start the device->host copy now so next step's bucket refresh reads
        # a local buffer instead of paying a blocking fetch round-trip
        try:
            self._counts_dev.copy_to_host_async()
        except (AttributeError, RuntimeError):
            pass
        self.visibility_flag = {"keep_mask": aux["keep_mask"]}
        return metrics, aux

    def render_fused(self, camera: dict, background):
        """Inference frame: cut + gather + render in ONE executable (zero
        per-frame host syncs; the demo/viewer hot path). Returns a dict with
        'render' (3,H,W) and 'alpha' (H,W) device arrays."""
        from ..ops import pick_backend, pick_max_pairs
        from ..render.renderer import camera_device
        from .gaussian import next_capacity
        from .train_step import fused_prepare_render

        cam = camera_device(camera)
        stage_has_tree = self.tree.num_nodes > 0
        if self._tree_dev is None or (
            stage_has_tree
            and self.cut_method in ("flat", "flat_slice")
            and "parent_xyz" not in self._tree_dev
        ):
            self._refresh_device_caches()
        if getattr(self, "_render_bucket", None) is None:
            vf = self.prepare_from_camera(camera)
            self._render_bucket = next_capacity(
                int(sum(vf["counts"]) * 1.2), 1 << 14
            )
            self._render_counts_dev = None
        elif getattr(self, "_render_counts_dev", None) is not None:
            c = np.asarray(self._render_counts_dev)
            need = next_capacity(int(c[:2].sum() * 1.2), 1 << 14)
            b = self._render_bucket
            if need > b or need * 2 < b:
                self._render_bucket = need
            # pair-budget right-sizing: counts[2] is last frame's UNCLAMPED
            # pair demand (incl. forced prefix dummies); provisioning from
            # it instead of k_vis*6 shrinks the pair sort/expansion/pack
            # proportionally. 1.3x headroom, shrink only below half.
            if len(c) > 2 and c[2] > 0:
                pneed = pick_max_pairs(int(c[2] * 1.3), per_point=1)
                pb = getattr(self, "_pair_bucket", None)
                if pb is None or pneed > pb or pneed * 2 < pb:
                    self._pair_bucket = pneed
            # block-path bucket: counts[3] = eligible blocks last frame
            if len(c) > 3 and self._block_cache is not None:
                S = self._block_cache["S"]
                B = self.capacity // S
                kb = getattr(self, "_kb_bucket", None) or B
                need = min(B, max(16, -(-int(c[3] * 1.1) // 16) * 16))
                if need > kb or need * 2 < kb:
                    self._kb_bucket = need
        # static alive-bucket: sorts/dense passes run over [:cap_sort]
        # instead of the full capacity (up to ~30% of the frame when the
        # capacity bucket has headroom); recompiles only at bucket jumps
        cap_sort = min(
            self.capacity, -(-self.num_points // (1 << 18)) * (1 << 18)
        )
        k_vis = min(self._render_bucket, self.capacity, cap_sort)
        backend = pick_backend(self.capacity)
        if stage_has_tree:
            tree_arrays = self._tree_dev
            num_levels = int(self.tree.depth.max()) + 1
        else:
            cap = self.capacity
            tree_arrays = {
                "node_index": jnp.zeros((cap,), jnp.int32),
                "index_parent": jnp.zeros((cap,), jnp.int32),
                "depth": jnp.zeros((cap,), jnp.int32),
            }
            num_levels = 1
        use_blocks = (
            getattr(self, "_layout_optimized", False)
            and self._block_cache is not None
            and stage_has_tree
            and self.cut_method == "flat_slice"
            and self.gaussian.active_sh_degree == 0
            and backend == "tiled"
            # block machinery amortizes past ~64k rows; tiny scenes keep
            # the plain fused frame
            and self.capacity >= (1 << 16)
        )
        w_full = None
        K = int(getattr(self, "check_render_every", 1))
        if stage_has_tree and self.cut_method == "flat_slice":
            # cull-first, the reference op order (render_to_check BEFORE
            # traverse, LoG/model/level_of_gaussian.py:229-243): K == 1
            # refreshes the capacity-axis mask EVERY frame (per-frame
            # semantics); K > 1 amortizes. The expansion is gather-free
            # under the root_major layout (expand_weight_full).
            from .train_step import fused_root_cull

            # block path reshapes the mask (B, S): compute it at FULL
            # capacity there (no per-frame pad op — eager ops cost an RTT
            # through the tunnel)
            cull_bucket = 0 if use_blocks else cap_sort
            if (
                self._cull_mask_dev is None
                or self._cull_bucket != cull_bucket
                or self._cull_frame_i % K == 0
            ):
                self._cull_mask_dev = fused_root_cull(
                    self.gaussian.params(), tree_arrays, cam,
                    jnp.int32(self.num_points),
                    cam["image_height"], cam["image_width"],
                    prep_backend=backend,
                    prep_max_pairs=pick_max_pairs(self.capacity, per_point=1),
                    check_scale=int(getattr(self, "check_render_scale", 1)),
                    n_roots=self.n_roots_bucket,
                    cap_sort=cull_bucket,
                )
                self._cull_bucket = cull_bucket
            self._cull_frame_i += 1
            w_full = self._cull_mask_dev
        if use_blocks:
            # block-pruned frame: per-frame cost scales with the eligible
            # working set (block_render.py). Per-frame weight cull is not
            # supported on this path — it needs check_render_every > 1
            # (w_full) or no cull; otherwise fall through.
            from .block_render import render_blocks

            S = self._block_cache["S"]
            B = self.capacity // S
            kb = getattr(self, "_kb_bucket", None) or B
            mp = min(
                pick_max_pairs(k_vis, per_point=6),
                getattr(self, "_pair_bucket", None)
                or pick_max_pairs(k_vis, per_point=6),
            )
            render, alpha, counts = render_blocks(
                self._block_cache["cols"],
                self._block_cache["meta"],
                cam,
                jnp.float32(self.tree.min_resolution_pixel),
                jnp.int32(self.current_depth),
                jnp.asarray(background, jnp.float32),
                cam["image_height"], cam["image_width"],
                k_blocks=kb, k_visible=k_vis, max_pairs=mp,
                w_full=w_full,
            )
            self._render_counts_dev = counts
            try:
                counts.copy_to_host_async()
            except (AttributeError, RuntimeError):
                pass
            return {"render": render, "alpha": alpha}
        render, alpha, counts = fused_prepare_render(
            self.gaussian.params(),
            tree_arrays,
            cam,
            jnp.int32(self.num_points),
            self._leaf_opt_dev,
            jnp.float32(self.tree.min_resolution_pixel),
            jnp.int32(self.current_depth),
            jnp.asarray(background, jnp.float32),
            cam["image_height"],
            cam["image_width"],
            k_visible=k_vis,
            sh_degree=self.gaussian.active_sh_degree,
            stage_has_tree=stage_has_tree,
            num_levels=num_levels,
            backend=backend,
            max_pairs=min(
                pick_max_pairs(k_vis, per_point=6),
                getattr(self, "_pair_bucket", None)
                or pick_max_pairs(k_vis, per_point=6),
            ),
            check_scale=int(getattr(self, "check_render_scale", 1)),
            cut_method=self.cut_method if stage_has_tree else "traverse",
            n_roots=self.n_roots_bucket if stage_has_tree else 0,
            prep_backend=backend,
            prep_max_pairs=pick_max_pairs(self.capacity, per_point=1),
            cap_sort=cap_sort,
            w_full=w_full,
        )
        self._render_counts_dev = counts
        try:
            counts.copy_to_host_async()
        except (AttributeError, RuntimeError):
            pass
        return {"render": render, "alpha": alpha}

    def _corr_device_state(self):
        """Per-view correction Adam state, device-resident across steps."""
        if getattr(self, "_corr_dev", None) is None:
            c = self.view_correction
            if not c._setup:
                c.training_setup()
            self._corr_dev = {
                "values": jnp.asarray(c.values),
                "m1": jnp.asarray(c.exp_avg),
                "m2": jnp.asarray(c.exp_avg_sq),
                "vmax": jnp.asarray(c.max_exp_avg_sq),
                "steps": jnp.asarray(c.steps, jnp.int32),
            }
        return self._corr_dev

    def _sync_corrector_to_host(self):
        if getattr(self, "_corr_dev", None) is not None:
            c = self.view_correction
            c.values = np.asarray(self._corr_dev["values"])
            c.exp_avg = np.asarray(self._corr_dev["m1"])
            c.exp_avg_sq = np.asarray(self._corr_dev["m2"])
            c.max_exp_avg_sq = np.asarray(self._corr_dev["vmax"])
            c.steps = np.asarray(self._corr_dev["steps"]).astype(np.int64)

    # ------------------------------------------------------------- init
    def at_init_start(self):
        self.num_views = 0

    def init_view(self, camera: dict):
        """Accumulate per-point min 3D radius from one view
        (LoG/model/level_of_gaussian.py:55-63, 328-332)."""
        from ..render.renderer import camera_device
        from ..ops import gaussian_math as gm

        cam = camera_device(camera)
        params = self.gaussian.params()
        valid, r3d = _init_radius3d_jit(
            params["xyz"],
            params["scaling"],
            params["rotation"],
            cam["world_view"],
            cam["full_proj"],
            cam["focal_x"],
            cam["focal_y"],
            cam["tan_fovx"],
            cam["tan_fovy"],
            jnp.int32(self.num_points),
        )
        old = self.counter.data["radius3d_min"]
        self.counter.data["radius3d_min"] = jnp.where(
            valid, jnp.minimum(old, r3d), old
        )
        self.num_views += 1

    def at_init_final(self):
        r3min = np.asarray(self.counter.data["radius3d_min"])[: self.num_points]
        print(
            f"[{self.__class__.__name__}] minimum "
            f"{self.gaussian.log_radius(r3min)}"
        )
        # lift scalings to at least the per-view min 3D radius
        scal = self.gaussian.to_numpy(["scaling"])["scaling"]
        floor = np.log(np.maximum(r3min, 1e-12))[:, None].repeat(3, axis=1)
        arrays = self.gaussian.to_numpy()
        arrays["scaling"] = np.maximum(scal, floor).astype(np.float32)
        self.gaussian.set_numpy(arrays)
        rmax = np.full(
            (self.capacity,), self.gaussian.xyz_scale * 0.2, np.float32
        )
        self.counter.data["radius3d_max"] = jnp.asarray(rmax)
        self._refresh_device_caches()
        if self.view_correction is not None:
            self.view_correction.init(self.num_views)

    # -------------------------------------------------------- densify
    def clamp_scale_host(self, arrays, counter_np):
        smin = np.log(np.maximum(counter_np["radius3d_min"], 1e-12))[:, None]
        smax = np.log(np.maximum(counter_np["radius3d_max"], 1e-12))[:, None]
        arrays["scaling"] = np.clip(arrays["scaling"], smin, smax).astype(np.float32)
        return arrays

    def _pull_host(self):
        n = self.num_points
        arrays = self.gaussian.to_numpy()
        # writable copies: densify policies mutate these in place
        counter_np = {
            k: np.array(v) for k, v in self.counter.to_numpy(n).items()
        }
        moments_np = self.optimizer.to_numpy(n) if self.optimizer else None
        return arrays, counter_np, moments_np

    def _push_host(self, arrays, counter_np, moments_np):
        self.gaussian.set_numpy(arrays)
        self._bucket = None
        self._counts_dev = None
        cap = self.capacity
        self.counter.set_numpy(counter_np, cap)
        if moments_np is not None and self.optimizer is not None:
            self.optimizer.moments = {"exp_avg": {}, "exp_avg_sq": {}}
            self.optimizer.set_numpy(moments_np, cap)
        self._refresh_device_caches()

    # ------------------------------------------- device-resident densify
    def _use_device_densify(self) -> bool:
        """Device split/remove (model/densify_device.py) replaces the host
        round trip when the model is large (the reference's CPU rebuild
        analog costs ~110 s at 2.4M points through a remote-TPU tunnel).
        densify_and_remove.device_densify: on|off|auto (auto: >= 512k cap)."""
        if self.optimizer is not None and self.optimizer.spilled:
            # spilled moments live in host numpy — only the host rebuild
            # path updates them consistently
            return False
        mode = self.densify_and_remove.get("device_densify", "auto")
        if mode in (True, "on", "true", 1):
            return True
        if mode in (False, "off", "false", 0):
            return False
        return self.capacity >= (1 << 19)

    def _densify_buckets(self, n_keep, n_split, n_child):
        from .gaussian import next_capacity

        new_n = int(n_keep) + int(n_split) * n_child
        new_cap = next_capacity(new_n)
        s_cap = next_capacity(int(n_split), 256)
        return new_n, new_cap, s_cap

    def _apply_device_rebuild(self, params, moments, counter, new_n, new_cap):
        self.gaussian.set_device(params, new_n, new_cap)
        if self.optimizer is not None:
            self.optimizer.moments = moments
        self.counter.data = counter
        self._bucket = None
        self._counts_dev = None
        self._refresh_device_caches()

    def _update_init_stage_device(self, scale=1, rand_u=None):
        from . import densify_device as dd

        d = self.densify_and_remove
        cap = self.capacity
        n = self.num_points
        if rand_u is None:
            key = jax.random.PRNGKey(int(self._rng.integers(1 << 31)))
            u = jax.random.uniform(key, (2, cap))
        else:
            u = np.zeros((2, cap), np.float32)
            u[:, : rand_u.shape[1]] = rand_u
            u = jnp.asarray(u)
        mode = d.get("init_split_method", "split_by_2d")
        flag_split, flag_remove, reset_create, stats = dd.init_stage_flags(
            self.gaussian.params(),
            self.counter.data,
            jnp.int32(n),
            u,
            jnp.float32(scale),
            jnp.float32(self.gaussian.xyz_scale),
            jnp.float32(d["init_weight_min"]),
            jnp.float32(d["init_radius_min"]),
            jnp.float32(d.get("init_radius_split", -1)),
            jnp.int32(d["min_steps"]),
            jnp.float32(d["split_grad_thres"]),
            mode=mode,
        )
        n_split = int(stats["n_split"])
        n_remove = int(stats["n_remove"])
        print(
            f"[LoG] device densify (init): split {n_split} remove {n_remove}"
            f" of {n}"
        )
        n_keep = n - n_remove - n_split  # split implies removed (replaced)
        n_child = 1
        while n_child < self.splitter.N:
            n_child *= 2
        new_n, new_cap, s_cap = self._densify_buckets(n_keep, n_split, n_child)
        counter_in = dict(self.counter.data)
        counter_in["create_steps"] = jnp.where(
            reset_create, 0, counter_in["create_steps"]
        )
        params, moments, counter, nk, nc = dd.rebuild_split_remove(
            self.gaussian.params(),
            self.optimizer.moments if self.optimizer else
            {"exp_avg": {}, "exp_avg_sq": {}},
            counter_in,
            flag_split,
            flag_remove,
            jnp.int32(n),
            new_cap=new_cap,
            s_cap=s_cap,
            n_child=self.splitter.N,
            remove_split=True,
            keys=tuple(self.gaussian.keys),
            scaling_decay=jnp.float32(d.get("scaling_decay", 0.9)),
            radius3d_max_fill=float(0.2 * self.gaussian.xyz_scale),
        )
        # scale clamp into [radius3d_min, radius3d_max] (clamp_scale_host)
        smin = jnp.log(jnp.maximum(counter["radius3d_min"], 1e-12))[:, None]
        smax = jnp.log(jnp.maximum(counter["radius3d_max"], 1e-12))[:, None]
        params = dict(params)
        params["scaling"] = jnp.clip(params["scaling"], smin, smax)
        self._apply_device_rebuild(params, moments, counter, new_n, new_cap)
        print(f"[LoG] device densify (init): {n} -> {new_n} points")

    def _update_depth_stage_device(self, global_iteration):
        from . import densify_device as dd

        d = self.densify_and_remove
        n = self.num_points
        if self._tree_dev is None:
            self._refresh_device_caches()
        flag_split_d, flag_remove_d, stats = dd.depth_stage_flags(
            self.gaussian.params(),
            self.counter.data,
            self._tree_dev,
            jnp.int32(n),
            jnp.int32(self.current_depth),
            jnp.int32(d["min_steps_split"]),
            jnp.float32(d["split_grad_thres"]),
            jnp.int32(d["radius2d_thres"]),
            jnp.float32(d["remove_weights_thres"]),
            jnp.int32(d["max_split_points"]),
            sort_method=d.get("sort_method", "radii"),
        )
        log_prefix = f"[LoG] {global_iteration:06d}"
        print(
            f"{log_prefix} device densify (depth): split "
            f"{int(stats['n_split'])} remove {int(stats['n_remove'])}"
        )
        # tree structural update stays on host: fetch the POLICY flags
        # (bool, ~cap bytes), apply the tree guards, re-upload the EFFECTIVE
        # flags for the array rebuild
        flag_split = np.asarray(flag_split_d)[:n]
        flag_remove = np.asarray(flag_remove_d)[:n]
        flag_split, flag_remove = self.tree.split_and_remove(
            flag_split, flag_remove
        )
        n_split = int(flag_split.sum())
        n_remove = int(flag_remove.sum())
        n_child = 1
        while n_child < self.splitter.N:
            n_child *= 2
        n_keep = n - n_remove
        new_n, new_cap, s_cap = self._densify_buckets(n_keep, n_split, n_child)

        def pad_flags(f):
            out = np.zeros((self.capacity,), bool)
            out[:n] = f
            return jnp.asarray(out)

        params, moments, counter, nk, nc = dd.rebuild_split_remove(
            self.gaussian.params(),
            self.optimizer.moments if self.optimizer else
            {"exp_avg": {}, "exp_avg_sq": {}},
            dict(self.counter.data),
            pad_flags(flag_split),
            pad_flags(flag_remove),
            jnp.int32(n),
            new_cap=new_cap,
            s_cap=s_cap,
            n_child=self.splitter.N,
            remove_split=False,
            keys=tuple(self.gaussian.keys),
            scaling_decay=jnp.float32(d.get("scaling_decay", 0.9)),
            radius3d_max_fill=-1.0,
        )
        self._apply_device_rebuild(params, moments, counter, new_n, new_cap)
        for dd_ in range(self.current_depth + 1):
            n_at = int((self.tree.depth == dd_).sum())
            if n_at:
                print(f"[LoG] depth = {dd_:2d} | {n_at:10d} points")

    def update_init_stage(self, scale=1, rand_u=None):
        """Stage-0 densify: remove by weight/size, split by 2D radius or grad
        (LoG/model/level_of_gaussian.py:400-452).

        rand_u: optional (2, n) uniforms for the two random keep draws
        (injected by tests to compare host vs device densify paths)."""
        d = self.densify_and_remove
        if self._use_device_densify():
            return self._update_init_stage_device(scale=scale, rand_u=rand_u)
        arrays, cnt, moments = self._pull_host()
        if rand_u is None:
            rand_u = self._rng.random((2, arrays["xyz"].shape[0]))
        weights_max = cnt["weights_max"]
        opacity = _sigmoid(arrays["opacity"][:, 0])
        flag_remove_weight = weights_max < d["init_weight_min"]
        flag_nonmax = weights_max < opacity * 0.1
        radii_max_max = cnt["radii_max_max"]
        flag_remove_small = radii_max_max < (d["init_radius_min"] * scale) ** 2
        print(
            f"[LoG] {int(flag_remove_weight.sum()):10d} points with weight < "
            f"{d['init_weight_min']:.2f}"
        )
        print(f"[LoG] {int(flag_nonmax.sum()):10d} points with weight is non max")
        print(
            f"[LoG] {int(flag_remove_small.sum()):10d} points with radius < "
            f"{d['init_radius_min']:.2f}"
        )
        flag_remove_small = flag_remove_small & (rand_u[0] > 0.5)
        flag_remove = flag_remove_small | flag_remove_weight | flag_nonmax
        radii_max = radii_max_max.astype(np.float64)
        flag_activation = (cnt["create_steps"] > d["min_steps"]) & (radii_max > 0)
        grad = cnt["grad_sum"] / np.maximum(cnt["area_sum"], 1)
        print(f"[LoG] {str_min_mean_max('grad', grad)}")
        act_r = radii_max[flag_activation]
        radii_mean = act_r.mean() if act_r.size else 0.0
        radii_std = act_r.std() if act_r.size else 0.0
        mode = d.get("init_split_method", "split_by_2d")
        split_thres = d.get("init_radius_split", -1) * scale
        if mode == "split_by_2d":
            if split_thres < 0:
                split_thres = radii_mean + radii_std * 3
            flag_split_grad = (grad > 10 * d["split_grad_thres"]) & (
                radii_max > d["init_radius_min"] * scale * 8
            )
            flag_split_radii = radii_max > split_thres**2
            print(f"[LoG] split by grad : {int(flag_split_grad.sum()):8d}")
            print(f"[LoG] split by radii: {int(flag_split_radii.sum()):8d}")
            flag_split = flag_split_radii | flag_split_grad
            flag_split = flag_activation & flag_split & (~flag_remove)
        elif mode == "split_by_3d":
            radius = np.exp(arrays["scaling"])
            radius_max3 = radius.max(axis=-1)
            flag_split = radius_max3 > self.gaussian.xyz_scale * 0.1
            flag_remove2d = radius_max3 < self.gaussian.xyz_scale * 0.005
            flag_remove2d = flag_activation & flag_remove2d
            flag_rand = rand_u[1] > 0.5
            flag_remove = (flag_remove2d & flag_rand) | flag_remove
            cnt["create_steps"][flag_remove2d & (~flag_rand)] = 0
            flag_split = flag_split & (~flag_remove)
        else:
            raise ValueError(mode)
        # never prune the model to (near) nothing — keep the top-weight points
        min_keep = 16
        if (~flag_remove).sum() < min_keep:
            order = np.argsort(-weights_max)
            flag_remove[order[:min_keep]] = False
        new_arrays, num_keep, _ = self.splitter.split_and_remove(
            arrays, self.gaussian.activation, flag_split, flag_remove,
            rng=self._rng,
        )
        new_moments = (
            self.splitter.split_and_remove_moments(moments, flag_split, flag_remove)
            if moments
            else None
        )
        new_cnt = self.splitter.split_and_remove_other(
            cnt, ["create_steps", "radius3d_min", "radius3d_max"],
            flag_split, flag_remove,
        )
        # trim the remaining counter keys to the new size (they reset anyway)
        n_new = new_arrays["xyz"].shape[0]
        from .counter import init_counter, RESET_KEYS

        fresh = init_counter(n_new)
        for key in RESET_KEYS:
            new_cnt[key] = fresh[key]
        new_cnt["radius3d_max"] = np.full(
            (n_new,), 0.2 * self.gaussian.xyz_scale, np.float32
        )
        new_arrays = self.clamp_scale_host(new_arrays, new_cnt)
        self._push_host(new_arrays, new_cnt, new_moments)
        print(f"[LoG] {str_min_mean_max('radius3d_min', new_cnt['radius3d_min'])}")

    def update_depth_stage(self, global_iteration):
        """Tree densify: split leaf parents by grad AND radius thresholds,
        cap top-K, remove low-weight children
        (LoG/model/level_of_gaussian.py:454-525)."""
        if self._use_device_densify():
            return self._update_depth_stage_device(global_iteration)
        d = self.densify_and_remove
        log_prefix = f"[LoG] {global_iteration:06d}"
        arrays, cnt, moments = self._pull_host()
        radius = np.exp(arrays["scaling"])
        radius_max = radius.max(axis=-1)
        node_index = self.tree.node_index
        depth = self.tree.depth
        flag_is_parent = (node_index == -1) & (depth < self.current_depth)
        flag_depth_parent = flag_is_parent & (
            cnt["create_steps"] > d["min_steps_split"]
        )
        depth_minus1_sum = int((depth < self.current_depth).sum())
        flag_depth_child = (node_index == -1) & (depth > 0)
        grad = cnt["grad_sum"] / np.maximum(cnt["area_sum"], 1)
        radii_max_max = cnt["radii_max_max"].astype(np.float64)
        print(f"{log_prefix} {str_min_mean_max('grad', grad[flag_is_parent])}")
        print(f"{log_prefix} {str_min_mean_max('radii', radii_max_max[flag_is_parent])}")
        flag_split_grad = grad > d["split_grad_thres"]
        flag_split_radii = cnt["radii_max_max"] > d["radius2d_thres"]
        print(
            f"{log_prefix} split by grad: {int(flag_split_grad.sum()):8d} "
            f"split by radii: {int(flag_split_radii.sum()):8d}"
        )
        flag_split = flag_split_grad & flag_split_radii & flag_depth_parent
        if flag_depth_child.sum() == 0:
            flag_remove = np.zeros_like(flag_split)
        else:
            flag_remove = (
                flag_depth_child
                & (cnt["weights_max"] < d["remove_weights_thres"])
                & (cnt["visible_count"] > 1)
            )
        flag_split = flag_split & (~flag_remove)
        num_max_split = min(int(depth_minus1_sum * 0.05), d["max_split_points"])
        sort_method = d.get("sort_method", "radii")
        if flag_split.sum() > num_max_split and num_max_split > 0:
            if sort_method == "radii":
                vals = radii_max_max
            elif sort_method == "opacity":
                vals = _sigmoid(arrays["opacity"][:, 0]).astype(np.float64)
            else:
                vals = grad
            cand = vals[flag_split]
            thres = np.partition(cand, -num_max_split)[-num_max_split]
            print(
                f"{log_prefix} select top {num_max_split} points to split. "
                f"New {sort_method} thres = {thres:.3f}"
            )
            flag_split = flag_split & (vals >= thres)
        flag_split, flag_remove = self.tree.split_and_remove(flag_split, flag_remove)
        new_arrays, num_keep, num_children = self.splitter.split_and_remove(
            arrays, self.gaussian.activation, flag_split, flag_remove,
            remove_split=False, rng=self._rng,
        )
        new_moments = (
            self.splitter.split_and_remove_moments(
                moments, flag_split, flag_remove, remove_split=False
            )
            if moments
            else None
        )
        new_cnt = self.splitter.split_and_remove_other(
            cnt, ["create_steps", "radius3d_min", "radius3d_max"],
            flag_split, flag_remove, remove_split=False,
        )
        n_new = new_arrays["xyz"].shape[0]
        from .counter import init_counter, RESET_KEYS

        fresh = init_counter(n_new)
        for key in RESET_KEYS:
            new_cnt[key] = fresh[key]
        num_split = int(flag_split.sum()) * self.splitter.N
        if num_split > 0:
            scaling_decay = d.get("scaling_decay", 0.9)
            new_cnt["radius3d_max"][-num_split:] = np.repeat(
                scaling_decay * radius_max[flag_split], self.splitter.N
            )
        self._push_host(new_arrays, new_cnt, new_moments)
        for dd in range(self.current_depth + 1):
            n_at = int((self.tree.depth == dd).sum())
            if n_at:
                print(f"[LoG] depth = {dd:2d} | {n_at:10d} points")

    def upgrade_tree(self):
        if self.current_depth == 0:
            self.tree.initialize(self.num_points)
        self.current_depth = 20
        print(f"[{self.__class__.__name__}] current depth: {self.current_depth}")
        self.counter.reset(self.num_points, self.capacity)
        self._refresh_device_caches()

    def densify_due(self, iteration) -> bool:
        """True when update_by_iteration will MUTATE device state (counter
        reset / densify / tree upgrade) at this iteration — used by the
        sharded executor to sync device->host only when needed. SH upgrades
        are excluded: they only bump a host scalar."""
        d = self.densify_and_remove
        base_iter = self.base_iter
        densify_from_iter = d["densify_from_iter"] * base_iter
        densify_every_iter = d["densify_every_iter"] * base_iter
        if (iteration + 1) == densify_from_iter:
            return True
        return (iteration + 1) > densify_from_iter and (
            iteration + 1
        ) % densify_every_iter == 0

    def update_by_iteration(self, iteration, global_iteration):
        mutated = self._update_by_iteration(iteration, global_iteration)
        if mutated and self.optimizer is not None:
            # automatic host offload past the HBM capacity thresholds
            # (reference: LoG/model/splitter.py:198-204)
            self.optimizer.maybe_spill(self.num_points)
        return mutated

    def _update_by_iteration(self, iteration, global_iteration):
        """Densify/SH/tree schedule (LoG/model/level_of_gaussian.py:535-565)."""
        d = self.densify_and_remove
        base_iter = self.base_iter
        upgrade_sh_iter = d["upgrade_sh_iter"] * base_iter
        if global_iteration > 0 and (global_iteration + 1) % upgrade_sh_iter == 0:
            self.gaussian.oneupSHdegree()
        densify_from_iter = d["densify_from_iter"] * base_iter
        densify_every_iter = d["densify_every_iter"] * base_iter
        sum_iter = self.current_depth + 1
        upgrade_tree_iter = densify_every_iter * sum_iter * d["upgrade_repeat"]
        if (iteration + 1) == densify_from_iter:
            self.counter.reset(self.num_points, self.capacity)
            return False
        if (iteration + 1 > densify_from_iter) and (
            iteration + 1
        ) % densify_every_iter == 0:
            if (iteration + 1) % upgrade_tree_iter == 0 and self.stage_name != "init":
                self.upgrade_tree()
                return True
            if self.current_depth == 0:
                if self.stage_name == "init":
                    self.update_init_stage()
                else:
                    self.update_init_stage(scale=2)
            else:
                if (iteration + 1) % (2 * densify_every_iter) == 0:
                    self.update_depth_stage(global_iteration)
                else:
                    self.counter.reset(self.num_points, self.capacity)
            return True
        return False

    # ------------------------------------------------- render layout / blocks
    def optimize_render_layout(self, morton_bits: int = 10,
                               mode: str = "root_major"):
        """Reorder rows for fast inference. Inference-only (call after
        load_state_dict / before demo/val loops); training state
        (optimizer moments) is not remapped.

        mode="root_major" (default): ROOTS first (morton-ordered), then
        every root's descendants as one CONTIGUOUS tail segment (in root
        order, depth-minor). Root-contiguous segments make the per-frame
        weight-cull's capacity-axis expansion gather-free (scatter-max +
        cummax over static segment starts — train_step.expand_weight_full,
        ~6 ms vs a ~33 ms w[root_id] take at 3.4M rows), and blocks stay
        spatially tight for frustum/occlusion pruning.

        mode="depth_major": rows DEPTH-MAJOR, MORTON-MINOR — coarse LoD
        cuts map to a level prefix, so ShowLevel-style depth sweeps prune
        whole blocks (block_render.py eligibility parent-radius test).

        The reference gets the same effect from its pointer-chasing tree
        traversal (LoG/model/tensor_tree.py:131-186); a flat TPU layout
        has to encode the hierarchy in the ROW ORDER instead."""
        assert self.optimizer is None, (
            "optimize_render_layout is inference-only: optimizer moments "
            "are not remapped"
        )
        n = self.num_points
        if n == 0 or self.tree.num_points == 0:
            return
        t = self.tree
        t.ensure_root_id()
        xyz = np.asarray(self.gaussian.get("xyz"))[:n]
        lo = xyz.min(axis=0)
        span = np.maximum(xyz.max(axis=0) - lo, 1e-9)
        q = np.minimum(
            ((xyz - lo) / span * (1 << morton_bits)).astype(np.int64),
            (1 << morton_bits) - 1,
        )
        morton = np.zeros(n, np.int64)
        for b in range(morton_bits):
            for ax in range(3):
                morton |= ((q[:, ax] >> b) & 1) << (3 * b + ax)
        if mode == "root_major":
            is_tail = (t.index_parent[:n] >= 0).astype(np.int64)
            # rank roots by morton; every row inherits its root's rank
            root_rows = np.flatnonzero(~is_tail.astype(bool))
            rank_of_root_row = np.full(n, n, np.int64)
            rank_of_root_row[root_rows[np.argsort(morton[root_rows],
                                                  kind="stable")]] = (
                np.arange(root_rows.size, dtype=np.int64)
            )
            rr = rank_of_root_row[t.root_id[:n]]
            perm = np.lexsort(
                (morton, t.depth[:n].astype(np.int64), rr, is_tail)
            ).astype(np.int64)
        else:
            key = t.depth[:n].astype(np.int64) << (3 * morton_bits)
            key |= morton
            perm = np.argsort(key, kind="stable").astype(np.int64)
        inv = np.empty(n, np.int64)
        inv[perm] = np.arange(n, dtype=np.int64)

        def remap_vals(a):
            out = np.asarray(a).copy()
            pos = out >= 0
            out[pos] = inv[out[pos]]
            return out

        arrays = self.gaussian.to_numpy()
        self.gaussian.set_numpy({k: v[perm] for k, v in arrays.items()})
        for key_c, val in list(self.counter.data.items()):
            v = np.asarray(val)
            if v.shape[0] >= n and v.ndim >= 1:
                v = v.copy()
                v[:n] = v[:n][perm]
                self.counter.data[key_c] = jnp.asarray(v)
        t.node_index = t.node_index[perm]
        t.index_parent = remap_vals(t.index_parent[perm])
        t.local_index = t.local_index[perm]
        t.depth = t.depth[perm]
        t.root_id = remap_vals(t.root_id[perm])
        t.root_index = np.sort(remap_vals(t.root_index))
        t.tree = remap_vals(t.tree)
        self._cull_seg_starts = None
        if mode == "root_major":
            # static tail-segment starts for the gather-free weight-cull
            # expansion (train_step.expand_weight_full): segment of root
            # rank j (== its row, roots are the prefix) begins at
            # seg_starts[j]; empty segments point at the next start.
            n_roots = int((t.index_parent[:n] == -1).sum())
            tail_rids = t.root_id[n_roots:n].astype(np.int64)
            assert (np.diff(tail_rids) >= 0).all(), "tail not root-grouped"
            self._cull_seg_starts = (
                n_roots
                + np.searchsorted(tail_rids, np.arange(n_roots),
                                  side="left")
            ).astype(np.int32)
        self._tree_dev = None
        self._block_cache = None
        self._render_bucket = None
        self._render_counts_dev = None
        self._layout_optimized = True
        self._refresh_device_caches()
        print(
            f"[{self.__class__.__name__}] render layout optimized: "
            f"{mode}/morton over {n} rows"
        )

    # --------------------------------------------------------- checkpoint
    def state_dict(self) -> dict:
        """Flat numpy dict with reference-compatible key names
        (LoG/utils/trainer.py:429-443 layout)."""
        n = self.num_points
        sd = {}
        for key in self.gaussian.keys:
            sd[f"gaussian.{key}"] = np.asarray(self.gaussian.get(key))[:n]
        sd["tree.root_index"] = self.tree.root_index
        sd["tree.tree"] = self.tree.tree
        for key in self.tree.KEYS:
            sd[f"tree.{key}"] = getattr(self.tree, key)
        for key, val in self.counter.to_numpy(n).items():
            sd[f"counter.{key}"] = val
        if self.optimizer is not None:
            sd["optimizer.global_steps"] = np.float32(self.optimizer.global_steps)
            mom = self.optimizer.to_numpy(n)
            for mk, dd in mom.items():
                for key, val in dd.items():
                    sd[f"optimizer.{mk}.{key}"] = val
        if self.view_correction is not None:
            self._sync_corrector_to_host()
            sd["view_correction.view_correction"] = self.view_correction.values
        return sd

    def load_state_dict(self, state_dict, strict=True, split="demo"):
        """Shape-tolerant load (LoG/model/level_of_gaussian.py:567-592)."""
        if split == "train":
            self.training_setup()
        arrays = {}
        counter_np = {}
        moments_np = {"exp_avg": {}, "exp_avg_sq": {}}
        for key, val in state_dict.items():
            val = np.asarray(val)
            if split != "train" and "optimizer" in key:
                continue
            if key.startswith("gaussian."):
                arrays[key.split(".", 1)[1]] = val
            elif key.startswith("tree."):
                name = key.split(".", 1)[1]
                if name in ("root_index", "tree") or name in self.tree.KEYS:
                    setattr(self.tree, name, val.astype(np.int32))
            elif key.startswith("counter."):
                counter_np[key.split(".", 1)[1]] = val
            elif key == "optimizer.global_steps":
                if self.optimizer is not None:
                    self.optimizer.global_steps = float(val)
            elif key.startswith("optimizer.exp_avg."):
                moments_np["exp_avg"][key.rsplit(".", 1)[1]] = val
            elif key.startswith("optimizer.exp_avg_sq."):
                moments_np["exp_avg_sq"][key.rsplit(".", 1)[1]] = val
            elif key == "view_correction.view_correction":
                if self.view_correction is not None:
                    self.view_correction.set_values(val)
            else:
                print(f"[LoG] skip unknown checkpoint key {key}")
        if arrays:
            self.gaussian.keys = [k for k in
                                  ["scaling", "colors", "xyz", "opacity",
                                   "rotation", "shs"] if k in arrays]
            self.gaussian.set_numpy(arrays)
        if counter_np:
            self.counter.set_numpy(counter_np, self.capacity)
        if split == "train" and moments_np["exp_avg"]:
            self.optimizer.moments = {"exp_avg": {}, "exp_avg_sq": {}}
            self.optimizer.set_numpy(moments_np, self.capacity)
        if self.tree.num_nodes > 0:
            self.current_depth = int(self.tree.depth.max())
        # freshly loaded state invalidates any previous layout optimization
        self._layout_optimized = False
        self._cull_seg_starts = None
        self._refresh_device_caches()
        return True



def _fg_mask_bbox(fg_mask, H, W):
    """Host-side foreground bbox with the reference's training padding
    (LoG/render/renderer.py:355-357: padding = max(H, W) / 50). Returns
    (uint8 device mask (1, H, W), int32 bbox [top, bottom, left, right])."""
    m = np.asarray(fg_mask).reshape(-1, W)[-H:] > 0.5
    rows = np.where(m.any(axis=1))[0]
    cols = np.where(m.any(axis=0))[0]
    if rows.size == 0:
        bbox = np.array([0, H - 1, 0, W - 1], np.int32)
    else:
        pad = int(max(H, W) / 50)
        bbox = np.array(
            [max(int(rows[0]) - pad, 0), int(rows[-1]) + pad,
             max(int(cols[0]) - pad, 0), int(cols[-1]) + pad], np.int32,
        )
    return (
        jnp.asarray(m.astype(np.uint8))[None],
        jnp.asarray(bbox),
    )

def _host_compact_index(keep: np.ndarray, k: int, cap: int) -> np.ndarray:
    """Host replica of _compact_slices_sort's index: kept positions
    ascending, truncated/padded to k with the cap sentinel."""
    idx = np.nonzero(keep)[0][:k].astype(np.int32)
    if idx.shape[0] < k:
        idx = np.concatenate(
            [idx, np.full(k - idx.shape[0], cap, np.int32)]
        )
    return idx


def _host_lrs(optimizer: SparseOptimizer, step) -> dict:
    """Per-key LR values for this step (host floats -> traced scalars)."""
    out = {}
    for key in optimizer.optimize_keys:
        if key == "xyz":
            out[key] = float(
                expon_lr(
                    step,
                    optimizer.lr_dict["xyz"] * optimizer.xyz_scale,
                    optimizer.lr_dict.get(
                        "xyz_final", optimizer.lr_dict["xyz"] * 0.01
                    )
                    * optimizer.xyz_scale,
                    max_steps=optimizer.max_steps,
                )
            )
        elif key == "scaling" and "scaling" in optimizer.lr_dict:
            out[key] = float(
                expon_lr(
                    step,
                    optimizer.lr_dict["scaling"],
                    optimizer.lr_dict.get("scaling_final", optimizer.lr_dict["scaling"]),
                    max_steps=optimizer.max_steps,
                )
            )
        elif key in optimizer.lr_dict:
            out[key] = float(optimizer.lr_dict[key])
    return out


from functools import partial


@jax.jit
def _init_radius3d_jit(
    xyz, scaling, rotation, world_view, full_proj,
    focal_x, focal_y, tan_fovx, tan_fovy, n_alive,
):
    from ..ops import gaussian_math as gm

    s = jnp.exp(scaling)
    r = rotation / jnp.linalg.norm(rotation, axis=-1, keepdims=True)
    r2d = gm.compute_radius2d(
        xyz, s, r, world_view, full_proj, focal_x, focal_y, tan_fovx, tan_fovy
    )
    alive = jnp.arange(xyz.shape[0]) < n_alive
    valid = (r2d > 0) & alive
    r3d = s[:, 0] * jnp.where(valid, MIN_PIXEL / jnp.maximum(r2d, 1e-9), 1.0)
    return valid, r3d
