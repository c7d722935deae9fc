"""Stage-driven training orchestration.

Contract: LoG/utils/trainer.py:47-531 — named stages with resume-skip,
dataset/model/render state application, iteration-sampled loader, periodic
validation/overlook/checkpoints, init-pass radius calibration — on top of the
fused TPU train step (one jit call per iteration + one visibility jit).
"""
from __future__ import annotations

import os
import pickle
import time
from collections import defaultdict
from os.path import join

import numpy as np

from .config import load_object
from .metric import psnr
from .recorder import Recorder
from .sampler import DataLoader, IndexSampler, IterationBasedSampler


def imwrite(imgname, img):
    import cv2

    os.makedirs(os.path.dirname(imgname), exist_ok=True)
    cv2.imwrite(imgname, img)


def seed_everything(seed):
    import random

    random.seed(seed)
    np.random.seed(seed)


def prepare_batch(data, device=None):
    """Kept for API parity; batches stay numpy until camera_device()."""
    return data


class Trainer:
    def __init__(self, cfg, model, render, logdir="log"):
        self.cfg = cfg
        self.exp = cfg.exp
        os.makedirs(self.exp, exist_ok=True)
        self._acquire_exp_lock()
        self.model = model
        self.render = render
        self.recorder = Recorder(logdir)
        self.check_val()
        self.check_overlook()
        self.log_interval = cfg.get("log_interval", 1000)
        self.save_interval = cfg.get("save_interval", 100_000)
        # image dumps pull frames off-device; disable for remote runtimes
        self.save_vis = cfg.get("save_vis", True)
        self.global_iterations = 0
        self.rng = np.random.default_rng(666)
        # device-resident GT cache (see _gt_to_device)
        self.gt_cache_limit_bytes = (
            int(cfg.get("gt_cache_mb", 512)) * 1024 * 1024
        )
        self._gt_cache_ok = False
        self._gt_dev_cache = {}
        self._gt_cache_bytes = 0
        # multi-chip training (cfg.train.parallel): enable auto|true|false,
        # cams_per_device, backend, check_cull — see log_tpu/parallel
        self.parallel_cfg = dict(cfg.train.get("parallel", {}) or {}) \
            if "train" in cfg else {}
        self.executor = None

    def _acquire_exp_lock(self):
        """Exclusive flock on <exp>/.lock for the life of this process.

        Two trainers sharing one exp dir interleave scalars.jsonl, clobber
        checkpoints, and (on a single-session TPU) corrupt each other's
        device state — the round-2 NaN postmortem's root cause. A second
        trainer now fails fast instead. The lock is advisory (flock), auto-
        released on process death, and holds the owner PID for diagnostics.
        """
        import fcntl

        path = os.path.join(self.exp, ".lock")
        fd = os.open(path, os.O_RDWR | os.O_CREAT, 0o644)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            owner = "?"
            try:
                owner = os.read(fd, 64).decode().strip() or "?"
            except OSError:
                pass
            os.close(fd)
            raise RuntimeError(
                f"experiment dir {self.exp!r} is locked by a running "
                f"trainer (pid {owner}); refusing to start a second one"
            )
        os.ftruncate(fd, 0)
        os.write(fd, f"{os.getpid()}\n".encode())
        os.fsync(fd)
        self._exp_lock_fd = fd  # keep open: lock lives with the process

    def _parallel_requested(self):
        if not self.parallel_cfg:
            return False  # multi-chip is opt-in: cfg.train.parallel block
        enable = self.parallel_cfg.get("enable", "auto")
        if enable in (False, "false", "off"):
            return False
        import jax

        n = self.parallel_cfg.get("n_devices") or len(jax.devices())
        if enable in (True, "true", "on"):
            return max(int(n), 1)
        return n if n > 1 else False

    def _make_executor(self):
        n = self._parallel_requested()
        if not n:
            self.executor = None
            return
        from ..parallel.executor import ShardedExecutor

        pcfg = self.parallel_cfg
        self.executor = ShardedExecutor(
            self.model,
            n_devices=n,
            cams_per_device=int(pcfg.get("cams_per_device", 1)),
            backend=pcfg.get("backend"),
            check_cull=bool(pcfg.get("check_cull", True)),
            check_scale=pcfg.get("check_scale"),
        )
        print(
            f"[Trainer] multi-chip training: {n} devices x "
            f"{self.executor.cams_per_device} cams "
            f"(backend {self.executor.backend})"
        )

    def _sync_parallel(self):
        if self.executor is not None:
            self.executor.sync_to_model()

    # ------------------------------------------------------------- setup
    def check_val(self):
        if "val" not in self.cfg:
            self.val = None
            return
        dataset = load_object(self.cfg.val.dataset.module, self.cfg.val.dataset.args)
        print(f">>> Load val dataset: {len(dataset)}")
        self.val = DataLoader(dataset, batch_size=1)
        if "render" in self.cfg.val:
            self.render_val = load_object(
                self.cfg.val.render.module, self.cfg.val.render.args
            )
        else:
            self.render_val = self.render
        self.lpips = None
        if dataset.scales and dataset.scales[0] >= 4:
            try:
                import lpips
                import torch  # noqa: F401

                self.lpips = lpips.LPIPS(net="vgg", spatial=False)
            except ImportError:
                pass

    def check_overlook(self):
        self.overlook = None
        self.overlook_oneframe = None
        if "overlook" in self.cfg:
            dataset = load_object(
                self.cfg.overlook.dataset.module, self.cfg.overlook.dataset.args
            )
            print(f">>> Load overlook dataset: {len(dataset)}")
            self.overlook = DataLoader(dataset, batch_size=1)
        if "overlook_oneframe" in self.cfg:
            self.overlook_oneframe = load_object(
                self.cfg.overlook_oneframe.dataset.module,
                self.cfg.overlook_oneframe.dataset.args,
            )
            self.overlook_oneframe_freq = self.cfg.overlook_oneframe.iteration

    def to(self, device):
        return self

    def train_loader(self, dataset, args=None, base_iter=1):
        stage = args if args is not None else self.cfg.train.loader.args
        batch_size = stage.get("batch_size", 16)
        if self.executor is not None:
            # data-parallel: one loader batch per sharded step
            batch_size = self.executor.batch
        iterations = stage.get("iterations", 1024) * base_iter
        sampler = IterationBasedSampler(
            dataset, iterations * batch_size, seed=int(self.rng.integers(1 << 31))
        )
        return DataLoader(dataset, sampler=sampler, batch_size=batch_size,
                          drop_last=True)

    def val_loader(self, dataset, index=None, num_workers=1):
        return DataLoader(dataset, sampler=IndexSampler(dataset, index), batch_size=1)

    # ----------------------------------------------------------- training
    def _rand_radius_jitter(self):
        """LoG/render/renderer.py:229-242: random LoD pixel threshold."""
        u = float(self.rng.random())
        if u > 0.5:
            return 3 * 2 ** (u * 8 - 3)
        return 3 * 2 ** (u * 2)

    def _training_step_parallel(self, model, data):
        """Route a whole loader batch through the sharded executor."""
        assert "mask_ignore" not in data and "depth" not in data, (
            "mask_ignore/depth training is single-chip only for now "
            "(disable cfg.train.parallel)"
        )
        B = np.asarray(data["camera"]["camera_center"]).shape[0]
        cameras, gts, view_indices, backgrounds, min_res = [], [], [], [], []
        for bn in range(B):
            camera, background = self.render.prepare_camera(
                data, bn, None, is_train=True, rng=self.rng
            )
            cameras.append(camera)
            backgrounds.append(background)
            gt = np.asarray(data["image"][bn]).transpose(2, 0, 1)
            if gt.dtype != np.uint8:
                gt = (np.clip(gt, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
            gts.append(gt)
            view_indices.append(int(np.asarray(data["index"])[bn]))
            if getattr(self.render, "use_rand_radius", False):
                min_res.append(self._rand_radius_jitter())
            else:
                min_res.append(model.tree.min_resolution_pixel)
        metrics, counts = self.executor.step(
            cameras, gts, view_indices=view_indices, backgrounds=backgrounds,
            min_res=min_res,
        )
        output = {"metrics": metrics, "loss_dev": metrics["loss"]}
        if self.global_iterations % 10 == 0:
            loss = float(metrics["loss"])
            self.recorder.log(self.global_iterations, "train/loss", loss)
            self.recorder.log(
                self.global_iterations, "train/loss_l1", float(metrics["l1"])
            )
            self.recorder.log(
                self.global_iterations, "train/loss_ssim",
                float(metrics["ssim"]),
            )
            return True, output, loss
        return True, output, metrics["loss"]

    def _gt_to_device(self, view_index, gt):
        """Device-resident GT cache.

        Training revisits the same views every base_iter cycle; uploading
        H*W*3 uint8 per step is pure transfer waste (and the tunnel's
        host->device path can degrade to ~100 KB/s on remote runtimes).
        Enabled per stage only when the dataset serves full frames
        (no random crops — see fit()); falls back to per-step upload once
        the byte budget (cfg.gt_cache_mb, default 512) is exceeded, so
        urban-scale datasets never squeeze model state out of HBM.
        """
        if not self._gt_cache_ok:
            return gt
        key = (int(view_index), gt.shape)
        hit = self._gt_dev_cache.get(key)
        if hit is not None:
            return hit
        if self._gt_cache_bytes + gt.nbytes > self.gt_cache_limit_bytes:
            self._gt_cache_ok = False
            self._gt_dev_cache.clear()
            return gt
        import jax

        dev = jax.device_put(gt)
        self._gt_cache_bytes += gt.nbytes
        self._gt_dev_cache[key] = dev
        return dev

    def training_step(self, model, data, step=True, accumulate_step=1):
        if self.executor is not None:
            return self._training_step_parallel(model, data)
        B = np.asarray(data["camera"]["camera_center"]).shape[0]
        total_loss = 0.0
        output = {}
        any_ok = False
        for bn in range(B):
            camera, background = self.render.prepare_camera(
                data, bn, None, is_train=True, rng=self.rng
            )
            origin_radius = model.tree.min_resolution_pixel
            if getattr(self.render, "use_rand_radius", False):
                model.tree.min_resolution_pixel = self._rand_radius_jitter()
            gt = np.asarray(data["image"][bn]).transpose(2, 0, 1)
            if gt.dtype != np.uint8:
                # ship uint8 to the device (4x less transfer; sources are
                # 8-bit images so the roundtrip is exact) — the fused step
                # normalizes back to f32 on device
                gt = (np.clip(gt, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
            mask = None
            if "mask_ignore" in data:
                mask = np.asarray(data["mask_ignore"][bn])
            view_index = int(np.asarray(data["index"])[bn])
            # training revisits the same views every base_iter cycle — keep
            # GT device-resident instead of re-uploading H*W*3 bytes/step
            # (the tunnel's host->device path can degrade to ~100 KB/s)
            gt_step = self._gt_to_device(view_index, gt)
            gt_depth = None
            if "depth" in data and isinstance(data["depth"][bn], np.ndarray):
                gt_depth = np.asarray(data["depth"][bn])
            fg_mask = None
            if getattr(self.render, "foreground_crop", False) and "mask" in data:
                fg_mask = np.asarray(data["mask"][bn])
            metrics, aux = model.training_iteration(
                camera, gt_step, background, mask_ignore=mask,
                view_index=view_index,
                gt_depth=gt_depth,
                render_depth=getattr(self.render, "render_depth", False),
                fg_mask=fg_mask,
            )
            model.tree.min_resolution_pixel = origin_radius
            # keep metrics as device scalars — a float() here is a host sync
            # on every step (expensive through remote runtimes); the fit loop
            # materializes them only at log cadence.
            output = {
                "metrics": metrics,
                "render": aux["render"],
                "loss_dev": metrics["loss"],
                "gt": gt.astype(np.float32) / 255.0
                if gt.dtype == np.uint8
                else gt,
            }
            any_ok = True
        if not any_ok:
            return False, {}, 0.0
        if self.global_iterations % 10 == 0:
            loss = float(output["loss_dev"])
            self.recorder.log(self.global_iterations, "train/loss", loss)
            self.recorder.log(
                self.global_iterations, "train/loss_l1", float(output["metrics"]["l1"])
            )
            self.recorder.log(
                self.global_iterations, "train/loss_ssim",
                float(output["metrics"]["ssim"]),
            )
            return True, output, loss
        return True, output, output["loss_dev"]

    def init(self, dataset):
        """Radius3d calibration pass (LoG/utils/trainer.py:167-209)."""
        dataset.read_img = False
        os.makedirs(join(self.exp, "init"), exist_ok=True)
        if "init" in self.cfg.train:
            dataset.set_state(**self.cfg.train.init.get("dataset_state", {}))
            self.model.at_init_start()
            for iteration in range(len(dataset)):
                item = dataset[iteration]
                self.model.clear()
                self.model.init_view(item["camera"])
            self.model.at_init_final()
        dataset.set_partial_indices(list(range(len(dataset))))
        self.model.eval()
        for iteration in range(min(3, len(dataset)) if self.save_vis else 0):
            item = dataset[iteration]
            batch = {
                "camera": {k: np.asarray(v)[None] for k, v in item["camera"].items()},
                "index": np.asarray([item.get("index", iteration)]),
            }
            ret = self.render.vis(batch, self.model)
            vis = self.render.tensor_to_bgr(ret["render"][0])
            imwrite(join(self.exp, "init", f"model_{iteration}.jpg"), vis)
        self.model.train()
        dataset.read_img = True
        dataset.partial_indices = None

    # --------------------------------------------------------- validation
    def make_validation(self, iteration, visualize=False):
        """L1/PSNR on held-out views (LoG/utils/trainer.py:298-364).

        Metrics are computed ON DEVICE and fetched as scalars — pulling whole
        frames is prohibitively slow on remote runtimes; image dumps only when
        save_vis/visualize ask for them."""
        if self.val is None:
            return
        import jax.numpy as jnp

        metric = defaultdict(list)
        model = self.model
        model.eval()
        logdir = os.path.join(self.exp, "val", f"{iteration:06d}")
        use_corr = (
            getattr(model, "view_correction", None) is not None
            and model.view_correction.values.size
        )
        for _data in self.val:
            model.clear()
            camera, _bg = self.render_val.prepare_camera(_data, 0, None)
            model.prepare_from_camera(camera)
            out = self.render_val.render_one(
                model, camera, np.ones(3, np.float32)
            )
            pred = out["render"]
            # MaskForeground crops both to the mask bbox; base is identity
            pred = jnp.asarray(
                self.render_val.process_pred(_data, np.asarray(pred))
            )
            gt = jnp.asarray(self.render_val.process_gt(_data)[0])
            if use_corr:
                # least-squares channel gain fit on the left image half
                gt_left = gt[:, :, : gt.shape[2] // 2]
                pred_left = pred[:, :, : pred.shape[2] // 2]
                denom = jnp.maximum((pred_left**2).sum(axis=(-2, -1)), 1e-8)
                gain = (gt_left * pred_left).sum(axis=(-2, -1)) / denom
                pred = jnp.clip(pred * gain[:, None, None], 0.0, 1.0)
            l1_dev = jnp.mean(jnp.abs(pred - gt))
            mse_dev = jnp.mean((pred - gt) ** 2)
            # SSIM on device (BASELINE.md protocol: reference-matching
            # PSNR/SSIM; the reference's val loop logs l1/psnr only —
            # LoG/utils/trainer.py:319-346 — SSIM here EXCEEDS it)
            from ..ops.ssim import ssim_map

            ssim_dev = jnp.mean(ssim_map(pred, gt))
            metric["l1"].append(float(l1_dev))
            metric["psnr"].append(float(-10 * jnp.log10(jnp.maximum(mse_dev, 1e-12))))
            metric["ssim"].append(float(ssim_dev))
            metric["imgname"].append(_data["imgname"][0])
            if visualize and self.save_vis:
                os.makedirs(logdir, exist_ok=True)
                vis = self.render_val.tensor_to_bgr(
                    np.concatenate([np.asarray(pred), np.asarray(gt)], axis=1)
                )
                imwrite(join(logdir, f'{len(metric["imgname"]):06d}.jpg'), vis)
        print(f">>> Validation: {iteration}: {len(metric['imgname'])} images")
        record = {"iteration": iteration, "num_points": model.num_points}
        for key, val in metric.items():
            if key == "imgname":
                continue
            mean_val = sum(val) / len(val)
            record[key] = mean_val
            if self.global_iterations > 0:
                self.recorder.log(self.global_iterations, f"val/{key}", mean_val)
            print(f"    - {key}: {mean_val:.4f}")
        model.train()
        return record

    def make_overlook(self, mode="rgb", iteration=-1):
        if self.overlook is None:
            return
        if iteration == -1:
            iteration = self.global_iterations
        self.model.eval()
        for _iter, _data in enumerate(self.overlook):
            self.model.clear()
            output = self.render.vis(_data, self.model)
            vis = self.render.tensor_to_bgr(output["render"][0])
            outname = os.path.join(
                self.exp, "overlook", f"{mode}_{iteration:06d}_{_iter:02d}.jpg"
            )
            imwrite(outname, vis)
        self.model.train()

    def make_overlook_oneframe(self, iteration=-1):
        if self.overlook_oneframe is None:
            return
        iteration = self.global_iterations // max(self.overlook_oneframe_freq, 1)
        data = self.overlook_oneframe[iteration % len(self.overlook_oneframe)]
        batch = {
            "camera": {k: np.asarray(v)[None] for k, v in data["camera"].items()},
            "index": np.asarray([data["index"]]),
        }
        self.model.eval()
        self.model.clear()
        output = self.render.vis(batch, self.model)
        vis = self.render.tensor_to_bgr(output["render"][0])
        outname = os.path.join(
            self.exp, "overlook_oneframe", "rgb", f"{iteration:06d}.jpg"
        )
        imwrite(outname, vis)
        self.model.train()

    # --------------------------------------------------------- checkpoint
    def log_device_memory(self):
        """HBM usage scalars (the reference logs CUDA MB;
        LoG/utils/trainer.py:234-236)."""
        try:
            import jax

            stats = jax.local_devices()[0].memory_stats()
            if stats:
                self.recorder.log(
                    self.global_iterations, "train/memory",
                    stats.get("bytes_in_use", 0) / 2**20,
                )
                self.recorder.log(
                    self.global_iterations, "train/max_mem",
                    stats.get("peak_bytes_in_use", 0) / 2**20,
                )
        except Exception:
            pass

    def log_point_cloud(self, output):
        """Export the current visible cut as PLY
        (LoG/utils/trainer.py:224-232)."""
        from .file import write_ply

        model = self.model
        arrays = model.gaussian.to_numpy(["xyz", "colors"])
        xyz = arrays["xyz"]
        colors = np.clip(
            arrays["colors"] * 0.28209479177387814 + 0.5, 0, 1
        )
        outname = os.path.join(
            self.exp, "pointcloud", f"{self.global_iterations:06d}.ply"
        )
        write_ply(outname, xyz, colors)

    def save_ckpt(self, ckptname):
        state_dict = self.model.state_dict()
        payload = {
            "state_dict": state_dict,
            "global_iterations": self.global_iterations,
        }
        os.makedirs(os.path.dirname(ckptname) or ".", exist_ok=True)
        with open(ckptname, "wb") as f:
            pickle.dump(payload, f)
        wotrain = {
            k: v
            for k, v in state_dict.items()
            if "optimizer" not in k and "counter" not in k
        }
        with open(ckptname.replace(".pth", "_wotrain.pth"), "wb") as f:
            pickle.dump(wotrain, f)

    def check_iteration(self, stage_name, iteration, cfg_iteration):
        if cfg_iteration == -1:
            return False
        if isinstance(cfg_iteration, int) and iteration % cfg_iteration == 0:
            return True
        if isinstance(cfg_iteration, dict):
            if stage_name not in cfg_iteration:
                return False
            iters = cfg_iteration[stage_name]
            if iters[0] < iteration < iters[1] and iteration % iters[2] == 0:
                return True
        return False

    # ---------------------------------------------------------------- fit
    def fit(self, dataset):
        self.global_iterations = 0
        self.global_start_time = time.time()
        for stage_name, stage in self.cfg.train.stages.items():
            print(
                f"> Run stage: {stage_name}. "
                f"{stage.loader.args.iterations * self.model.base_iter} iterations"
            )
            ckptname = stage.get("ckptname", join(self.exp, f"model_{stage_name}.pth"))
            if os.path.exists(ckptname):
                print(f"Load checkpoint: {ckptname}")
                from .command import load_statedict

                self.model.load_state_dict(load_statedict(ckptname), split="train")
                self.global_iterations += (
                    stage.loader.args.iterations * self.model.base_iter
                )
                continue
            dataset.set_state(**stage.get("dataset_state", {}))
            # GT device cache: valid only for full-frame datasets (random
            # crops change content under the same (view, shape) key)
            cs = tuple(getattr(dataset, "crop_size", (-1, -1)) or (-1, -1))
            self._gt_cache_ok = cs == (-1, -1)
            self._gt_dev_cache = {}
            self._gt_cache_bytes = 0
            self.model.set_stage(stage_name)
            self.model.set_state(**stage.get("model_state", {}))
            if "render_state" in stage:
                self.render.set_state(**stage.render_state)
            self.model.training_setup()
            self._make_executor()
            trainloader = self.train_loader(
                dataset, stage.loader.args, base_iter=self.model.base_iter
            )
            if self.val is not None:
                self.make_validation(self.global_iterations + 1)
            self.start_time = time.time()
            loss_window = []
            need_log = True
            n_batches = len(trainloader)
            for iteration, data in enumerate(trainloader):
                self.model.clear()
                self.render.iteration = self.global_iterations
                flag, output, loss = self.training_step(self.model, data)
                if not flag:
                    self.global_iterations += 1
                    continue
                loss_window.append(loss)  # device scalars; no sync
                if (iteration + 1) % self.log_interval == 0 or need_log:
                    need_log = False
                    mean_loss = float(np.mean([float(x) for x in loss_window[-self.log_interval:]])) if loss_window else 0.0
                    self.log_in_training(
                        iteration, n_batches, data, mean_loss, output
                    )
                    if (iteration + 1) % self.log_interval == 0 and iteration > 0:
                        self.recorder.log(
                            self.global_iterations, "train/loss_mean", mean_loss
                        )
                        loss_window = []
                if self.val is not None and (iteration + 1) % self.cfg.val.iteration == 0:
                    self._sync_parallel()
                    self.make_validation(self.global_iterations)
                if self.overlook is not None and self.check_iteration(
                    stage_name, iteration + 1, self.cfg.overlook.iteration
                ):
                    self.make_overlook()
                if self.overlook_oneframe is not None and (
                    iteration % self.overlook_oneframe_freq == 0
                ):
                    self.make_overlook_oneframe()
                if (iteration + 1) % self.save_interval == 0:
                    name = "model_latest.pth"
                    print("Save checkpoint...: ", join(self.exp, name))
                    self._sync_parallel()
                    self.save_ckpt(join(self.exp, name))
                if (iteration + 1) < n_batches:
                    mutates = (
                        self.executor is None
                        or self.model.densify_due(iteration)
                    )
                    if self.executor is not None and mutates:
                        self.executor.sync_to_model()
                    flag_update = self.model.update_by_iteration(
                        iteration, self.global_iterations
                    )
                    if self.executor is not None and mutates:
                        self.executor.refresh_from_model()
                    if flag_update:
                        need_log = True
                        self.recorder.log(
                            self.global_iterations,
                            "train/num_points",
                            self.model.num_points,
                        )
                if self.global_iterations % 10 == 0:
                    self.recorder.log(self.global_iterations, "train/lr", self.model.lr)
                self.global_iterations += 1
            self._sync_parallel()
            ckptname = join(self.exp, f"model_{stage_name}.pth")
            self.save_ckpt(ckptname)

    def log_in_training(self, batch_idx, batch_total, data, loss, output):
        self._sync_parallel()  # __repr__ / vis read host-side model state
        global_time = time.time() - self.global_start_time
        self.recorder.log(self.global_iterations, "train/time", global_time)
        current_time = time.time() - getattr(self, "start_time", time.time())
        print(
            f"[{self.global_iterations:6d}: {batch_idx:6d}/{batch_total:6d}] "
            f"{current_time:4.1f}s loss: {loss:.4f} model {self.model}"
        )
        self.start_time = time.time()
        self.recorder.log(
            self.global_iterations, "train/num_points", self.model.num_points
        )
        self.log_device_memory()
        if self.cfg.get("log_pointcloud", False):
            try:
                self.log_point_cloud(output)
            except Exception:
                print("log point cloud failed")
        if not self.save_vis:
            return
        try:
            render = np.asarray(output["render"])
            gt = np.asarray(output["gt"])
            vis = np.hstack(
                [self.render.tensor_to_bgr(gt), self.render.tensor_to_bgr(render)]
            )
            outname = os.path.join(
                self.exp, "vis", f"{self.global_iterations:06d}.jpg"
            )
            imwrite(outname, vis)
        except Exception as exc:  # visualization must never kill training
            print(f"[Trainer] vis failed: {exc}")
        self.recorder.log(
            self.global_iterations, "train/num_points", self.model.num_points
        )
