"""COLMAP-scene dataset with chunked multi-scale image cache.

Contract: LoG/dataset/colmap.py — first run undistorts every image once per
physical camera (cv2.getOptimalNewCameraMatrix + initUndistortRectifyMap) and
writes an INTER_AREA-downsampled copy at every pyramid scale into
``cache/<scale>/<imgname>``; camera infos are pickled. Training then streams
the small cached images (the coarse-to-fine stages read scale 8/4/...). The
whole layer is host-side (numpy/OpenCV) — device work starts at the renderer.

Provenance note: this module is a deliberate BEHAVIORAL PORT of the
reference's host-side OpenCV ingest (LoG/dataset/colmap.py:11-97 —
``read_undistort_rescale_write`` / ``init_camera`` / ``check_undis_camera``
track it closely). The on-disk cache layout, undistortion parameters, and
camera-info pickle are the declared compatibility contract (SURVEY.md §7
phase 3): a cache produced by the reference must be readable here and vice
versa, so the structure is intentionally preserved rather than redesigned.
Everything device-facing lives elsewhere.
"""
from __future__ import annotations

import os
from os.path import join

import numpy as np

from .base import prepare_camera, rescale_camera
from .camera_utils import get_center_and_diag
from .image_base import ImageBase


def read_undistort_rescale_write(info):
    """Per-image cache fill (LoG/dataset/colmap.py:11-60)."""
    import cv2
    from PIL import Image

    flag_read_img = False
    for scale in info["scales"]:
        cachename = join(info["cache"], str(scale), info["imgname"])
        os.makedirs(os.path.dirname(cachename), exist_ok=True)
        if not os.path.exists(cachename):
            flag_read_img = True
            break
    else:
        return 0
    imgname = join(info["root"], info["imgname"])
    assert os.path.exists(imgname), imgname
    camera = info["camera"]
    if flag_read_img:
        # PIL honors EXIF orientation; cv2 does not
        img = np.asarray(Image.open(imgname))
        img = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
        assert img.shape[0] == camera["H"] and img.shape[1] == camera["W"], (
            f"{imgname}: {img.shape} != {camera['H']}, {camera['W']}"
        )
        if "mapx" in camera and "mapy" in camera:
            mapx, mapy = camera["mapx"], camera["mapy"]
        else:
            width, height = camera["W"], camera["H"]
            newK, _ = cv2.getOptimalNewCameraMatrix(
                camera["K"], camera["dist"], (width, height), 0, (width, height),
                centerPrincipalPoint=True,
            )
            mapx, mapy = cv2.initUndistortRectifyMap(
                camera["K"], camera["dist"], None, newK, (width, height), 5
            )
            camera["K"] = newK
        if mapx is not None and mapy is not None:
            img = cv2.remap(img, mapx, mapy, cv2.INTER_LINEAR)
    for scale in info["scales"]:
        cachename = join(info["cache"], str(scale), info["imgname"])
        if os.path.exists(cachename):
            continue
        W = int(camera["W"] / scale)
        H = int(camera["H"] / scale)
        dst = cv2.resize(img, (W, H), interpolation=cv2.INTER_AREA)
        os.makedirs(os.path.dirname(cachename), exist_ok=True)
        cv2.imwrite(cachename, dst)
    return 0


class ImageDataset(ImageBase):
    @staticmethod
    def init_camera(camera):
        import cv2

        width, height = camera["W"], camera["H"]
        assert width != 0 and height != 0
        dist = camera["dist"]
        if np.linalg.norm(dist) < 1e-5:
            return None, None, camera["K"].copy()
        newK, _ = cv2.getOptimalNewCameraMatrix(
            camera["K"], dist, (width, height), 0, (width, height),
            centerPrincipalPoint=True,
        )
        mapx, mapy = cv2.initUndistortRectifyMap(
            camera["K"], dist, None, newK, (width, height), 5
        )
        return mapx, mapy, newK

    def check_undis_camera(self, camname, cameras_cache, camera_undis,
                           share_camera=False):
        if share_camera:
            cache_camname = "cache"
        else:
            cache_camname = camname.split("/")[0] if "/" in camname else camname
        if cache_camname not in cameras_cache:
            print(f"[{self.__class__.__name__}] init camera {cache_camname}")
            cameras_cache[cache_camname] = self.init_camera(camera_undis)
        mapx, mapy, newK = cameras_cache[cache_camname]
        camera = {"K": newK, "mapx": mapx, "mapy": mapy}
        for key in ["R", "T", "W", "H", "center"]:
            camera[key] = camera_undis[key]
        return camera

    def __init__(
        self,
        root,
        cameras="sparse/0",
        scales=(1, 2, 4),
        scale3d=1.0,
        ext=".JPG",
        images="images",
        scale_camera_K=1.0,
        mask_ignore=None,
        foreground_mask=None,  # dir of binary masks -> item["mask"]
        pre_undis=True,
        share_camera=False,
        crop_size=(-1, -1),
        crop_ltrb=None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.root = os.path.abspath(root)
        self.cameras = cameras
        self.image_dir = images
        self.ext = ext
        self.mask_ignore = mask_ignore
        self.foreground_mask = foreground_mask
        self.scales = list(scales)
        self.downsample_scale = 1
        self.scale3d = scale3d
        self.crop_size = list(crop_size)
        self.crop_ltrb = crop_ltrb
        # crop draws run under the global seed (seed_everything) for
        # reproducible runs, like the reference's torch-global-seeded crops
        self.rng = np.random.default_rng(np.random.randint(0, 2**31 - 1))
        print(
            f"[{self.__class__.__name__}] set scales: {scales}, "
            f"crop size: {crop_size}"
        )
        if self.cache is None:
            self.cache = join(self.root, "cache")
            cachedir = self.cache
        elif self.cache.endswith(".pkl"):
            cachedir = join(self.root, self.cache.replace(".pkl", ""))
        else:
            cachedir = join(self.root, self.cache)
        self.cachedir = cachedir
        print(f"[{self.__class__.__name__}] cache dir: {self.cachedir}")
        flag, infos = self.read_cache(name=cachedir + ".pkl")
        if not flag:
            cameras_loaded = self.check_cameras(
                scale3d=scale3d, scale_camera_K=scale_camera_K
            )
            cameras_cache = {}
            infos = []
            for camname, camera_dis in cameras_loaded.items():
                if pre_undis:
                    camera = self.check_undis_camera(
                        camname, cameras_cache, camera_dis, share_camera
                    )
                else:
                    camera = camera_dis
                imgname = join(self.root, images, camname + ext)
                if not os.path.exists(imgname):
                    print("Not exists:", imgname)
                    continue
                infos.append(
                    {
                        "root": self.root,
                        "cache": cachedir,
                        "imgname": join(images, camname + ext),
                        "camera": camera.copy(),
                        "scales": list(scales),
                    }
                )
            print(
                f"[{self.__class__.__name__}] undistort and scale "
                f"{len(infos)} images "
            )
            for info in infos:
                read_undistort_rescale_write(info)
                info["camera"].pop("mapx", None)
                info["camera"].pop("mapy", None)
            self.write_cache(infos, name=cachedir + ".pkl")
        centers = np.stack(
            [-i["camera"]["R"].T @ i["camera"]["T"] for i in infos], axis=0
        )
        offset, radius = get_center_and_diag(centers)
        print(f"[{self.__class__.__name__}] offset: {offset}, radius: {radius}")
        self.center = offset
        self.radius = radius
        self.current_scale = self.scales[-1]
        self.infos = infos
        print(f"[{self.__class__.__name__}] init dataset with {len(infos)} images")

    def set_state(self, scale=None, crop_size=None, downsample_scale=1,
                  namelist=None):
        if scale is not None:
            assert scale in self.scales, f"scale {scale} not in {self.scales}"
            self.current_scale = scale
        self.downsample_scale = downsample_scale
        if crop_size is not None:
            print(f"[{self.__class__.__name__}] set crop size {crop_size}")
            self.crop_size = list(crop_size)
        print(
            f"[{self.__class__.__name__}] set scale {scale}, crop_size: "
            f"{self.crop_size}, downsample_scale: {downsample_scale}"
        )

    def __len__(self):
        if self.partial_indices is None:
            return len(self.infos)
        return len(self.partial_indices)

    def crop_image(self, img, crop_size):
        sample_x = int(self.rng.integers(0, img.shape[1] - crop_size[1] + 1))
        sample_y = int(self.rng.integers(0, img.shape[0] - crop_size[0] + 1))
        return sample_x, sample_y, sample_x + crop_size[1], sample_y + crop_size[0]

    @staticmethod
    def update_crop(img, camera, l, t, r, b):
        camera["K"] = camera["K"].copy()
        img = img[t:b, l:r]
        camera["K"][0, 2] -= l
        camera["K"][1, 2] -= t
        camera["W"] = r - l
        camera["H"] = b - t
        return img, camera

    def __getitem__(self, index):
        import cv2

        true_index = (
            index if self.partial_indices is None else self.partial_indices[index]
        )
        data = self.infos[true_index]
        imgname = join(self.cachedir, str(self.current_scale), data["imgname"])
        if self.read_img and os.path.exists(imgname):
            img = self.read_image_with_cache(imgname)
        else:
            img = imgname
        if self.downsample_scale != 1:
            scale = self.downsample_scale * self.current_scale
            camera = rescale_camera(data["camera"], scale)
            if self.read_img and not isinstance(img, str):
                img = cv2.resize(
                    img, (camera["W"], camera["H"]), interpolation=cv2.INTER_AREA
                )
        else:
            camera = rescale_camera(data["camera"], self.current_scale)
        msk = None
        if self.mask_ignore is not None:
            mskname = join(
                self.root,
                self.mask_ignore["path"],
                data["imgname"].replace(self.ext, ".png"),
            )
            if self.read_img and os.path.exists(mskname):
                msk = self.read_mask(mskname)
                if self.mask_ignore["type"] == "background":
                    border = int(msk.shape[0] // 50) * 2 + 1
                    kernel = np.ones((border, border), np.float32)
                    msk = cv2.dilate(msk, kernel)
                    msk = 1 - msk
        if self.crop_ltrb is not None and not isinstance(img, str):
            l, t, r, b = self.crop_ltrb
            img, camera = self.update_crop(img, camera, l, t, r, b)
        elif (
            self.crop_size[0] > 0 and self.crop_size[1] > 0
            and not isinstance(img, str)
        ):
            l, t, r, b = self.crop_image(img, self.crop_size)
            img, camera = self.update_crop(img, camera, l, t, r, b)
        camera = prepare_camera(camera, scale=1, znear=self.znear, zfar=self.zfar)
        ret = {
            "image": img,
            "imgname": imgname,
            "index": index,
            "true_index": true_index,
            "camera": camera,
        }
        if msk is not None:
            ret["mask_ignore"] = msk
        if self.foreground_mask is not None and self.read_img:
            # foreground mask for MaskForeground training/eval (the
            # reference's batch["mask"]; its public datasets leave the
            # producer to forks — here masks/<imgname>.png, resized to the
            # current scale)
            rel = os.path.relpath(
                data["imgname"].replace(self.ext, ".png"), self.image_dir
            )
            fname = join(self.root, self.foreground_mask, rel)
            if os.path.exists(fname):
                fmsk = self.read_mask(fname)
                if not isinstance(img, str) and fmsk.shape[:2] != img.shape[:2]:
                    fmsk = cv2.resize(
                        fmsk, (img.shape[1], img.shape[0]),
                        interpolation=cv2.INTER_NEAREST,
                    )
                ret["mask"] = fmsk
        ret.update(data.get("extra", {}))
        return ret


class DepthDataset(ImageDataset):
    """Adds 16-bit monocular depth maps (LoG/dataset/colmap.py:255-273)."""

    def __init__(self, depth_scale, depth_dir="depth", **kwargs):
        super().__init__(**kwargs)
        self.depth_scale = depth_scale
        self.depth_dir = depth_dir

    def __getitem__(self, index):
        ret = super().__getitem__(index)
        depthname = (
            ret["imgname"]
            .replace(self.image_dir, self.depth_dir)
            .replace(
                f"{os.sep}{self.current_scale}{os.sep}{self.depth_dir}",
                f"{os.sep}{self.depth_scale}{os.sep}{self.depth_dir}",
            )
            + ".png"
        )
        if self.read_img and os.path.exists(depthname):
            ret["depth"] = self.read_depth(depthname)
        else:
            ret["depth"] = depthname
        return ret
