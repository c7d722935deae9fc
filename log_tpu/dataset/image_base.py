"""Dataset base: camera list handling, cache, image/depth/mask readers.

Contract: LoG/dataset/image_base.py.
"""
from __future__ import annotations

import os
import pickle
from os.path import join

import numpy as np


class ImageBase:
    def __init__(
        self,
        cache=None,
        cameras="",
        namelist=None,
        ignorelist=None,
        znear=0.01,
        zfar=100.0,
        offset=(0.0, 0.0, 0.0),
    ):
        self.cache = cache
        self.cameras = cameras
        if namelist is not None and isinstance(namelist, str):
            if os.path.exists(namelist):
                with open(namelist) as f:
                    namelist = f.readlines()
        self.namelist = namelist
        self.ignorelist = ignorelist
        self.offset = np.array(offset, np.float32).reshape(3, 1)
        self.use_cache = False
        self.read_img = True
        self.znear = znear
        self.zfar = zfar
        self.partial_indices = None

    def __len__(self):
        raise NotImplementedError

    def __getitem__(self, index):
        raise NotImplementedError

    def write_cache(self, infos, name="cache"):
        cachename = name if name.endswith(".pkl") else join(self.cache, name + ".pkl")
        if not os.path.exists(cachename):
            print("write cache to ", cachename)
            os.makedirs(os.path.dirname(cachename), exist_ok=True)
            with open(cachename, "wb") as f:
                pickle.dump(infos, f)

    def read_cache(self, name="cache"):
        cachename = name if name.endswith(".pkl") else join(self.cache, name + ".pkl")
        if os.path.exists(cachename):
            with open(cachename, "rb") as f:
                return True, pickle.load(f)
        return False, None

    def set_partial_indices(self, partial):
        self.partial_indices = partial
        print(f"[{self.__class__.__name__}] set partial indices {len(partial)}")

    def check_cameras(self, scale3d=-1, scale_camera_K=1.0):
        """Load + recentre cameras (LoG/dataset/image_base.py:64-95)."""
        from .camera_utils import read_cameras

        cameras = read_cameras(join(self.root, self.cameras))
        print(
            "Loaded {} cameras from {}".format(
                len(cameras), join(self.root, self.cameras)
            )
        )
        if self.namelist is not None:
            cameras = {name.strip(): cameras[name.strip()] for name in self.namelist}
        if self.ignorelist is not None:
            ignorelist = self.ignorelist
            if isinstance(ignorelist, str):
                with open(ignorelist) as f:
                    ignorelist = f.readlines()
            for name in ignorelist:
                cameras.pop(name.strip(), None)
        print(f"scale3d = {scale3d}")
        if scale3d > 0:
            for camera in cameras.values():
                center = -np.dot(camera["R"].T, camera["T"] * scale3d) - self.offset
                camera["center"] = center
                camera["T"] = -camera["R"] @ center
        if scale_camera_K != 1.0:
            for camera in cameras.values():
                camera["K"][:2, :] *= scale_camera_K
                camera["W"] = int(scale_camera_K * camera["W"])
                camera["H"] = int(scale_camera_K * camera["H"])
        return cameras

    @staticmethod
    def read_image(imgname):
        import cv2

        assert os.path.exists(imgname), imgname
        img = cv2.imread(imgname)
        assert img is not None, imgname
        img = img.astype(np.float32) / 255.0
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    def read_image_with_cache(self, imgname):
        if self.use_cache:
            if imgname in self.cache:
                return self.cache[imgname]
            img = self.read_image(imgname)
            self.cache[imgname] = img
            return img
        return self.read_image(imgname)

    def read_depth(self, depthname):
        import cv2

        assert os.path.exists(depthname), depthname
        depth = cv2.imread(depthname, -1)
        assert depth is not None, depthname
        return depth.astype(np.float32) / (2**16 - 1)

    def read_mask(self, mskname):
        import cv2

        assert os.path.exists(mskname), mskname
        msk = cv2.imread(mskname, -1)
        assert msk is not None, mskname
        return msk.astype(np.float32) / 255.0

    @staticmethod
    def make_video(path, remove_image=False, fps=30):
        cmd = (
            f'ffmpeg -y -r {fps} -i {path}/%06d.jpg -vf '
            f'scale="2*ceil(iw/2):2*ceil(ih/2)" -vcodec libx264 -r {fps} '
            f"{path}.mp4 -loglevel quiet"
        )
        print(cmd)
        if os.system(cmd) != 0 or not os.path.exists(path + ".mp4"):
            _cv2_video_fallback(path, fps)


def _cv2_video_fallback(path, fps=30):
    """mp4 via OpenCV when ffmpeg is absent (same frames, mp4v codec)."""
    import glob

    import cv2

    frames = sorted(glob.glob(os.path.join(path, "*.jpg")))
    if not frames:
        return
    first = cv2.imread(frames[0])
    h, w = first.shape[:2]
    vw = cv2.VideoWriter(
        path + ".mp4", cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    if not vw.isOpened():
        print(f"[make_video] cv2 writer failed for {path}.mp4")
        return
    for f in frames:
        vw.write(cv2.imread(f))
    vw.release()
    print(f"[make_video] wrote {path}.mp4 via cv2 ({len(frames)} frames)")
