"""EasyMoCap-style camera file I/O (intri.yml / extri.yml) + helpers.

File-format contract: LoG/dataset/camera_utils.py (OpenCV FileStorage YAML
with K_/dist_/H_/W_ in intri.yml and R_(rodrigues)/Rot_/T_ in extri.yml, plus
a 'names' list). Reading uses cv2.FileStorage; writing emits the same manual
YAML layout so files round-trip with the reference tooling.
"""
from __future__ import annotations

import os
from os.path import join

import numpy as np


def _cv2():
    import cv2

    return cv2


class FileStorage:
    def __init__(self, filename, is_write=False):
        cv2 = _cv2()
        self.is_write = is_write
        if is_write:
            os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
            self.fs = open(filename, "w")
            self.fs.write("%YAML:1.0\r\n---\r\n")
        else:
            assert os.path.exists(filename), filename
            self.fs = cv2.FileStorage(filename, cv2.FILE_STORAGE_READ)

    def __del__(self):
        try:
            if self.is_write:
                self.fs.close()
            else:
                self.fs.release()
        except Exception:
            pass

    def _write(self, out):
        self.fs.write(out + "\r\n")

    def write(self, key, value, dt="mat"):
        if dt == "mat":
            value = np.asarray(value)
            self._write(f"{key}: !!opencv-matrix")
            self._write(f"  rows: {value.shape[0]}")
            self._write(f"  cols: {value.shape[1]}")
            self._write("  dt: d")
            data = ", ".join(f"{v:.6f}" for v in value.reshape(-1))
            self._write(f"  data: [{data}]")
        elif dt == "list":
            self._write(f"{key}:")
            for elem in value:
                self._write(f'  - "{elem}"')
        elif dt == "int":
            self._write(f"{key}: {value}")

    def read(self, key, dt="mat"):
        if dt == "mat":
            node = self.fs.getNode(key)
            return None if node.empty() else node.mat()
        if dt == "list":
            n = self.fs.getNode(key)
            results = []
            for i in range(n.size()):
                val = n.at(i).string()
                if val == "":
                    val = str(int(n.at(i).real()))
                if val != "none":
                    results.append(val)
            return results
        if dt == "int":
            node = self.fs.getNode(key)
            return None if node.empty() else int(node.real())
        raise NotImplementedError(dt)


def read_camera(intri_name, extri_name, cam_names=()):
    cv2 = _cv2()
    intri = FileStorage(intri_name)
    extri = FileStorage(extri_name)
    cams = {}
    names = intri.read("names", dt="list")
    for cam in names:
        c = {}
        c["K"] = intri.read(f"K_{cam}")
        c["invK"] = np.linalg.inv(c["K"])
        H = intri.read(f"H_{cam}", dt="int")
        W = intri.read(f"W_{cam}", dt="int")
        if H is None or W is None:
            print(f"[camera] no H or W for {cam}")
            H, W = -1, -1
        c["H"], c["W"] = H, W
        rvec = extri.read(f"R_{cam}")
        tvec = extri.read(f"T_{cam}")
        assert rvec is not None, cam
        R = cv2.Rodrigues(rvec)[0]
        c["RT"] = np.hstack((R, tvec))
        c["R"] = R
        c["Rvec"] = rvec
        c["T"] = tvec
        c["center"] = -R.T @ tvec
        c["P"] = c["K"] @ c["RT"]
        c["dist"] = intri.read(f"dist_{cam}")
        if c["dist"] is None:
            c["dist"] = intri.read(f"D_{cam}")
            if c["dist"] is None:
                print(f"[camera] no dist for {cam}")
        cams[cam] = c
    cams["basenames"] = names
    return cams


def read_cameras(path, intri="intri.yml", extri="extri.yml", subs=()):
    if os.path.isfile(path):
        path = os.path.dirname(path)
    cameras = read_camera(join(path, intri), join(path, extri))
    cameras.pop("basenames")
    if len(subs) > 0:
        cameras = {key: cameras[key] for key in subs}
    return cameras


def write_camera(camera, path):
    cv2 = _cv2()
    intri = FileStorage(join(path, "intri.yml"), True)
    extri = FileStorage(join(path, "extri.yml"), True)
    camnames = [k.split(".")[0] for k in camera.keys() if k != "basenames"]
    intri.write("names", camnames, "list")
    extri.write("names", camnames, "list")
    for key_, val in camera.items():
        if key_ == "basenames":
            continue
        key = key_.split(".")[0]
        intri.write(f"K_{key}", val["K"])
        intri.write(f"dist_{key}", np.asarray(val["dist"]).reshape(1, -1))
        if "H" in val and "W" in val:
            intri.write(f"H_{key}", val["H"], dt="int")
            intri.write(f"W_{key}", val["W"], dt="int")
        if "Rvec" not in val:
            val["Rvec"] = cv2.Rodrigues(val["R"])[0]
        extri.write(f"R_{key}", val["Rvec"])
        extri.write(f"Rot_{key}", val["R"])
        extri.write(f"T_{key}", val["T"])


def camera_from_img(img):
    height, width = img.shape[:2]
    focal = 1.2 * min(height, width)
    K = np.array([[focal, 0, width / 2], [0, focal, height / 2], [0, 0, 1]])
    camera = {
        "K": K,
        "R": np.eye(3),
        "T": np.zeros((3, 1)),
        "dist": np.zeros((1, 5)),
    }
    camera["invK"] = np.linalg.inv(K)
    camera["P"] = K @ np.hstack((camera["R"], camera["T"]))
    return camera


def interp_cameras(cameras, keys, step=20, loop=True, allstep=-1, **kwargs):
    """Slerp rotations + slerped centers between selected cameras
    (LoG/dataset/camera_utils.py:318-371)."""
    from scipy.spatial.transform import Rotation as R
    from scipy.spatial.transform import Slerp

    if allstep != -1:
        tall = np.linspace(0.0, 1.0, allstep + 1)[:-1].reshape(-1, 1, 1)
    elif loop:
        tall = np.linspace(0.0, 1.0, 1 + step * len(keys))[:-1].reshape(-1, 1, 1)
    else:
        tall = np.linspace(0.0, 1.0, 1 + step * (len(keys) - 1))[:-1].reshape(
            -1, 1, 1
        )
    cameras_new = {}
    for ik in range(len(keys)):
        if ik == len(keys) - 1 and not loop:
            break
        if loop:
            start = (ik * tall.shape[0]) // len(keys)
            end = int((ik + 1) * tall.shape[0]) // len(keys)
        else:
            start = (ik * tall.shape[0]) // (len(keys) - 1)
            end = int((ik + 1) * tall.shape[0]) // (len(keys) - 1)
        t = tall[start:end].copy()
        t = (t - t.min()) / max(t.max() - t.min(), 1e-9)
        left = keys[ik]
        right = keys[0 if ik == len(keys) - 1 else ik + 1]
        cl, cr = cameras[left], cameras[right]
        center_l = (-cl["R"].T @ cl["T"])[None]
        center_r = (-cr["R"].T @ cr["T"])[None]
        norm_l, norm_r = np.linalg.norm(center_l), np.linalg.norm(center_r)
        ul, ur = center_l / norm_l, center_r / norm_r
        costheta = float((ul * ur).sum())
        sintheta = np.sqrt(max(1.0 - costheta**2, 1e-12))
        theta = np.arctan2(sintheta, costheta)
        centers = (np.sin(theta * (1 - t)) * ul + np.sin(theta * t) * ur) / sintheta
        centers = centers * (norm_l * (1 - t) + norm_r * t)
        slerp = Slerp([0, 1], R.from_matrix(np.stack([cl["R"], cr["R"]])))
        interp_rots = slerp(t.squeeze()).as_matrix()
        T = -np.einsum("bmn,bno->bmo", interp_rots, centers)
        K = cl["K"] * (1 - t) + cr["K"] * t
        for i in range(T.shape[0]):
            cameras_new[f"{left}-{right}-{i}"] = {
                "K": K[i],
                "dist": np.zeros((1, 5)),
                "R": interp_rots[i],
                "T": T[i],
            }
    return cameras_new


def get_center_and_diag(cam_centers):
    center = np.mean(cam_centers, axis=0, keepdims=True)
    dist = np.linalg.norm(cam_centers - center, axis=1)
    return center.flatten(), np.max(dist) * 1.1
