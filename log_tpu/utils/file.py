"""Point-cloud and checkpoint I/O (host-side).

Replaces LoG/utils/file.py. The simple-knn CUDA extension (distCUDA2, used at
LoG/utils/file.py:88-91 for initial scales) is replaced by a scipy cKDTree
query — a one-shot init cost on the host, not a hot path.
"""
from __future__ import annotations

import os

import numpy as np


def read_ply(filename):
    """Minimal binary/ascii PLY vertex reader (x, y, z, red, green, blue)."""
    try:
        from plyfile import PlyData  # optional

        plydata = PlyData.read(filename)
        v = plydata["vertex"]
        xyz = np.vstack([v["x"], v["y"], v["z"]]).T
        rgb = np.vstack([v["red"], v["green"], v["blue"]]).T / 255.0
        return xyz, rgb
    except ImportError:
        pass
    return _read_ply_builtin(filename)


def _read_ply_builtin(filename):
    with open(filename, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii").strip()
            header.append(line)
            if line == "end_header":
                break
        fmt = next(l for l in header if l.startswith("format")).split()[1]
        n_vertex = int(
            next(l for l in header if l.startswith("element vertex")).split()[-1]
        )
        props = []
        in_vertex = False
        for line in header:
            if line.startswith("element"):
                in_vertex = line.startswith("element vertex")
            elif line.startswith("property") and in_vertex:
                _, typ, name = line.split()
                props.append((name, typ))
        np_types = {
            "float": "f4", "float32": "f4", "double": "f8",
            "uchar": "u1", "uint8": "u1", "int": "i4", "int32": "i4",
            "short": "i2", "ushort": "u2",
        }
        if fmt == "ascii":
            data = np.loadtxt(f, max_rows=n_vertex)
            names = [p[0] for p in props]
            rec = {name: data[:, i] for i, name in enumerate(names)}
        else:
            endian = "<" if "little" in fmt else ">"
            dtype = np.dtype([(n, endian + np_types[t]) for n, t in props])
            rec_arr = np.frombuffer(f.read(n_vertex * dtype.itemsize), dtype=dtype)
            rec = {n: rec_arr[n] for n, _ in props}
    xyz = np.stack([rec["x"], rec["y"], rec["z"]], axis=1).astype(np.float64)
    if "red" in rec:
        rgb = np.stack([rec["red"], rec["green"], rec["blue"]], axis=1) / 255.0
    else:
        rgb = np.full_like(xyz, 0.5)
    return xyz, rgb


def write_ply(outname, xyz, colors):
    """Binary little-endian PLY writer (LoG/utils/file.py:13-31 contract)."""
    os.makedirs(os.path.dirname(outname) or ".", exist_ok=True)
    colors = (np.clip(colors, 0, 1) * 255).astype(np.uint8)
    n = xyz.shape[0]
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "end_header\n"
    )
    rec = np.zeros(
        n,
        dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
               ("red", "u1"), ("green", "u1"), ("blue", "u1")],
    )
    rec["x"], rec["y"], rec["z"] = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    rec["red"], rec["green"], rec["blue"] = colors[:, 0], colors[:, 1], colors[:, 2]
    with open(outname, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(rec.tobytes())


def load_pointcloud(filename, scale3d=1.0, **kwargs):
    """Load xyz + rgb from .npz/.ply (LoG/utils/file.py:41-72 contract)."""
    assert os.path.exists(filename), f"file not found: {filename}"
    if isinstance(filename, dict):
        return np.asarray(filename["xyz"]), np.asarray(filename["colors"])
    if filename.endswith(".npz"):
        data = dict(np.load(filename))
        xyz = scale3d * data["xyz"]
        rgb = data["rgb"] / 255.0
    elif filename.endswith(".ply"):
        xyz, rgb = read_ply(filename)
        xyz = scale3d * xyz
    else:
        raise NotImplementedError(filename)
    if "offset" in kwargs:
        xyz = xyz - np.asarray(kwargs["offset"]).reshape(1, 3)
    return xyz.astype(np.float32), rgb.astype(np.float32)


def knn_mean_sq_dist(xyz: np.ndarray, k: int = 3) -> np.ndarray:
    """Mean squared distance to the k nearest neighbors per point.

    Drop-in for simple_knn._C.distCUDA2 (LoG/utils/file.py:88-91). Uses the
    native C++ grid-hash (log_tpu/native/knn.cpp) when it builds, else a
    scipy cKDTree; init-only cost either way.
    """
    try:
        from ..native import knn_mean_sq_dist as native_knn

        out = native_knn(xyz, k=k)
        if out is not None:
            return out
    except Exception as exc:
        print(f"[knn] native path unavailable ({exc}); scipy fallback")
    from scipy.spatial import cKDTree

    tree = cKDTree(xyz)
    d, _ = tree.query(xyz, k=k + 1, workers=-1)  # first neighbor is self
    return np.mean(d[:, 1:] ** 2, axis=1)


def create_from_point(filename, scale3d=1.0, ret_scale=True, **kwargs):
    """xyz/colors/scales triple for Gaussian init (LoG/utils/file.py:74-95)."""
    if isinstance(filename, dict):
        xyz = np.asarray(filename["xyz"], np.float32)
        colors = np.asarray(filename["colors"], np.float32)
    else:
        xyz, colors = load_pointcloud(filename, scale3d, **kwargs)
    if ret_scale:
        dist2 = np.maximum(knn_mean_sq_dist(xyz, k=3), 1e-7)
        scales = np.sqrt(dist2).astype(np.float32)
    else:
        scales = None
    return xyz, colors, scales
