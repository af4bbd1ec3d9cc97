"""COLMAP binary and text parsers (cameras, images, points3D).

Behavioral port of scene/colmap_loader.py:1-294 — the file formats are
fixed by COLMAP, so the parsing logic is necessarily similar, but this is
a fresh numpy implementation (bulk struct reads instead of per-record
loops where the format allows).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import Dict

import numpy as np

# COLMAP camera model ids -> (name, num_params) (colmap_loader.py:69-83)
CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3),
    1: ("PINHOLE", 4),
    2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5),
    4: ("OPENCV", 8),
    5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12),
    7: ("FOV", 5),
    8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5),
    10: ("THIN_PRISM_FISHEYE", 12),
}
CAMERA_MODEL_IDS = {name: mid for mid, (name, _) in CAMERA_MODELS.items()}


@dataclass
class ColmapCamera:
    id: int
    model: str
    width: int
    height: int
    params: np.ndarray


@dataclass
class ColmapImage:
    id: int
    qvec: np.ndarray  # (4,) wxyz
    tvec: np.ndarray  # (3,)
    camera_id: int
    name: str
    xys: np.ndarray
    point3d_ids: np.ndarray


def qvec2rotmat(qvec):
    """Quaternion (w,x,y,z) -> rotation matrix (colmap_loader.py:43-53)."""
    w, x, y, z = qvec
    return np.array(
        [
            [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * w * z, 2 * x * z + 2 * w * y],
            [2 * x * y + 2 * w * z, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * w * x],
            [2 * x * z - 2 * w * y, 2 * y * z + 2 * w * x, 1 - 2 * x * x - 2 * y * y],
        ]
    )


def rotmat2qvec(R):
    Rxx, Ryx, Rzx, Rxy, Ryy, Rzy, Rxz, Ryz, Rzz = R.flat
    K = (
        np.array(
            [
                [Rxx - Ryy - Rzz, 0, 0, 0],
                [Ryx + Rxy, Ryy - Rxx - Rzz, 0, 0],
                [Rzx + Rxz, Rzy + Ryz, Rzz - Rxx - Ryy, 0],
                [Ryz - Rzy, Rzx - Rxz, Rxy - Ryx, Rxx + Ryy + Rzz],
            ]
        )
        / 3.0
    )
    eigvals, eigvecs = np.linalg.eigh(K)
    qvec = eigvecs[[3, 0, 1, 2], np.argmax(eigvals)]
    if qvec[0] < 0:
        qvec *= -1
    return qvec


def _read(f, n, fmt):
    return struct.unpack("<" + fmt, f.read(n))


# ---------------- binary readers ----------------

def read_cameras_binary(path) -> Dict[int, ColmapCamera]:
    out = {}
    with open(path, "rb") as f:
        (num,) = _read(f, 8, "Q")
        for _ in range(num):
            cid, model_id, w, h = _read(f, 24, "iiQQ")
            name, nparams = CAMERA_MODELS[model_id]
            params = np.array(_read(f, 8 * nparams, "d" * nparams))
            out[cid] = ColmapCamera(id=cid, model=name, width=w, height=h, params=params)
    return out


def read_images_binary(path) -> Dict[int, ColmapImage]:
    out = {}
    with open(path, "rb") as f:
        (num,) = _read(f, 8, "Q")
        for _ in range(num):
            iid = _read(f, 4, "i")[0]
            qvec = np.array(_read(f, 32, "dddd"))
            tvec = np.array(_read(f, 24, "ddd"))
            (camera_id,) = _read(f, 4, "i")
            name = b""
            c = f.read(1)
            while c != b"\x00":
                name += c
                c = f.read(1)
            (npts,) = _read(f, 8, "Q")
            # Records are (x: f64, y: f64, point3D_id: i64); bulk-read the
            # 24-byte stride and reinterpret the id column's bit pattern.
            data = np.frombuffer(f.read(24 * npts), dtype=np.float64).reshape(npts, 3)
            xys = data[:, :2].copy()
            ids = np.frombuffer(np.ascontiguousarray(data[:, 2]).tobytes(), dtype=np.int64)
            out[iid] = ColmapImage(
                id=iid,
                qvec=qvec,
                tvec=tvec,
                camera_id=camera_id,
                name=name.decode("utf-8"),
                xys=xys,
                point3d_ids=ids,
            )
    return out


def read_points3d_binary(path):
    """Returns (xyz (N,3) f64, rgb (N,3) u8, errors (N,))."""
    from gaussian_splatting_tpu.utils.native import get_native

    native = get_native()
    if native is not None:
        # one-pass C++ parse (native/gs_native.cc); the variable-length
        # track records force a per-point loop in pure Python
        return native.read_points3d_bin(str(path))
    with open(path, "rb") as f:
        (num,) = _read(f, 8, "Q")
        xyz = np.empty((num, 3))
        rgb = np.empty((num, 3), np.uint8)
        err = np.empty((num,))
        for i in range(num):
            pid, x, y, z, r, g, b, e = _read(f, 43, "QdddBBBd")
            xyz[i] = (x, y, z)
            rgb[i] = (r, g, b)
            err[i] = e
            (tlen,) = _read(f, 8, "Q")
            f.seek(8 * tlen, 1)  # skip the track
    return xyz, rgb, err


# ---------------- text readers ----------------

def read_cameras_text(path) -> Dict[int, ColmapCamera]:
    out = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            e = line.split()
            out[int(e[0])] = ColmapCamera(
                id=int(e[0]),
                model=e[1],
                width=int(e[2]),
                height=int(e[3]),
                params=np.array(tuple(map(float, e[4:]))),
            )
    return out


def read_images_text(path) -> Dict[int, ColmapImage]:
    out = {}
    with open(path) as f:
        lines = [l.strip() for l in f if l.strip() and not l.startswith("#")]
    for head, pts in zip(lines[0::2], lines[1::2]):
        e = head.split()
        pe = pts.split()
        xys = np.array(pe, dtype=np.float64).reshape(-1, 3)[:, :2] if pe else np.zeros((0, 2))
        ids = (
            np.array(pe[2::3], dtype=np.int64) if pe else np.zeros((0,), np.int64)
        )
        out[int(e[0])] = ColmapImage(
            id=int(e[0]),
            qvec=np.array(e[1:5], dtype=np.float64),
            tvec=np.array(e[5:8], dtype=np.float64),
            camera_id=int(e[8]),
            name=e[9],
            xys=xys,
            point3d_ids=ids,
        )
    return out


def read_points3d_text(path):
    xyz, rgb, err = [], [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            e = line.split()
            xyz.append(tuple(map(float, e[1:4])))
            rgb.append(tuple(map(int, e[4:7])))
            err.append(float(e[7]))
    return (
        np.array(xyz).reshape(-1, 3),
        np.array(rgb, np.uint8).reshape(-1, 3),
        np.array(err),
    )


# ---------------- binary writers (for tests / convert) ----------------

def write_cameras_binary(cams: Dict[int, ColmapCamera], path):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(cams)))
        for c in cams.values():
            mid = CAMERA_MODEL_IDS[c.model]
            f.write(struct.pack("<iiQQ", c.id, mid, c.width, c.height))
            f.write(struct.pack("<" + "d" * len(c.params), *c.params))


def write_images_binary(images: Dict[int, ColmapImage], path):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(images)))
        for im in images.values():
            f.write(struct.pack("<i", im.id))
            f.write(struct.pack("<dddd", *im.qvec))
            f.write(struct.pack("<ddd", *im.tvec))
            f.write(struct.pack("<i", im.camera_id))
            f.write(im.name.encode() + b"\x00")
            n = im.xys.shape[0]
            f.write(struct.pack("<Q", n))
            for i in range(n):
                f.write(struct.pack("<ddq", im.xys[i, 0], im.xys[i, 1], int(im.point3d_ids[i])))


def write_points3d_binary(xyz, rgb, err, path):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", xyz.shape[0]))
        for i in range(xyz.shape[0]):
            f.write(struct.pack("<QdddBBBd", i, *xyz[i], *rgb[i].astype(int), float(err[i])))
            f.write(struct.pack("<Q", 0))
