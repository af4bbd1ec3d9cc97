"""Dataset readers: COLMAP scenes and Blender/NeRF-synthetic scenes.

Behavioral port of scene/dataset_readers.py:45-286:
- scene normalization radius = 1.1 x max camera-to-centroid distance
  (getNerfppNorm, :45-66)
- COLMAP reader: PINHOLE / SIMPLE_PINHOLE only (:91-104), every-8th-image
  test split when eval (llffhold=8, :171-177), points3D.bin/.txt -> .ply
  conversion cache (:186-199)
- Blender reader: OpenGL->COLMAP axis flip (:219-225), alpha compositing
  over white/black bg (:233-237), random 100k-point init (:262-271)
- resolution policy: -r in {1,2,4,8} divisors, else width cap at 1600 px
  (utils/camera_utils.py:22-39)
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass
from pathlib import Path
from typing import List, Optional

import numpy as np

from gaussian_splatting_tpu.scene import colmap, ply
from gaussian_splatting_tpu.scene.cameras import Camera, focal2fov, fov2focal, get_world2view


@dataclass
class CameraInfo:
    uid: int
    R: np.ndarray
    T: np.ndarray
    fovx: float
    fovy: float
    image_path: str
    image_name: str
    width: int
    height: int
    image: Optional[object] = None  # PIL image, lazily loaded


@dataclass
class SceneInfo:
    points: Optional[np.ndarray]
    colors: Optional[np.ndarray]
    normals: Optional[np.ndarray]
    train_cameras: List[CameraInfo]
    test_cameras: List[CameraInfo]
    nerf_normalization: dict
    ply_path: str


def get_nerfpp_norm(cam_infos: List[CameraInfo]) -> dict:
    centers = []
    for cam in cam_infos:
        w2c = get_world2view(cam.R, cam.T)
        centers.append(np.linalg.inv(w2c)[:3, 3])
    centers = np.stack(centers, axis=0)
    avg = centers.mean(axis=0)
    diagonal = float(np.linalg.norm(centers - avg, axis=1).max())
    return {"translate": -avg, "radius": diagonal * 1.1}


def read_colmap_scene(path: str, images_dir: Optional[str], eval_split: bool, llffhold: int = 8) -> SceneInfo:
    sparse = os.path.join(path, "sparse/0")
    if not os.path.isdir(sparse):
        sparse = os.path.join(path, "sparse")
    try:
        extr = colmap.read_images_binary(os.path.join(sparse, "images.bin"))
        intr = colmap.read_cameras_binary(os.path.join(sparse, "cameras.bin"))
    except FileNotFoundError:
        extr = colmap.read_images_text(os.path.join(sparse, "images.txt"))
        intr = colmap.read_cameras_text(os.path.join(sparse, "cameras.txt"))

    reading_dir = images_dir if images_dir else "images"
    cam_infos = []
    for key in extr:
        e = extr[key]
        c = intr[e.camera_id]
        R = colmap.qvec2rotmat(e.qvec).T  # stored as C2W rotation
        T = np.array(e.tvec)
        if c.model == "SIMPLE_PINHOLE":
            fovx = focal2fov(c.params[0], c.width)
            fovy = focal2fov(c.params[0], c.height)
        elif c.model == "PINHOLE":
            fovx = focal2fov(c.params[0], c.width)
            fovy = focal2fov(c.params[1], c.height)
        else:
            raise AssertionError(
                "Colmap camera model not handled: only undistorted datasets "
                "(PINHOLE or SIMPLE_PINHOLE cameras) supported!"
            )
        image_path = os.path.join(path, reading_dir, os.path.basename(e.name))
        cam_infos.append(
            CameraInfo(
                uid=c.id, R=R, T=T, fovx=fovx, fovy=fovy, image_path=image_path,
                image_name=os.path.basename(image_path).split(".")[0],
                width=c.width, height=c.height,
            )
        )
    cam_infos.sort(key=lambda x: x.image_name)

    if eval_split:
        train = [c for i, c in enumerate(cam_infos) if i % llffhold != 0]
        test = [c for i, c in enumerate(cam_infos) if i % llffhold == 0]
    else:
        train, test = cam_infos, []

    norm = get_nerfpp_norm(train)

    ply_path = os.path.join(sparse, "points3D.ply")
    if not os.path.exists(ply_path):
        try:
            xyz, rgb, _ = colmap.read_points3d_binary(os.path.join(sparse, "points3D.bin"))
        except FileNotFoundError:
            xyz, rgb, _ = colmap.read_points3d_text(os.path.join(sparse, "points3D.txt"))
        ply.save_point_cloud_ply(ply_path, xyz.astype(np.float32), rgb)
    points, colors, normals = ply.load_point_cloud_ply(ply_path)

    return SceneInfo(
        points=points, colors=colors, normals=normals,
        train_cameras=train, test_cameras=test,
        nerf_normalization=norm, ply_path=ply_path,
    )


def _read_transforms(path: str, fname: str, white_background: bool, extension=".png") -> List[CameraInfo]:
    from PIL import Image

    with open(os.path.join(path, fname)) as f:
        contents = json.load(f)
    fovx = contents["camera_angle_x"]
    cam_infos = []
    for idx, frame in enumerate(contents["frames"]):
        file_path = frame["file_path"]
        cam_name = os.path.join(path, file_path + (extension if not file_path.endswith(extension) else ""))
        c2w = np.array(frame["transform_matrix"])
        # OpenGL/Blender (Y up, Z back) -> COLMAP (Y down, Z forward)
        c2w[:3, 1:3] *= -1
        w2c = np.linalg.inv(c2w)
        R = w2c[:3, :3].T
        T = w2c[:3, 3]

        image = Image.open(cam_name)
        im_data = np.array(image.convert("RGBA"), dtype=np.float32) / 255.0
        bg = np.ones(3) if white_background else np.zeros(3)
        rgb = im_data[..., :3] * im_data[..., 3:4] + bg * (1 - im_data[..., 3:4])
        image = Image.fromarray((rgb * 255).astype(np.uint8), "RGB")

        fovy = focal2fov(fov2focal(fovx, image.size[0]), image.size[1])
        cam_infos.append(
            CameraInfo(
                uid=idx, R=R, T=T, fovx=fovx, fovy=fovy, image=image,
                image_path=cam_name, image_name=Path(cam_name).stem,
                width=image.size[0], height=image.size[1],
            )
        )
    return cam_infos


def read_blender_scene(path: str, white_background: bool, eval_split: bool, extension=".png") -> SceneInfo:
    train = _read_transforms(path, "transforms_train.json", white_background, extension)
    test = (
        _read_transforms(path, "transforms_test.json", white_background, extension)
        if os.path.exists(os.path.join(path, "transforms_test.json"))
        else []
    )
    if not eval_split:
        train = train + test
        test = []

    norm = get_nerfpp_norm(train)

    ply_path = os.path.join(path, "points3d.ply")
    if not os.path.exists(ply_path):
        # 100k random points like the reference (:263-267); env-tunable so
        # CPU tests do not pay for a six-figure KNN init.
        num_pts = int(os.environ.get("GS_TPU_BLENDER_INIT_POINTS", 100_000))
        xyz = np.random.random((num_pts, 3)) * 2.6 - 1.3
        shs = np.random.random((num_pts, 3)) / 255.0
        colors = shs * 0.28209479177387814 + 0.5  # SH2RGB
        ply.save_point_cloud_ply(ply_path, xyz.astype(np.float32), colors)
    points, colors, normals = ply.load_point_cloud_ply(ply_path)

    return SceneInfo(
        points=points, colors=colors, normals=normals,
        train_cameras=train, test_cameras=test,
        nerf_normalization=norm, ply_path=ply_path,
    )


def load_camera(cam_info: CameraInfo, resolution: int, resolution_scale: float = 1.0) -> Camera:
    """Resolution policy + GT image loading (camera_utils.py:19-52).

    (The reference checks the alpha channel with `shape[1] == 4`, an
    H-vs-channels bug; we check the channel count.)
    """
    from PIL import Image

    pil = cam_info.image
    if pil is None:
        pil = Image.open(cam_info.image_path)
    orig_w, orig_h = pil.size
    if resolution in (1, 2, 4, 8):
        target = (
            round(orig_w / (resolution_scale * resolution)),
            round(orig_h / (resolution_scale * resolution)),
        )
    else:
        if resolution == -1:
            global_down = orig_w / 1600 if orig_w > 1600 else 1
        else:
            global_down = orig_w / resolution
        scale = float(global_down) * float(resolution_scale)
        target = (int(orig_w / scale), int(orig_h / scale))

    resized = pil.resize(target)
    arr = np.asarray(resized, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None].repeat(3, axis=-1)
    chw = arr.transpose(2, 0, 1)
    gt = np.clip(chw[:3], 0.0, 1.0)
    if chw.shape[0] == 4:
        gt = gt * chw[3:4]  # premultiply by alpha mask (cameras.py:43-44)

    return Camera(
        uid=cam_info.uid, colmap_id=cam_info.uid, R=cam_info.R, T=cam_info.T,
        fovx=cam_info.fovx, fovy=cam_info.fovy, image=gt,
        image_name=cam_info.image_name, width=target[0], height=target[1],
    )


def camera_to_json(cid: int, camera) -> dict:
    rt = np.zeros((4, 4))
    rt[:3, :3] = camera.R.T
    rt[:3, 3] = camera.T
    rt[3, 3] = 1.0
    c2w = np.linalg.inv(rt)
    return {
        "id": cid,
        "img_name": camera.image_name,
        "width": camera.width,
        "height": camera.height,
        "position": c2w[:3, 3].tolist(),
        "rotation": [r.tolist() for r in c2w[:3, :3]],
        "fy": fov2focal(camera.fovy, camera.height),
        "fx": fov2focal(camera.fovx, camera.width),
    }
