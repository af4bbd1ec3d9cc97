"""Generate a synthetic Blender-format scene on disk for e2e tests.

Renders a fixed random Gaussian set from cameras on a circle and writes
transforms_train.json / transforms_test.json + PNGs — a drop-in dataset
for the real Scene/dataset-reader path (no real datasets exist in this
sandbox).
"""

import json
import math
import os

import numpy as np


def _quat_z_to(n):
    """(N, 4) quaternions (w, x, y, z) rotating +z onto each unit row of n
    (q = normalize(1 + z·n, z×n)); the -z pole is jittered away upstream."""
    w = 1.0 + n[:, 2]
    q = np.stack([w, -n[:, 1], n[:, 0], np.zeros(len(n))], axis=1)
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def make_object_gaussians(P, seed):
    """A structured multi-object scene (vs the statistically-uniform random
    cloud): a checkerboard ground plane, a latitude-striped opaque surface
    shell, and a few solid color blobs. Gives the optimizer real occlusion
    and texture (densification has edges to chase) and makes novel-view
    PSNR meaningful — the random cloud seen from one camera ring is
    maximally view-ambiguous."""
    rng = np.random.default_rng(seed)
    C0 = 0.28209479177387814  # SH DC normalization (utils/sh_utils.py:114)
    n_g, n_s = P // 3, P // 2
    n_b = P - n_g - n_s

    # ground plane y = -1.1, checkerboard albedo
    xz = rng.uniform(-2.2, 2.2, (n_g, 2))
    g_pts = np.stack([xz[:, 0], np.full(n_g, -1.1), xz[:, 1]], axis=1)
    check = ((np.floor(xz[:, 0] / 0.55) + np.floor(xz[:, 1] / 0.55)) % 2)
    g_rgb = np.where(check[:, None] > 0, [0.85, 0.8, 0.7], [0.15, 0.2, 0.3])
    g_scales = np.tile([0.09, 0.09, 0.008], (n_g, 1))
    g_quats = _quat_z_to(np.tile([0.0, 1.0, 0.0], (n_g, 1)))  # normal = +y
    g_op = rng.uniform(0.85, 0.98, n_g)

    # opaque shell, radius 1, latitude color stripes + longitude modulation
    d = rng.normal(size=(n_s, 3))
    d[:, 2] += 1e-3  # avoid the -z quaternion pole
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    s_pts = d * 1.0 + rng.normal(0, 0.004, (n_s, 3))
    lat = np.arcsin(np.clip(d[:, 1], -1, 1))
    lon = np.arctan2(d[:, 2], d[:, 0])
    stripe = 0.5 + 0.5 * np.sin(6.0 * lat)
    s_rgb = np.stack([
        0.2 + 0.7 * stripe,
        0.3 + 0.4 * (0.5 + 0.5 * np.sin(4.0 * lon)),
        0.9 - 0.7 * stripe,
    ], axis=1)
    s_scales = np.tile([0.045, 0.045, 0.004], (n_s, 1))
    s_quats = _quat_z_to(d)  # tangent-plane splats, thin along the normal
    s_op = rng.uniform(0.8, 0.97, n_s)

    # a few solid blobs floating around the shell
    centers = rng.uniform(-1.6, 1.6, (5, 3))
    centers[:, 1] = rng.uniform(-0.6, 1.2, 5)
    blob_colors = rng.uniform(0.2, 0.95, (5, 3))
    which = rng.integers(0, 5, n_b)
    b_pts = centers[which] + rng.normal(0, 0.12, (n_b, 3))
    b_rgb = blob_colors[which] * rng.uniform(0.8, 1.2, (n_b, 1))
    b_scales = np.exp(rng.normal(-3.1, 0.3, (n_b, 3)))
    b_quats = rng.normal(0, 1, (n_b, 4))
    b_quats /= np.linalg.norm(b_quats, axis=1, keepdims=True)
    b_op = rng.uniform(0.5, 0.9, n_b)

    means = np.concatenate([g_pts, s_pts, b_pts]).astype(np.float32)
    scales = np.concatenate([g_scales, s_scales, b_scales]).astype(np.float32)
    quats = np.concatenate([g_quats, s_quats, b_quats]).astype(np.float32)
    opacities = np.concatenate([g_op, s_op, b_op]).astype(np.float32)
    rgb = np.clip(np.concatenate([g_rgb, s_rgb, b_rgb]), 0.02, 0.98)
    shs = np.zeros((P, 16, 3), np.float32)
    shs[:, 0, :] = (rgb - 0.5) / C0  # RGB2SH (utils/sh_utils.py:117-119)
    shs[:, 1:4, :] = rng.normal(0, 0.02, (P, 3, 3))  # mild view dependence
    return means, scales, quats, opacities, shs


def make_blender_scene(out_dir, width=64, height=64, n_train=6, n_test=2, P=48,
                       seed=3, kind="cloud"):
    import imageio
    import jax.numpy as jnp

    from gaussian_splatting_tpu.ops.rasterize import RasterizerConfig, rasterize
    from helpers import make_camera, make_gaussians

    if kind == "objects":
        means, scales, quats, opacities, shs = make_object_gaussians(P, seed)
    else:
        means, scales, quats, opacities, shs = make_gaussians(P=P, seed=seed, spread=0.8)
    cfg = RasterizerConfig(backend="xla", capacity_mult=32, chunk=128)
    fov = math.radians(60)

    os.makedirs(os.path.join(out_dir, "train"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "test"), exist_ok=True)

    def render_at(angle):
        cam = make_camera(width, height, dist=4.0, angle=angle)
        img, _ = rasterize(
            jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opacities), jnp.asarray(shs), 3, cam.arrays(),
            width, height, jnp.zeros(3), cfg,
        )
        # camera -> OpenGL/Blender c2w (undo the reader's axis flip)
        w2c = cam.world_view_transform.astype(np.float64)
        c2w = np.linalg.inv(w2c)
        c2w[:3, 1:3] *= -1
        return np.clip(np.asarray(img), 0, 1), c2w

    def write_split(name, n, offset):
        frames = []
        for i in range(n):
            angle = offset + i * 2 * math.pi / max(n, 1)
            img, c2w = render_at(angle)
            rel = f"./{name}/r_{i}"
            rgba = np.concatenate(
                [(img * 255).astype(np.uint8), np.full(img.shape[:2] + (1,), 255, np.uint8)],
                axis=-1,
            )
            imageio.imwrite(os.path.join(out_dir, f"{name}/r_{i}.png"), rgba)
            frames.append({"file_path": rel, "transform_matrix": c2w.tolist()})
        with open(os.path.join(out_dir, f"transforms_{name}.json"), "w") as f:
            json.dump({"camera_angle_x": fov, "frames": frames}, f)

    write_split("train", n_train, 0.0)
    write_split("test", n_test, 0.3)
    return means


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    make_blender_scene(
        sys.argv[1] if len(sys.argv) > 1 else "/tmp/synthetic_scene",
        kind=sys.argv[2] if len(sys.argv) > 2 else "cloud",
    )
