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


def make_blender_scene(out_dir, width=64, height=64, n_train=6, n_test=2, P=48, seed=3):
    import imageio
    import jax.numpy as jnp

    from gaussian_splatting_tpu.ops.rasterize import RasterizerConfig, rasterize
    from helpers import make_camera, make_gaussians

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
    make_blender_scene(sys.argv[1] if len(sys.argv) > 1 else "/tmp/synthetic_scene")
