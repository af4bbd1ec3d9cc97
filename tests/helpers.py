"""Shared test fixtures: tiny random scenes + cameras."""

import math

import numpy as np

from gaussian_splatting_tpu.scene.cameras import Camera


def make_camera(width=64, height=48, dist=4.0, fov_deg=60.0, angle=0.0):
    """Camera on a circle around the origin, looking at the origin."""
    # C2W rotation: camera z-axis points from camera toward origin.
    c, s = math.cos(angle), math.sin(angle)
    cam_pos = np.array([dist * s, 0.0, -dist * c])
    forward = -cam_pos / np.linalg.norm(cam_pos)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, forward)
    right /= np.linalg.norm(right)
    up2 = np.cross(forward, right)
    R = np.stack([right, up2, forward], axis=1)  # C2W (columns = camera axes)
    T = -R.T @ cam_pos  # W2C translation
    fov = math.radians(fov_deg)
    return Camera(
        uid=0,
        colmap_id=0,
        R=R,
        T=T,
        fovx=fov,
        fovy=fov,
        image=None,
        image_name="test",
        width=width,
        height=height,
    )


def make_gaussians(P=200, seed=0, spread=1.0, scale_mu=-2.5):
    rng = np.random.default_rng(seed)
    means = rng.normal(0, spread, (P, 3)).astype(np.float32)
    scales = np.exp(rng.normal(scale_mu, 0.3, (P, 3))).astype(np.float32)
    quats = rng.normal(0, 1, (P, 4)).astype(np.float32)
    opacities = (1 / (1 + np.exp(-rng.normal(0.5, 1, (P,))))).astype(np.float32)
    shs = (rng.normal(0, 0.2, (P, 16, 3))).astype(np.float32)
    shs[:, 0, :] += 1.0
    return means, scales, quats, opacities, shs
