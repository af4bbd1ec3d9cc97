"""Finite-difference validation of rasterizer gradients on a tiny scene.

The reference validates its hand-written backward (backward.cu) only
empirically; we check JAX-AD gradients of the full pipeline against central
finite differences (SURVEY.md section 4 test plan, item c).
"""

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.ops.rasterize import RasterizerConfig, rasterize
from helpers import make_camera, make_gaussians

W, H = 32, 24


import pytest


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_finite_differences(backend):
    means, scales, quats, opacities, shs = make_gaussians(P=12, seed=5, spread=0.6)
    # keep alphas away from the min/max clamps so FD is smooth
    opacities = np.clip(opacities, 0.2, 0.8)
    cam = make_camera(W, H, dist=3.0)
    cfg = RasterizerConfig(backend=backend, capacity_mult=32, chunk=64)
    target = jnp.asarray(np.random.default_rng(0).uniform(size=(H, W, 3)), jnp.float32)

    args = tuple(map(lambda x: jnp.asarray(x, jnp.float64).astype(jnp.float32),
                     (means, scales, quats, opacities, shs)))

    def f(m, s, q, o, sh):
        img, _ = rasterize(m, s, q, o, sh, 3, cam.arrays(), W, H, jnp.zeros(3), cfg)
        return jnp.mean((img - target) ** 2)

    grads = jax.grad(f, argnums=(0, 1, 2, 3, 4))(*args)

    def fd_at(ai, idx, eps):
        a = np.asarray(args[ai], np.float64)
        flat = a.reshape(-1)
        ap = flat.copy(); ap[idx] += eps
        am = flat.copy(); am[idx] -= eps
        args_p = list(args); args_p[ai] = jnp.asarray(ap.reshape(a.shape), jnp.float32)
        args_m = list(args); args_m[ai] = jnp.asarray(am.reshape(a.shape), jnp.float32)
        return (float(f(*args_p)) - float(f(*args_m))) / (2 * eps)

    checked = 0
    skipped = 0
    for ai, (name, eps) in enumerate(
        [("means", 2e-3), ("scales", 2e-4), ("quats", 2e-3), ("opacity", 2e-3), ("shs", 2e-3)]
    ):
        gflat = np.asarray(grads[ai], np.float64).reshape(-1)
        idxs = np.argsort(-np.abs(gflat))[:3]
        for idx in idxs:
            if abs(gflat[idx]) < 1e-7:
                continue
            fd1 = fd_at(ai, idx, eps)
            fd2 = fd_at(ai, idx, eps / 2)
            # The true function is only piecewise smooth (integer radii /
            # tile-rect boundaries, min/max clamps — same as the CUDA
            # reference). Skip coordinates where FD itself is unstable.
            if abs(fd1 - fd2) > 0.02 * max(abs(fd1), abs(fd2), 1e-6):
                skipped += 1
                continue
            ad = gflat[idx]
            assert np.isfinite(fd2)
            assert abs(fd2 - ad) <= 0.05 * max(abs(ad), abs(fd2)) + 5e-4, (
                f"{name}[{idx}]: fd={fd2} ad={ad}"
            )
            checked += 1
    assert checked >= 8, f"only {checked} smooth coordinates checked ({skipped} skipped)"
