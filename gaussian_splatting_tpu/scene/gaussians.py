"""The learnable Gaussian scene state as a padded, masked pytree.

TPU-native redesign of the reference's `GaussianModel`
(scene/gaussian_model.py:24-602). The reference grows/shrinks torch
tensors and performs optimizer-state surgery on every densify/prune
(gaussian_model.py:366-498); under jit we instead keep *static-capacity*
arrays with an `alive` mask. Densification edits rows in place (host-side
numpy, every 100 iters) and the capacity only changes on bucket growth
(one recompile per doubling).

Parameter semantics match the reference exactly:
- xyz: world positions (no activation)
- features_dc (N,1,3) / features_rest (N,15,3): SH coefficients
- scaling: log-scale (exp activation, gaussian_model.py:40-41)
- rotation: unnormalized quaternion wxyz (normalize activation, :50)
- opacity: logit (sigmoid activation, :46)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.ops import gsmath, knn


class GaussianParams(NamedTuple):
    """Learnable parameters (raw, pre-activation). Leading dim = capacity."""

    xyz: jnp.ndarray  # (N, 3)
    features_dc: jnp.ndarray  # (N, 1, 3)
    features_rest: jnp.ndarray  # (N, K-1, 3)
    scaling: jnp.ndarray  # (N, 3) log-scale
    rotation: jnp.ndarray  # (N, 4) quaternion wxyz
    opacity: jnp.ndarray  # (N, 1) logit


class GaussianActivations(NamedTuple):
    """Activated views handed to the rasterizer."""

    xyz: jnp.ndarray
    scales: jnp.ndarray
    quats: jnp.ndarray  # normalized
    opacities: jnp.ndarray  # (N,)
    shs: jnp.ndarray  # (N, K, 3)


def activate(params: GaussianParams) -> GaussianActivations:
    return GaussianActivations(
        xyz=params.xyz,
        scales=jnp.exp(params.scaling),
        quats=params.rotation,  # rasterizer normalizes (build_cov3d)
        opacities=jnp.ravel(
            1.0 / (1.0 + jnp.exp(-params.opacity))
        ),
        shs=jnp.concatenate([params.features_dc, params.features_rest], axis=1),
    )


def num_sh_coeffs(sh_degree: int) -> int:
    return (sh_degree + 1) ** 2


def capacity_bucket(n: int, minimum: int = 1024) -> int:
    """Static capacity for n live Gaussians: next power of two."""
    cap = minimum
    while cap < n:
        cap *= 2
    return cap


def create_from_pcd(
    points: np.ndarray,  # (P, 3)
    colors: np.ndarray,  # (P, 3) in [0, 1]
    sh_degree: int,
    capacity: Optional[int] = None,
) -> tuple[GaussianParams, np.ndarray]:
    """Initialize from a point cloud (gaussian_model.py:144-228).

    - DC SH from RGB (RGB2SH), rest zero
    - log-scale from mean 3-NN squared distance (isotropic), clamped 1e-7
    - identity rotation, opacity 0.1 (pre-sigmoid)

    Returns (params, alive) with rows padded to `capacity`.
    """
    P = points.shape[0]
    cap = capacity or capacity_bucket(P)
    K = num_sh_coeffs(sh_degree)

    dist2 = np.maximum(np.asarray(knn.mean_knn_dist2(jnp.asarray(points, jnp.float32))), 1e-7)
    scales = np.repeat(np.log(np.sqrt(dist2))[:, None], 3, axis=1)

    def pad(x, fill=0.0):
        out = np.full((cap,) + x.shape[1:], fill, np.float32)
        out[:P] = x
        return out

    rots = np.zeros((P, 4), np.float32)
    rots[:, 0] = 1.0
    opacity = np.full((P, 1), float(np.log(0.1 / 0.9)), np.float32)  # inverse_sigmoid(0.1)

    f_dc = np.asarray(gsmath.rgb_to_sh(colors.astype(np.float32)))[:, None, :]
    f_rest = np.zeros((P, K - 1, 3), np.float32)

    params = GaussianParams(
        xyz=jnp.asarray(pad(points.astype(np.float32))),
        features_dc=jnp.asarray(pad(f_dc)),
        features_rest=jnp.asarray(pad(f_rest)),
        scaling=jnp.asarray(pad(scales.astype(np.float32), fill=-10.0)),
        rotation=jnp.asarray(pad(rots)),
        opacity=jnp.asarray(pad(opacity, fill=-10.0)),  # dead slots ~ 0 opacity
    )
    alive = np.zeros((cap,), bool)
    alive[:P] = True
    return params, alive


def repad(params_np: dict, alive_np: np.ndarray, capacity: int):
    """Re-pad host-side numpy param dict to a (possibly larger) capacity."""
    n = alive_np.shape[0]
    assert capacity >= n

    def pad(x, fill):
        out = np.full((capacity,) + x.shape[1:], fill, np.float32)
        out[:n] = x
        return out

    fills = dict(xyz=0.0, features_dc=0.0, features_rest=0.0, scaling=-10.0,
                 rotation=0.0, opacity=-10.0)
    out = {k: pad(v, fills[k]) for k, v in params_np.items()}
    alive = np.zeros((capacity,), bool)
    alive[:n] = alive_np
    return out, alive
