"""Core Gaussian-splatting math: quaternions, covariances, spherical harmonics.

Pure jnp, elementwise formulations (VPU-friendly, no tiny matmuls that would
hit the MXU at bf16 precision). Batch dimension is always leading.

Behavioral parity notes (cited against /root/reference):
- quaternion layout is (w, x, y, z), normalized before use
  (utils/general_utils.py:105-129).
- cov3D = M @ M^T with M = R @ diag(s)
  (cuda_rasterizer/forward.cu:146-180; glm column-major `S * R` equals
  row-major R @ S, and `transpose(M) * M` there equals M M^T here).
- SH constants and real-SH basis of degree 0..3
  (cuda_rasterizer/auxiliary.h:22-39, forward.cu:21-81). Colors are
  offset by +0.5 then clamped at 0 (forward.cu:73-80); jnp.maximum gives
  the same zero-gradient-when-clamped behavior the reference tracks with
  its `clamped` buffer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Real spherical harmonics constants (auxiliary.h:22-39).
SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)
SH_C4 = (
    2.5033429417967046,
    -1.7701307697799304,
    0.9461746957575601,
    -0.6690465435572892,
    0.10578554691520431,
    -0.6690465435572892,
    0.47308734787878004,
    -1.7701307697799304,
    0.6258357354491761,
)


def normalize_quat(q):
    """Normalize quaternions, (..., 4) in (w, x, y, z) layout.

    Zero quaternions (padding rows) map to the identity rotation instead
    of NaN — the double-where trick keeps both values and gradients clean.
    """
    norm2 = jnp.sum(q * q, axis=-1, keepdims=True)
    ok = norm2 > 0.0
    inv = jax.lax.rsqrt(jnp.where(ok, norm2, 1.0))
    qn = q * inv
    identity = jnp.zeros_like(q).at[..., 0].set(1.0)
    return jnp.where(ok, qn, identity)


def quat_to_rotmat(q):
    """Unit quaternion (..., 4) (w,x,y,z) -> rotation matrix (..., 3, 3)."""
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], axis=-1
    )
    row1 = jnp.stack(
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], axis=-1
    )
    row2 = jnp.stack(
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def build_cov3d(scales, quats, scale_modifier=1.0):
    """3D covariance (upper-triangular packed) from scales and quaternions.

    scales: (..., 3) activated (positive) scales; quats: (..., 4) raw
    (normalized internally, matching the rasterizer which receives
    pre-normalized rotations but normalizes defensively).

    Returns (..., 6): [xx, xy, xz, yy, yz, zz] of Sigma = M M^T,
    M = R @ diag(scale_modifier * s).
    """
    q = normalize_quat(quats)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    s = scale_modifier * scales
    s0, s1, s2 = s[..., 0], s[..., 1], s[..., 2]
    # M = R @ diag(s), written column-wise as (...,)-shaped scalars so XLA
    # fuses the whole thing into one VPU pass (a batched (...,3,3) einsum
    # materializes tiny-matrix intermediates in lane-padded layouts).
    m00 = (1 - 2 * (y * y + z * z)) * s0
    m01 = (2 * (x * y - r * z)) * s1
    m02 = (2 * (x * z + r * y)) * s2
    m10 = (2 * (x * y + r * z)) * s0
    m11 = (1 - 2 * (x * x + z * z)) * s1
    m12 = (2 * (y * z - r * x)) * s2
    m20 = (2 * (x * z - r * y)) * s0
    m21 = (2 * (y * z + r * x)) * s1
    m22 = (1 - 2 * (x * x + y * y)) * s2
    return jnp.stack(
        [
            m00 * m00 + m01 * m01 + m02 * m02,
            m00 * m10 + m01 * m11 + m02 * m12,
            m00 * m20 + m01 * m21 + m02 * m22,
            m10 * m10 + m11 * m11 + m12 * m12,
            m10 * m20 + m11 * m21 + m12 * m22,
            m20 * m20 + m21 * m21 + m22 * m22,
        ],
        axis=-1,
    )


def eval_sh(deg: int, sh, dirs):
    """Evaluate real SH basis, degree 0..4.

    sh: (..., K, 3) coefficients with K >= (deg+1)^2 (DC first);
    dirs: (..., 3) unit view directions. Returns (..., 3) raw color
    (before the +0.5 offset / clamp). Matches forward.cu:21-73 and
    utils/sh_utils.py:57-112 ordering (degree 4 exists only on the
    reference's Python path; its CUDA rasterizer, like the training
    pipeline here, caps at 3).
    """
    result = SH_C0 * sh[..., 0, :]
    if deg > 0:
        x = dirs[..., 0:1]
        y = dirs[..., 1:2]
        z = dirs[..., 2:3]
        result = (
            result - SH_C1 * y * sh[..., 1, :] + SH_C1 * z * sh[..., 2, :] - SH_C1 * x * sh[..., 3, :]
        )
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (
                result
                + SH_C2[0] * xy * sh[..., 4, :]
                + SH_C2[1] * yz * sh[..., 5, :]
                + SH_C2[2] * (2.0 * zz - xx - yy) * sh[..., 6, :]
                + SH_C2[3] * xz * sh[..., 7, :]
                + SH_C2[4] * (xx - yy) * sh[..., 8, :]
            )
            if deg > 2:
                result = (
                    result
                    + SH_C3[0] * y * (3.0 * xx - yy) * sh[..., 9, :]
                    + SH_C3[1] * xy * z * sh[..., 10, :]
                    + SH_C3[2] * y * (4.0 * zz - xx - yy) * sh[..., 11, :]
                    + SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * sh[..., 12, :]
                    + SH_C3[4] * x * (4.0 * zz - xx - yy) * sh[..., 13, :]
                    + SH_C3[5] * z * (xx - yy) * sh[..., 14, :]
                    + SH_C3[6] * x * (xx - 3.0 * yy) * sh[..., 15, :]
                )
                if deg > 3:
                    result = (
                        result
                        + SH_C4[0] * xy * (xx - yy) * sh[..., 16, :]
                        + SH_C4[1] * yz * (3.0 * xx - yy) * sh[..., 17, :]
                        + SH_C4[2] * xy * (7.0 * zz - 1.0) * sh[..., 18, :]
                        + SH_C4[3] * yz * (7.0 * zz - 3.0) * sh[..., 19, :]
                        + SH_C4[4] * (zz * (35.0 * zz - 30.0) + 3.0) * sh[..., 20, :]
                        + SH_C4[5] * xz * (7.0 * zz - 3.0) * sh[..., 21, :]
                        + SH_C4[6] * (xx - yy) * (7.0 * zz - 1.0) * sh[..., 22, :]
                        + SH_C4[7] * xz * (xx - 3.0 * yy) * sh[..., 23, :]
                        + SH_C4[8] * (xx * (xx - 3.0 * yy) - yy * (3.0 * xx - yy)) * sh[..., 24, :]
                    )
    return result


def sh_to_rgb(deg: int, sh, means3d, campos):
    """SH -> clamped RGB as the rasterizer does (forward.cu:21-81).

    means3d: (..., 3) world positions, campos: (3,) camera center.
    """
    d = means3d - campos
    dirs = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.maximum(eval_sh(deg, sh, dirs) + 0.5, 0.0)


def rgb_to_sh(rgb):
    """Inverse of the DC-only SH mapping (utils/sh_utils.py:114-118)."""
    return (rgb - 0.5) / SH_C0


def sh_to_rgb_dc(sh_dc):
    return sh_dc * SH_C0 + 0.5


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))
