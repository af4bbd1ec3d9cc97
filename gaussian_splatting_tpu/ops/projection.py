"""Per-Gaussian preprocessing: project to screen, EWA 2D covariance, tiling.

TPU-native analog of `cuda_rasterizer/forward.cu::preprocessCUDA`
(forward.cu:194-324) — but instead of one CUDA thread per Gaussian it is a
single batched jnp computation over the padded (P,) axis, which XLA fuses
into a handful of VPU loops. Gradients come from JAX AD (the reference
hand-writes them in backward.cu:144-399); every divide/sqrt is guarded with
the double-`where` trick so culled lanes produce zero (not NaN) gradients.

Parity-critical constants:
- near cull at camera-space z <= 0.2 (auxiliary.h:165)
- homogeneous divide guard + 1e-7 (forward.cu:244)
- Jacobian clamping at +-1.3 * tanfov (forward.cu:102-107)
- +0.3 low-pass on the 2D covariance diagonal (forward.cu:137-138)
- eigenvalue floor 0.1, radius = ceil(3 sqrt(lambda_max)) (forward.cu:284-289)
- tile rect arithmetic (auxiliary.h:48-58), ndc2Pix (auxiliary.h:42-45)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gaussian_splatting_tpu.ops import gsmath
from gaussian_splatting_tpu.scene.cameras import CameraArrays


class PreprocessOut(NamedTuple):
    means2d: jnp.ndarray  # (P, 2) pixel-space centers
    depths: jnp.ndarray  # (P,) camera-space z
    conic: jnp.ndarray  # (P, 3) inverse 2D covariance [a, b, c]
    rgb: jnp.ndarray  # (P, 3) view-dependent color (clamped >= 0)
    opacity: jnp.ndarray  # (P,) activated opacity
    radii: jnp.ndarray  # (P,) int32 screen-space radius (pixels)
    rect_min: jnp.ndarray  # (P, 2) int32 tile rect (x, y) inclusive
    rect_max: jnp.ndarray  # (P, 2) int32 tile rect (x, y) exclusive
    tiles_touched: jnp.ndarray  # (P,) int32
    visible: jnp.ndarray  # (P,) bool


def _transform_point(mat, p, w_row: bool):
    """Apply a row-major 4x4 to points (P, 3). Returns (P, 3) or (P, 4)."""
    out = p @ mat[:3, :3].T + mat[:3, 3]
    if not w_row:
        return out
    w = p @ mat[3, :3].T + mat[3, 3]
    return out, w


def preprocess(
    means3d: jnp.ndarray,  # (P, 3)
    scales: jnp.ndarray,  # (P, 3) activated (exp applied)
    quats: jnp.ndarray,  # (P, 4) raw (normalized inside)
    opacities: jnp.ndarray,  # (P,) activated (sigmoid applied)
    shs: Optional[jnp.ndarray],  # (P, K, 3) or None if colors_precomp given
    sh_degree: int,
    cam: CameraArrays,
    width: int,
    height: int,
    tile_w: int,
    tile_h: int,
    scale_modifier: float = 1.0,
    mean2d_bias: Optional[jnp.ndarray] = None,  # (P, 2) NDC-space bias (for densify grads)
    alive: Optional[jnp.ndarray] = None,  # (P,) bool mask of real (non-padding) slots
    colors_precomp: Optional[jnp.ndarray] = None,  # (P, 3) overrides SH
    cov3d_precomp: Optional[jnp.ndarray] = None,  # (P, 6) overrides scale/quat
) -> PreprocessOut:
    P = means3d.shape[0]
    f32 = jnp.float32
    means3d = means3d.astype(f32)

    view = cam.viewmatrix
    proj = cam.projmatrix

    # --- frustum test (near-plane only, auxiliary.h:144-175) ---
    p_view = _transform_point(view, means3d, w_row=False)  # (P, 3)
    tz = p_view[..., 2]
    in_front = tz > 0.2
    if alive is not None:
        in_front = jnp.logical_and(in_front, alive)

    # --- projection to NDC then pixels (forward.cu:241-246, 294) ---
    p_hom, p_w = _transform_point(proj, means3d, w_row=True)
    inv_w = 1.0 / (p_w + 1e-7)
    ndc = p_hom[..., :2] * inv_w[..., None]
    if mean2d_bias is not None:
        ndc = ndc + mean2d_bias
    size_wh = jnp.array([width, height], f32)
    mean2d = ((ndc + 1.0) * size_wh - 1.0) * 0.5  # ndc2Pix (auxiliary.h:42-45)

    # --- 3D covariance (forward.cu:146-180) ---
    if cov3d_precomp is not None:
        cov3d = cov3d_precomp
    else:
        cov3d = gsmath.build_cov3d(scales, quats, scale_modifier)  # (P, 6)

    # --- EWA projection to 2D covariance (forward.cu:84-140) ---
    tz_safe = jnp.where(in_front, tz, 1.0)
    limx = 1.3 * cam.tanfovx
    limy = 1.3 * cam.tanfovy
    txtz = p_view[..., 0] / tz_safe
    tytz = p_view[..., 1] / tz_safe
    tx = jnp.clip(txtz, -limx, limx) * tz_safe
    ty = jnp.clip(tytz, -limy, limy) * tz_safe

    focal_x = width / (2.0 * cam.tanfovx)
    focal_y = height / (2.0 * cam.tanfovy)
    inv_tz = 1.0 / tz_safe
    inv_tz2 = inv_tz * inv_tz
    # J (2x3 row-major), zero third row dropped.
    j00 = focal_x * inv_tz
    j02 = -(focal_x * tx) * inv_tz2
    j11 = focal_y * inv_tz
    j12 = -(focal_y * ty) * inv_tz2

    Wr = view[:3, :3]  # rotation part of W2C
    # A = J @ Wr  -> (P, 2, 3), expanded elementwise (no MXU needed).
    a0 = j00[..., None] * Wr[0] + j02[..., None] * Wr[2]  # (P, 3)
    a1 = j11[..., None] * Wr[1] + j12[..., None] * Wr[2]  # (P, 3)

    # cov2d = A Vrk A^T with Vrk packed [xx xy xz yy yz zz].
    cxx, cxy, cxz = cov3d[..., 0], cov3d[..., 1], cov3d[..., 2]
    cyy, cyz, czz = cov3d[..., 3], cov3d[..., 4], cov3d[..., 5]

    def quad(u, v):
        # u^T Vrk v for u, v of shape (P, 3)
        return (
            u[..., 0] * (cxx * v[..., 0] + cxy * v[..., 1] + cxz * v[..., 2])
            + u[..., 1] * (cxy * v[..., 0] + cyy * v[..., 1] + cyz * v[..., 2])
            + u[..., 2] * (cxz * v[..., 0] + cyz * v[..., 1] + czz * v[..., 2])
        )

    cov_a = quad(a0, a0) + 0.3  # low-pass (forward.cu:137-138)
    cov_b = quad(a0, a1)
    cov_c = quad(a1, a1) + 0.3

    det = cov_a * cov_c - cov_b * cov_b
    det_ok = det != 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    det_inv = 1.0 / det_safe
    conic = jnp.stack([cov_c * det_inv, -cov_b * det_inv, cov_a * det_inv], axis=-1)

    # --- screen-space radius from eigenvalues (forward.cu:284-289) ---
    mid = 0.5 * (cov_a + cov_c)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 0.0)))

    # --- tile rect (auxiliary.h:48-58), tightened losslessly ---
    # The reference covers the isotropic 3*sigma_max square. Every pixel
    # the compositor actually blends has alpha >= 1/255 (forward.cu:449),
    # and the alpha = 1/255 contour's axis-aligned half-extents are
    # sqrt(2 ln(255 op)) * sqrt(cov_diag). Intersecting the reference
    # square with that AABB drops only pixels the per-pixel skip would
    # reject anyway — the rendered image is unchanged while tile entries
    # shrink ~25-30% on typical scenes (the aux radii stay the reference's
    # 3 sigma_max value for densification parity).
    opa = opacities.astype(f32).reshape(P)
    r255 = jnp.sqrt(2.0 * jnp.log(jnp.maximum(255.0 * opa, 1.0)))
    half_x = jnp.minimum(radius_f, jnp.ceil(r255 * jnp.sqrt(jnp.maximum(cov_a, 0.0))))
    half_y = jnp.minimum(radius_f, jnp.ceil(r255 * jnp.sqrt(jnp.maximum(cov_c, 0.0))))

    grid_x = (width + tile_w - 1) // tile_w
    grid_y = (height + tile_h - 1) // tile_h
    px, py = mean2d[..., 0], mean2d[..., 1]

    def rect(hx, hy):
        r0x = jnp.clip(jnp.floor((px - hx) / tile_w), 0, grid_x).astype(jnp.int32)
        r0y = jnp.clip(jnp.floor((py - hy) / tile_h), 0, grid_y).astype(jnp.int32)
        r1x = jnp.clip(jnp.floor((px + hx + tile_w - 1) / tile_w), 0, grid_x).astype(jnp.int32)
        r1y = jnp.clip(jnp.floor((py + hy + tile_h - 1) / tile_h), 0, grid_y).astype(jnp.int32)
        return r0x, r0y, r1x, r1y, (r1x - r0x) * (r1y - r0y)

    rmin_x, rmin_y, rmax_x, rmax_y, tiles = rect(half_x, half_y)
    # `visible` (the reference's visibility_filter / densify-stat gate,
    # getRect at forward.cu:300-304 with the FULL 3*sigma radius) must not
    # see the opacity-tightened rect: a splat with activated opacity
    # < 1/255 has half extents 0 and can lose its rect here while the
    # reference still counts it (radii > 0) — so gate visibility on the
    # untightened square's tile count instead (tight rect is a subset, so
    # tiles > 0 implies tiles_ref > 0).
    *_, tiles_ref = rect(radius_f, radius_f)

    visible = jnp.logical_and(jnp.logical_and(in_front, det_ok), tiles_ref > 0)
    tiles = jnp.where(visible, tiles, 0)
    radii = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)

    # --- color (forward.cu:21-81) ---
    if colors_precomp is not None:
        rgb = colors_precomp.astype(f32)
    else:
        rgb = gsmath.sh_to_rgb(sh_degree, shs.astype(f32), means3d, cam.campos)

    return PreprocessOut(
        means2d=mean2d,
        depths=tz,
        conic=conic,
        rgb=rgb,
        opacity=opacities.astype(f32).reshape(P),
        radii=radii,
        rect_min=jnp.stack([rmin_x, rmin_y], axis=-1),
        rect_max=jnp.stack([rmax_x, rmax_y], axis=-1),
        tiles_touched=tiles,
        visible=visible,
    )
