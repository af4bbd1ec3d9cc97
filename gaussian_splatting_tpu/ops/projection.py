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
    # Exact per-tile cull bitmap (None unless tile_cull=True): bit
    # (dy * rect_w + dx) set iff rect tile (dx, dy) survives; -1 = keep all.
    cull_bm: Optional[jnp.ndarray] = None  # (P,) int32


_CULL_CAP_BITS = 32  # bitmap width: rects with more tiles keep all tiles


def tile_cull_bitmaps(
    mean2d: jnp.ndarray,  # (P, 2) pixel centers
    conic: jnp.ndarray,  # (P, 3) [a, b, c] inverse 2D covariance
    opacity: jnp.ndarray,  # (P,) activated
    rect_min_x, rect_min_y, rect_w, rect_h,  # (P,) int32 tile rects
    tile_w: int,
    tile_h: int,
):
    """Conservative-exact per-tile ellipse cull bitmaps: never drops a
    tile that could blend a pixel (lossless in the image); may keep a few
    extra tiles whose min Q sits within ~30 ulp of the threshold.

    The compositor blends a pixel only when alpha = op * exp(-Q) >= 1/255
    (forward.cu:449), i.e. when the Mahalanobis form Q(d) = 0.5 (a dx^2 +
    2 b dx dy + c dy^2) <= t := ln(255 op). A rect tile whose whole pixel
    box has Q > t can therefore be dropped from the tile lists without
    changing any blended pixel — the reference instead emits the full
    AABB of the 3-sigma disc (auxiliary.h:48-58) and lets every pixel
    re-test, which on elongated splats wastes ~25-50% of the sorted tile
    entries. min_box Q is evaluated in closed form (convex quadratic:
    interior iff the center is inside, else the min lies on one of the 4
    edges, each a clamped 1-D minimization).

    Returns (bm, counts): one (P,) int32 bitmap over the rect's row-major
    tile enumeration and the surviving-tile counts. Rects with more than
    32 tiles (or wider/taller than 8) keep all tiles (counts = rect area,
    bitmap = -1 sentinel meaning "full rect"; the sentinel cannot collide
    with a legitimate sub-32-tile bitmap — its bits past area-1 are zero,
    and at area == 32 the all-ones bitmap maps identically to the
    sentinel). Round-3/4 A/Bs measured a 64-bit two-word variant: the
    extra delta-cumsum expansion column cost ~3 ms at K~3M and 33..64-tile
    rects are rare, so the 64-bit arm was deleted (VERDICT r3 item 8).
    """
    f32 = jnp.float32
    i32 = jnp.int32
    P = opacity.shape[0]

    a = conic[:, 0].astype(f32)
    b = conic[:, 1].astype(f32)
    c = conic[:, 2].astype(f32)
    mx = mean2d[:, 0].astype(f32)
    my = mean2d[:, 1].astype(f32)
    # keep-iff minQ <= t, with a hair of slack so 1-ulp disagreements with
    # the kernel's linear-space alpha test stay on the conservative side.
    t = jnp.log(jnp.maximum(255.0 * opacity.astype(f32), 1.0)) * (1.0 + 1e-6) + 1e-6
    a_s = jnp.maximum(a, 1e-12)
    c_s = jnp.maximum(c, 1e-12)

    cap = 8  # loop bound per axis; area cap is the 32-bit bitmap width
    small = jnp.logical_and(
        jnp.logical_and(rect_w <= cap, rect_h <= cap),
        rect_w * rect_h <= _CULL_CAP_BITS,
    )

    def q(dx, dy):
        adx2 = a * dx * dx
        cdy2 = c * dy * dy
        # f32 cancellation guard: the rounding error of the 3-term sum
        # scales with the largest TERM, not with Q (|2b dx dy| <= adx2 +
        # cdy2 for a PSD conic, AM-GM), so a relative slack on t alone
        # cannot bound it for highly anisotropic splats far from the tile.
        # Deflating Q by ~30 ulp of the term-magnitude bound keeps the
        # keep-iff-minQ<=t test conservative under any cancellation.
        return 0.5 * (adx2 + 2.0 * b * dx * dy + cdy2) - 4e-6 * (adx2 + cdy2)

    b_over_c = b / c_s  # hoisted: the 8x8 loop below calls these 256 times
    b_over_a = b / a_s

    def edge_min_x(bx, by0, by1):
        """min Q on the segment x = bx, y in [by0, by1]."""
        y = jnp.clip(-b_over_c * bx, by0, by1)
        return q(bx, y)

    def edge_min_y(by, bx0, bx1):
        x = jnp.clip(-b_over_a * by, bx0, bx1)
        return q(x, by)

    bm = jnp.zeros((P,), i32)
    counts = jnp.zeros((P,), i32)
    one = jnp.ones((P,), i32)
    for dy in range(cap):
        for dx in range(cap):
            in_rect = jnp.logical_and(dx < rect_w, dy < rect_h)
            # tile pixel-center box, relative to the splat center
            bx0 = ((rect_min_x + dx) * tile_w).astype(f32) - mx
            by0 = ((rect_min_y + dy) * tile_h).astype(f32) - my
            bx1 = bx0 + (tile_w - 1)
            by1 = by0 + (tile_h - 1)
            inside = (bx0 <= 0.0) & (bx1 >= 0.0) & (by0 <= 0.0) & (by1 >= 0.0)
            qmin = jnp.minimum(
                jnp.minimum(edge_min_x(bx0, by0, by1), edge_min_x(bx1, by0, by1)),
                jnp.minimum(edge_min_y(by0, bx0, bx1), edge_min_y(by1, bx0, bx1)),
            )
            keep = jnp.logical_and(
                in_rect, jnp.logical_or(inside, qmin <= t)
            )
            shift = dy * rect_w + dx  # row-major rect-local bit index
            bit = jnp.where(keep, one, 0) << jnp.clip(shift, 0, 31)
            bm = bm | jnp.where(shift < 32, bit, 0)
            counts = counts + keep.astype(i32)

    full = rect_w * rect_h
    bm = jnp.where(small, bm, -1)
    counts = jnp.where(small, counts, full)
    return bm, counts


def clip_cull_bitmaps_rows(
    bm: jnp.ndarray,  # (P,) int32 bitmap (rect-local, row-major)
    rect_w: jnp.ndarray,  # (P,) int32 rect width in tiles (unchanged by clip)
    drop_rows: jnp.ndarray,  # (P,) int32 rect rows clipped off the TOP
    clipped_h: jnp.ndarray,  # (P,) int32 surviving rect rows
):
    """Re-derive a cull bitmap for a row-clipped rect by pure bit shifts.

    The sharded tile-strip path clips every rect to its device's strip of
    tile rows; because the bitmap enumerates rect tiles row-major with an
    unchanged width, the clipped bitmap is just (bitmap >> drop_rows *
    rect_w) masked to clipped_h * rect_w bits. This replaces the O(32 P)
    post-gather recompute of the full tile_cull_bitmaps loop with ~10
    int32 lane ops (VERDICT r2 weak #3): each device now pays the bitmap
    loop only on its own P/n shard, pre-gather.

    The -1 "full rect" sentinel passes through unchanged with counts =
    rect_w * clipped_h (keep-all; the post-gather recompute used to
    re-cull those rects, this keeps strictly more — conservative).
    Returns (bm, counts) with the same conventions as tile_cull_bitmaps.
    """
    i32 = jnp.int32
    u32 = jnp.uint32
    pc = jax.lax.population_count
    shr = jax.lax.shift_right_logical
    shl = jax.lax.shift_left

    full = bm == -1
    u = bm.astype(u32)

    s = (drop_rows * rect_w).astype(i32)  # bits to shift right, >= 0
    # shift amounts clamped to [0, 31] (XLA shifts >= bitwidth are
    # undefined); s >= 32 can only happen on sentinel rects (area <= 32
    # otherwise), which bypass via `full`.
    w = shr(u, jnp.clip(s, 0, 31).astype(u32))
    w = jnp.where(s >= 32, u32(0), w)

    # mask to the clipped area's bits
    area = (rect_w * clipped_h).astype(i32)
    m = jnp.where(
        area >= 32,
        u32(0xFFFFFFFF),
        shl(u32(1), jnp.clip(area, 0, 31).astype(u32)) - u32(1),
    )
    w = (w & m).astype(i32)

    counts = jnp.where(full, area, pc(w))
    return jnp.where(full, i32(-1), w), counts


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
    tile_cull: bool = False,  # exact per-tile ellipse cull (lossless)
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

    # Exact per-tile cull AFTER radii/visible: the aux outputs (the
    # reference's visibility_filter = radii > 0 and the densification
    # stats) keep pre-cull semantics; only the emitted tile lists shrink.
    cull_bm = None
    if tile_cull:
        cull_bm, tiles_kept = tile_cull_bitmaps(
            mean2d, conic, opa, rmin_x, rmin_y,
            rmax_x - rmin_x, rmax_y - rmin_y, tile_w, tile_h,
        )
        tiles = jnp.where(visible, tiles_kept, 0)

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
        cull_bm=cull_bm,
    )
