"""Front-to-back alpha compositing of depth-sorted Gaussian tile entries.

TPU-native analogs of `cuda_rasterizer/forward.cu::renderCUDA`
(forward.cu:331-485). The CUDA kernel walks each pixel's sorted Gaussian
list sequentially with an early-exit flag; that is a divergence trick that
does not map to SIMD hardware. Here compositing is reformulated as a
*segmented prefix product* over the globally sorted entry list:

    T_k = T_carry * prod_{j<k in same tile}(1 - alpha_j)
        = T_carry * exp(segmented_cumsum(log1p(-alpha)))

which vectorizes over a chunk of entries x all pixels of their tiles, with a
`lax.scan` carrying per-pixel log-transmittance, accumulated color, and the
sticky early-termination flag. The whole thing is differentiable by JAX AD,
giving the exact gradients the reference hand-codes in backward.cu:408-601
(including zero gradient past the termination point and for skipped
entries, because the masks freeze those contributions).

Parity-critical blending rules (forward.cu:437-463):
    power = -0.5(a dx^2 + c dy^2) - b dx dy ; skip if power > 0
    alpha = min(0.99, opacity * exp(power)) ; skip if alpha < 1/255
    stop (sticky, per pixel) if T*(1-alpha) < 1e-4 BEFORE compositing
    out = sum(rgb * alpha * T) + T_final * bg

Two backends:
  - `composite_tiles`: the production XLA path over sorted tile entries.
  - `render_bruteforce`: oracle that composites every Gaussian against
    every pixel (with the same rect-overlap rule), used as the ground
    truth in tests. O(P * pixels) — small scenes only.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussian_splatting_tpu.ops.binning import TileLists
from gaussian_splatting_tpu.ops.projection import PreprocessOut

ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4


class CompositeOut(NamedTuple):
    image: jnp.ndarray  # (H, W, 3)
    final_t: jnp.ndarray  # (H, W) final transmittance


def seg_cumsum(x: jnp.ndarray, first: jnp.ndarray) -> jnp.ndarray:
    """Inclusive segmented cumsum along axis 0.

    `first[i]` is True where a new segment starts at i. Extra trailing
    dims of x broadcast against first.
    """
    fshape = first.reshape((-1,) + (1,) * (x.ndim - 1))

    def combine(a, b):
        (xa, fa), (xb, fb) = a, b
        return jnp.where(fb, xb, xa + xb), jnp.logical_or(fa, fb)

    f = jnp.broadcast_to(fshape, x.shape)
    out, _ = jax.lax.associative_scan(combine, (x, f), axis=0)
    return out


def _tile_pixel_coords(tile_idx, grid_x: int, tile_w: int, tile_h: int, origin_y: int = 0):
    """Pixel-center coordinates for each entry's tile: (C, TPX) x/y.

    origin_y: global pixel row of this (possibly device-local) tile grid's
    first row — used by tile-strip sharding (parallel/sharding.py).
    """
    ox = (tile_idx % grid_x) * tile_w
    oy = (tile_idx // grid_x) * tile_h + origin_y
    lx = jnp.arange(tile_w, dtype=jnp.float32)
    ly = jnp.arange(tile_h, dtype=jnp.float32)
    px = (ox[:, None, None] + lx[None, None, :]).astype(jnp.float32)  # (C, 1, TW)
    py = (oy[:, None, None] + ly[None, :, None]).astype(jnp.float32)  # (C, TH, 1)
    tpx = tile_w * tile_h
    px = jnp.broadcast_to(px, (tile_idx.shape[0], tile_h, tile_w)).reshape(-1, tpx)
    py = jnp.broadcast_to(py, (tile_idx.shape[0], tile_h, tile_w)).reshape(-1, tpx)
    return px, py


def _alpha(e_mean, e_conic, e_op, px, py):
    """Per-(entry, pixel) alpha + skip mask. Shapes (C, TPX)."""
    dx = e_mean[:, 0:1] - px
    dy = e_mean[:, 1:2] - py
    a, b, c = e_conic[:, 0:1], e_conic[:, 1:2], e_conic[:, 2:3]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, e_op[:, None] * jnp.exp(power))
    skip = jnp.logical_or(power > 0.0, alpha < ALPHA_MIN)
    return alpha, skip


def composite_tiles(
    prep: PreprocessOut,
    lists: TileLists,
    width: int,
    height: int,
    tile_w: int,
    tile_h: int,
    bg: jnp.ndarray,  # (3,)
    chunk: int = 256,
    origin_y: int = 0,
) -> CompositeOut:
    grid_x = (width + tile_w - 1) // tile_w
    grid_y = (height + tile_h - 1) // tile_h
    num_tiles = grid_x * grid_y
    tpx = tile_w * tile_h
    K = lists.gauss_id.shape[0]
    C = min(chunk, K)
    n_chunks = (K + C - 1) // C
    pad = n_chunks * C - K

    gid = lists.gauss_id
    # Per-entry records, gathered once. Invalid (padding) entries are made
    # fully inert — opacity 0 AND neutral geometry — so no garbage value can
    # reach the gradient graph even through untaken `where` branches.
    ev = lists.entry_valid
    e_mean = jnp.where(ev[:, None], prep.means2d[gid], 0.0)
    e_conic = jnp.where(ev[:, None], prep.conic[gid], jnp.array([1.0, 0.0, 1.0]))
    e_rgb = jnp.where(ev[:, None], prep.rgb[gid], 0.0)
    e_op = jnp.where(ev, prep.opacity[gid], 0.0)
    e_tile = jnp.minimum(lists.entry_tile, num_tiles - 1)
    e_valid = ev

    def pad0(x):
        if pad == 0:
            return x
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths)

    xs = jax.tree.map(
        lambda x: pad0(x).reshape((n_chunks, C) + x.shape[1:]),
        (e_mean, e_conic, e_rgb, e_op, e_tile, e_valid),
    )

    logT0 = jnp.zeros((num_tiles, tpx), jnp.float32)
    acc0 = jnp.zeros((num_tiles, tpx, 3), jnp.float32)
    done0 = jnp.zeros((num_tiles, tpx), jnp.int32)

    def step(carry, chunk_xs):
        logT, acc, done = carry
        m, cn, rgb, op, ct, valid = chunk_xs

        px, py = _tile_pixel_coords(ct, grid_x, tile_w, tile_h, origin_y)
        alpha, skip = _alpha(m, cn, op, px, py)
        skip = jnp.logical_or(skip, ~valid[:, None])
        alpha_eff = jnp.where(skip, 0.0, alpha)

        first = jnp.concatenate(
            [jnp.ones((1,), bool), ct[1:] != ct[:-1]]
        )  # new tile segment starts
        logs = jnp.log1p(-alpha_eff)
        s_incl = seg_cumsum(logs, first)
        s_excl = s_incl - logs
        T_entry = jnp.exp(logT[ct] + s_excl)  # (C, TPX)

        test = T_entry * (1.0 - alpha_eff)
        bad = jnp.logical_and(~skip, test < T_EPS)
        bad_cum = seg_cumsum(bad.astype(jnp.float32), first) > 0.0  # inclusive OR
        done_cum = jnp.logical_or(bad_cum, done[ct] > 0)
        include = jnp.logical_and(~skip, ~done_cum)

        weight = jnp.where(include, alpha * T_entry, 0.0)
        acc = acc.at[ct].add(weight[..., None] * rgb[:, None, :])
        logT = logT.at[ct].add(jnp.where(include, jnp.log1p(-alpha), 0.0))
        done = done.at[ct].max(done_cum.astype(jnp.int32))
        return (logT, acc, done), None

    (logT, acc, _), _ = jax.lax.scan(step, (logT0, acc0, done0), xs)

    T_final = jnp.exp(logT)
    out = acc + T_final[..., None] * bg  # background term (forward.cu:483)

    # (num_tiles, tpx, 3) -> (H, W, 3) crop
    img = out.reshape(grid_y, grid_x, tile_h, tile_w, 3)
    img = img.transpose(0, 2, 1, 3, 4).reshape(grid_y * tile_h, grid_x * tile_w, 3)
    tmap = T_final.reshape(grid_y, grid_x, tile_h, tile_w)
    tmap = tmap.transpose(0, 2, 1, 3).reshape(grid_y * tile_h, grid_x * tile_w)
    return CompositeOut(image=img[:height, :width], final_t=tmap[:height, :width])


def render_bruteforce(
    prep: PreprocessOut,
    width: int,
    height: int,
    tile_w: int,
    tile_h: int,
    bg: jnp.ndarray,
    chunk: int = 32,
) -> CompositeOut:
    """Oracle: global depth sort, every Gaussian vs every pixel.

    Applies the same rect-overlap rule as the tiled path (a pixel only
    sees Gaussians whose tile rect covers the pixel's tile), so outputs
    match `composite_tiles` exactly.
    """
    P = prep.depths.shape[0]
    depth_key = jnp.where(prep.visible, prep.depths, jnp.inf)
    order = jnp.argsort(depth_key, stable=True)

    C = min(chunk, P)
    n_chunks = (P + C - 1) // C
    pad = n_chunks * C - P
    if pad:
        order = jnp.concatenate([order.astype(jnp.int32), jnp.zeros((pad,), jnp.int32)])
    order = order.astype(jnp.int32)
    ord_valid = jnp.logical_and(
        jnp.arange(n_chunks * C) < P, prep.visible[order]
    )

    xs = (
        order.reshape(n_chunks, C),
        ord_valid.reshape(n_chunks, C),
    )

    ix = jnp.arange(width, dtype=jnp.float32)[None, :]
    iy = jnp.arange(height, dtype=jnp.float32)[:, None]
    tile_x = (jnp.arange(width, dtype=jnp.int32) // tile_w)[None, :]
    tile_y = (jnp.arange(height, dtype=jnp.int32) // tile_h)[:, None]

    logT0 = jnp.zeros((height, width), jnp.float32)
    acc0 = jnp.zeros((height, width, 3), jnp.float32)
    done0 = jnp.zeros((height, width), bool)

    def step(carry, chunk_xs):
        logT, acc, done = carry
        ids, valid = chunk_xs
        m = prep.means2d[ids]  # (C, 2)
        cn = prep.conic[ids]
        rgb = prep.rgb[ids]
        op = jnp.where(valid, prep.opacity[ids], 0.0)
        rmin = prep.rect_min[ids]
        rmax = prep.rect_max[ids]

        dx = m[:, 0, None, None] - ix[None]
        dy = m[:, 1, None, None] - iy[None]
        power = (
            -0.5 * (cn[:, 0, None, None] * dx * dx + cn[:, 2, None, None] * dy * dy)
            - cn[:, 1, None, None] * dx * dy
        )
        alpha = jnp.minimum(ALPHA_MAX, op[:, None, None] * jnp.exp(power))
        in_rect = (
            (tile_x[None] >= rmin[:, 0, None, None])
            & (tile_x[None] < rmax[:, 0, None, None])
            & (tile_y[None] >= rmin[:, 1, None, None])
            & (tile_y[None] < rmax[:, 1, None, None])
        )
        skip = (power > 0.0) | (alpha < ALPHA_MIN) | ~in_rect | ~valid[:, None, None]
        alpha_eff = jnp.where(skip, 0.0, alpha)

        logs = jnp.log1p(-alpha_eff)
        first = jnp.zeros((C,), bool).at[0].set(True)
        s_incl = seg_cumsum(logs, first)
        s_excl = s_incl - logs
        T_entry = jnp.exp(logT[None] + s_excl)

        test = T_entry * (1.0 - alpha_eff)
        bad = (~skip) & (test < T_EPS)
        bad_cum = seg_cumsum(bad.astype(jnp.float32), first) > 0.0
        include = (~skip) & ~(bad_cum | done[None])

        weight = jnp.where(include, alpha * T_entry, 0.0)
        acc = acc + jnp.sum(weight[..., None] * rgb[:, None, None, :], axis=0)
        logT = logT + jnp.sum(jnp.where(include, jnp.log1p(-alpha), 0.0), axis=0)
        done = done | jnp.any(bad_cum, axis=0)
        return (logT, acc, done), None

    (logT, acc, _), _ = jax.lax.scan(step, (logT0, acc0, done0), xs)
    T_final = jnp.exp(logT)
    return CompositeOut(image=acc + T_final[..., None] * bg, final_t=T_final)
