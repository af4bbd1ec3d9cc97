"""Pallas TPU kernels for tile-based alpha compositing (forward + VJP).

The fast path replacing `cuda_rasterizer/forward.cu::renderCUDA`
(forward.cu:331-485) and `backward.cu::renderCUDA` (backward.cu:408-601).

Design (TPU-first, not a CUDA translation):

- Per-entry records arrive pre-sorted by (tile, depth) in a packed
  (REC_ROWS, K) array: fields on sublanes, entries on lanes. The fields travel
  as *sort values* (binning.emit_sorted_records) because random gathers on
  TPU run on the scalar path (~35 ms per 5M-element gather on v5e) while
  lax.sort is bandwidth-friendly — the opposite trade-off from the
  reference GPU, whose rasterizer sorts ids and gathers per entry.
- The grid walks (tile, 256-entry source block) visit pairs, tiles
  ascending, blocks ascending (binning.build_visits). A source block at a
  tile boundary is visited once per overlapping tile with complementary
  lane masks — no re-layout/alignment pass is needed. All visits of one
  tile accumulate into the same VMEM-resident (3, 256) image block (the
  standard Pallas revisit-reduction pattern); Pallas double-buffers the
  record stream.
- Inside a visit, pixels live on sublanes (16x16 tile = 256) and entries
  on lanes, processed as two 128-lane halves so no prefix-scan roll
  crosses a lane tile. The sequential front-to-back compositing order becomes
  a lane-axis *cumulative product* of (1 - alpha) in linear space (TPU
  early exit guarantees T >= 1e-4, so no log-space reconstruction is
  needed) — the whole-chip analog of the warp-sequential blend loop at
  forward.cu:437-463. Channel contractions ride the MXU at the measured
  precision tiers (_PREC_DEFAULTS: hand-rolled 2-3-pass bf16 splits;
  HIGHEST's 6-pass f32 emulation cost ~40% of both kernels).
- Early termination (T < 1e-4, forward.cu:452-456) is reproduced exactly
  via masks; per-pixel final transmittance is the only image-space
  residual the backward needs — even lighter than the reference's
  final_T + n_contrib (rasterizer_impl.h:50-57), because the backward
  REPLAYS the forward's early-exit decisions bit-exactly.
- The backward walks visits in the SAME forward order (not back-to-front
  like backward.cu:408): the suffix color term S_i of backward.cu:549 is
  rewritten as TOTAL - prefix_i, where TOTAL = sum_c g_c * acc_c +
  g_ft * T_final is available per pixel from the forward residuals. With
  forward ordering, gradient blocks shared between adjacent tiles are
  written by *consecutive* visits and accumulate in VMEM.

Gradient convention: alpha = min(0.99, op * G) gets a *gated* gradient
(zero where clamped), matching JAX AD on the XLA backend so the two
backends are interchangeable. (The reference CUDA backward ignores the
clamp; the clamp is active only for near-opaque splats.)
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussian_splatting_tpu.ops import binning
from gaussian_splatting_tpu.ops.binning import Visits
from gaussian_splatting_tpu.ops.composite import ALPHA_MAX, ALPHA_MIN, T_EPS, CompositeOut
from gaussian_splatting_tpu.ops.projection import PreprocessOut

CH = binning.CHUNK  # 128 entries per in-kernel chunk (lane width)
BLK = binning.BLOCK  # entries per source block / visit (CH-sized halves)
HALVES = BLK // CH
REC_ROWS = binning.REC_ROWS

_f32 = jnp.float32
_i32 = jnp.int32
_HI = jax.lax.Precision.HIGHEST


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tri(strict: bool) -> jnp.ndarray:
    """(CH, CH) f32 triangular mask: tri[j, i] = 1 where j < i (strict) or
    j <= i (inclusive). Contracting a (TPX, CH) array against it on the MXU
    computes a lane-axis prefix sum in ~6 engine passes at HIGHEST
    precision — ~4x cheaper than the 7-step Hillis-Steele roll scan the
    kernels used previously (they are lane-op-count bound)."""
    row = jax.lax.broadcasted_iota(_i32, (CH, CH), 0)
    col = jax.lax.broadcasted_iota(_i32, (CH, CH), 1)
    cmp = row < col if strict else row <= col
    return cmp.astype(_f32)


def _scan_prec(env: str) -> str:
    """A/B: MXU pass count for the kernels' f32 matmuls. "hi" = native
    HIGHEST (6 bf16 passes ~ full f32); "high" = a hand-rolled 3-pass
    bf16 operand split (Mosaic does not implement Precision.HIGH in
    Pallas kernels — 'Unsupported dot precision', MEASURE_r5.log — so
    the split IS the 3-pass form: ~16 effective mantissa bits, ~1.5e-5
    relative); "default" = 1 bf16 pass (~4e-3 relative, timing probes
    only). GS_TPU_SCAN_PREC governs the transmittance scan (shared
    fwd/bwd, so replay stays exact — both kernels read the same flag)
    and must stay "hi": the golden-image fixture pins the pallas image
    at 2e-5. The backward-only flags (CGW/MOM/CG) perturb gradients
    ~1.5e-5 relative at "high" (bounded on-chip by
    tools/check_grad_prec.py) and nothing is replayed."""
    import os

    return os.environ.get(env, _PREC_DEFAULTS.get(env, "hi"))


# Per-flag defaults (measured, MEASURE_r5.log + check_grad_prec):
# every kernel matmul defaults to the bf16-split tier — the A/B ladder
# measured each flip on both scenes and the image stays inside the
# golden fixture's 2e-5 bound (small accumulated carry/scan error per
# pixel; the per-entry early-exit masks replay exactly because fwd and
# bwd share the flags).
_PREC_DEFAULTS = {
    "GS_TPU_SCAN_PREC": "high",
    "GS_TPU_CARRY_PREC": "high",
    "GS_TPU_CGW_PREC": "high",
    "GS_TPU_MOM_PREC": "high",
    "GS_TPU_CG_PREC": "high",
    "GS_TPU_CONTRIB_PREC": "high",
}


def _dot_prec(a: jnp.ndarray, b: jnp.ndarray, dims, prec: str) -> jnp.ndarray:
    """dot_general at a named precision tier, Mosaic-compatible.

    "high" is a manual bf16_3x: a = ah + al, b = bh + bl with each part
    rounded to bf16; ah@bh + al@bh + ah@bl on three single-pass bf16
    matmuls (bf16 x bf16 -> f32 accumulation is exact on the MXU). The
    dropped al@bl term and the bf16 rounding of the residuals bound the
    error at ~2^-16 relative — the same class as XLA's own
    bf16_3x/HIGH pass on non-Pallas dots."""
    if prec == "high":
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(_f32)).astype(jnp.bfloat16)
        bh = b.astype(jnp.bfloat16)
        bl = (b - bh.astype(_f32)).astype(jnp.bfloat16)

        def d(x, y):
            return jax.lax.dot_general(
                x, y, dims, preferred_element_type=_f32
            )

        return d(ah, bh) + (d(al, bh) + d(ah, bl))
    precision = {
        "hi": jax.lax.Precision.HIGHEST,
        "default": jax.lax.Precision.DEFAULT,
    }[prec]
    return jax.lax.dot_general(
        a, b, dims, preferred_element_type=_f32, precision=precision
    )


def _mm_scan(x: jnp.ndarray, strict: bool, prec=None) -> jnp.ndarray:
    """Lane-axis prefix SUM of a (TPX, CH) array via one MXU matmul.

    The triangular mask is 0/1 — exact in bf16 — so the "high" tier
    splits only x: two single-pass bf16 matmuls instead of the general
    three (the xl residual term carries the next 8 mantissa bits)."""
    if prec is None:
        prec = _scan_prec("GS_TPU_SCAN_PREC")
    dims = (((1,), (0,)), ((), ()))
    if prec == "high":
        t = _tri(strict).astype(jnp.bfloat16)
        xh = x.astype(jnp.bfloat16)
        xl = (x - xh.astype(_f32)).astype(jnp.bfloat16)

        def d(u):
            return jax.lax.dot_general(u, t, dims, preferred_element_type=_f32)

        return d(xh) + d(xl)
    return _dot_prec(x, _tri(strict), dims, prec)


def _use_horner_power() -> bool:
    """A/B switch: Horner-factored power polynomial (fewer lane ops,
    different f32 rounding) vs the parity moment form. Horner measured
    +0.9 fps at the 32x16/1080p operating point (MEASURE_r3c.log) and is
    the default; set GS_TPU_POWER=moment for the bit-parity form."""
    import os

    return os.environ.get("GS_TPU_POWER", "horner") == "horner"


# Measured A/B outcomes baked in (MEASURE_r3d.log, v5e 1080p flagship):
# - lane-axis prefix scans run as MXU matmuls in log space; the 7-step
#   Hillis-Steele roll-scan alternative measured 16.9 vs 17.8 fps and
#   was deleted.
# - the chunk transmittance carry is an MXU masked log-sum matvec; the
#   lane min-reduce alternative (~7-9 VPU ops per element, ~15-20% of the
#   kernels' lane-op budget) measured slower and was deleted. The values
#   agree to reduction rounding: by monotonicity, min over included
#   `test` equals t_carry * exp(sum of log(1-alpha) over lanes with
#   test >= T_EPS) — skipped lanes contribute log(1) = 0.


# Streaming layout-pinning transpose (used by the boundary gathers in
# the backward routing; re-exported for the profiler's stages).
from gaussian_splatting_tpu.ops.relayout import relayout_to_rows  # noqa: E402


def _visit_meta(w, vt_ref, ts_ref, tp_ref, vo_ref):
    """Derive a visit's metadata from the compact (T,)-sized range arrays.

    Returns (tile, block, lo, hi, rank0, first, last, dummy) as traced
    scalars. Per-visit metadata is recomputed from SMEM rather than stored
    at full (Wv,) width (SMEM is 1 MB on v5e).
    """
    num_tiles = vo_ref.shape[0] - 1
    t = vt_ref[w]
    start = ts_ref[t]
    stop = tp_ref[t]
    vo = vo_ref[t]
    b = start // BLK + (w - vo)
    lo = jnp.clip(start - b * BLK, 0, BLK)
    hi = jnp.clip(stop - b * BLK, 0, BLK)
    rank0 = b * BLK - start
    nblk = (stop - 1) // BLK - start // BLK + 1
    first = w == vo
    last = w == vo + nblk - 1
    dummy = w >= vo_ref[num_tiles]
    return t, b, lo, hi, rank0, first, last, dummy


def _visit_block_map(nblocks: int):
    """index_map computing a visit's (clamped) source block index."""

    def index_map(w, vt_ref, ts_ref, tp_ref, vo_ref, *_):
        t = vt_ref[w]
        b = ts_ref[t] // BLK + (w - vo_ref[t])
        return (0, jnp.clip(b, 0, nblocks - 1))

    return index_map


def _visit_tile_map(w, vt_ref, *_):
    return (vt_ref[w], 0, 0)


def _pixel_coords(t, grid_x: int, tile_w: int, tile_h: int, origin_y: int):
    """Tile-LOCAL pixel coordinates (TPX, 1) — the splat center is shifted
    into tile frame instead (better f32 precision than global coords, and
    the backward's moment expansion needs small magnitudes)."""
    tpx = tile_w * tile_h
    ox = ((t % grid_x) * tile_w).astype(_f32)
    oy = ((t // grid_x) * tile_h + origin_y).astype(_f32)
    pidx = jax.lax.broadcasted_iota(_i32, (tpx, 1), 0)
    pxl = (pidx % tile_w).astype(_f32)
    pyl = (pidx // tile_w).astype(_f32)
    return pxl, pyl, ox, oy


def _pix6(pxl, pyl):
    """(TPX, 6) pixel-monomial matrix [1, px, py, px^2, py^2, px*py] in
    tile-local coordinates — shared by the forward's separable power
    matmul and the backward's gradient moment matmul."""
    return jnp.concatenate(
        [jnp.ones_like(pxl), pxl, pyl, pxl * pxl, pyl * pyl, pxl * pyl],
        axis=1,
    )


def _chunk_geometry(rec, t, lo, hi, grid_x, tile_w, tile_h, origin_y):
    """Shared forward-recompute: per-(pixel, entry) alpha and masks.

    The record carries PRE-FOLDED conic coefficients c2{a,b,c} =
    (-0.5*ca, -cb, -0.5*cc) (binning.emit_sorted_records) so the power
    evaluates with three fused multiply-adds and no sign fixups.

    (A separable power-as-MXU-matmul variant — power[p,e] = pix6[p].w[e]
    — was tried and measured ~9 ms SLOWER per kernel pass than these
    elementwise VPU ops; the small contraction dim doesn't pay for the
    operand staging.)
    """
    mx, my = rec[0:1, :], rec[1:2, :]
    c2a, c2b, c2c = rec[2:3, :], rec[3:4, :], rec[4:5, :]
    rgb3 = rec[5:8, :]  # (3, CH)
    op = rec[8:9, :]

    lane = jax.lax.broadcasted_iota(_i32, (1, CH), 1)
    in_range = jnp.logical_and(lane >= lo, lane < hi)

    pxl, pyl, ox, oy = _pixel_coords(t, grid_x, tile_w, tile_h, origin_y)
    mxl = mx - ox  # (1, CH) splat center in tile frame
    myl = my - oy
    dx = mxl - pxl  # (TPX, CH)
    dy = myl - pyl
    if _use_horner_power():
        # Horner-factored quadratic: 2 fewer full-size lane ops (and FMA-
        # fusable) than the moment form, at the cost of a different f32
        # rounding. Replay-exact (fwd and bwd share this code path).
        power = (c2a * dx + c2b * dy) * dx + (c2c * dy) * dy
    else:
        power = c2a * (dx * dx) + c2c * (dy * dy) + c2b * (dx * dy)
    g = jnp.exp(power)
    raw = op * g
    alpha = jnp.minimum(ALPHA_MAX, raw)
    # the lane-range mask rides the alpha threshold ((1, CH) select)
    # instead of a third full-size logical_or. NOT(alpha >= thr) instead of
    # (alpha < thr) so a NaN alpha (diverged record fields) is skipped on
    # every lane — including out-of-range ones, where `NaN < inf` would
    # otherwise let garbage into the log/MXU prefix scan.
    a_thr = jnp.where(in_range, ALPHA_MIN, jnp.inf)
    skip = jnp.logical_or(power > 0.0, jnp.logical_not(alpha >= a_thr))
    return dict(
        c2a=c2a, c2b=c2b, c2c=c2c, rgb3=rgb3, op=op,
        mxl=mxl, myl=myl, pxl=pxl, pyl=pyl,
        g=g, raw=raw, alpha=alpha, skip=skip, lane=lane,
    )


def _blend_state(geo, t_carry):
    """Replay-exact compositing state for one CH-lane chunk.

    Transmittance is reconstructed in log space: om = 1 - alpha of each
    non-skipped entry, excl = exp(strict-prefix-sum(log om)) via one MXU
    matmul. The forward and backward call THIS function with identical
    inputs, so early-exit decisions replay bit-exactly.

    Saturation is folded into the SIGN of the carry: a saturated pixel
    stores -T_final, which makes every future `test` negative (< T_EPS),
    so exclusion needs no separate `done` flag; |carry| is the final
    transmittance (TPU early exit keeps it >= T_EPS, forward.cu:452-456).
    """
    alpha, skip = geo["alpha"], geo["skip"]
    # Fold the skip mask into a zeroed alpha once: am = alpha where the
    # pair contributes, else exactly 0. Downstream masks then need only
    # the single `test >= T_EPS` compare (`tcmp`) — a skipped lane has
    # om = 1, so its `test` equals the carried transmittance and neither
    # the weight (am = 0) nor the min/log carry reductions are perturbed.
    # This drops the old 3-op include mask (not(skip) & cmp & and) from
    # both kernels with bit-identical outputs.
    am = jnp.where(skip, 0.0, alpha)
    om = 1.0 - am  # blend factor, 1 if skipped
    logom = jnp.log(om)
    excl = jnp.exp(_mm_scan(logom, strict=True))
    t_entry = t_carry * excl  # transmittance before entry i (negative if done)
    test = t_entry * om  # monotone non-increasing along lanes
    tcmp = test >= T_EPS
    wgt = jnp.where(tcmp, am * t_entry, 0.0)  # (TPX, CH)
    # carry update: |new| = T after the last included entry; sign goes
    # negative when the chunk's tail crossed the early-exit threshold
    # (covers already-saturated carries). T after the last included entry
    # = |t_carry| * prod over lanes with test >= T_EPS of om (skipped
    # lanes have om = 1, logom = 0, so no skip mask is needed); with zero
    # such lanes the sum is 0 and the carry magnitude is unchanged.
    # A (TPX, 1) MXU matvec costs like a full 128-lane matmul per pass
    # (the output lane axis pads to one full tile), so at HIGHEST this
    # carry rivals the prefix scan itself. The "high" tier splits only
    # the logom operand (the ones vector is bf16-exact): 2 passes for
    # ~2^-16 relative carry error — shared fwd/bwd, so replay stays
    # exact. (A lane-reduction form was measured SLOWER than the matvec
    # in round 3 — cross-lane shuffles lose to the MXU on this chip.)
    x = jnp.where(tcmp, logom, 0.0)
    ones = jnp.ones((CH, 1), _f32)
    dims = (((1,), (0,)), ((), ()))
    if _scan_prec("GS_TPU_CARRY_PREC") == "high":
        xh = x.astype(jnp.bfloat16)
        xl = (x - xh.astype(_f32)).astype(jnp.bfloat16)
        ob = ones.astype(jnp.bfloat16)
        row = jax.lax.dot_general(
            xh, ob, dims, preferred_element_type=_f32
        ) + jax.lax.dot_general(xl, ob, dims, preferred_element_type=_f32)
    else:
        row = jax.lax.dot_general(
            x, ones, dims, preferred_element_type=_f32, precision=_HI,
        )  # (TPX, 1)
    base = jnp.abs(t_carry) * jnp.exp(row)
    new_t = jnp.where(test[:, CH - 1:CH] < T_EPS, -base, base)
    return dict(
        am=am, om=om, t_entry=t_entry, test=test, tcmp=tcmp, wgt=wgt,
        new_t=new_t,
    )


def _fwd_kernel(
    vt_ref, ts_ref, tp_ref, vo_ref, oy_ref,  # scalar prefetch (compact)
    rec_ref,  # (REC_ROWS, BLK) at the visit's source block
    img_ref, ft_ref,  # outputs
    t_s,  # scratch (TPX, 1): |T| carry, sign = saturated
    *, grid_x: int, tile_w: int, tile_h: int,
):
    w = pl.program_id(0)
    origin_y = oy_ref[0]
    t, _b, v_lo, v_hi, v_rank0, v_first, v_last, v_dummy = _visit_meta(
        w, vt_ref, ts_ref, tp_ref, vo_ref
    )
    tpx = tile_w * tile_h

    @pl.when(jnp.logical_and(v_first, jnp.logical_not(v_dummy)))
    def _():
        img_ref[...] = jnp.zeros_like(img_ref)
        t_s[...] = jnp.ones_like(t_s)

    # Each CH-lane half of the BLK-entry block is processed separately
    # (the matmul scan and its masks stay within one lane tile); the
    # signed transmittance carry in scratch chains the halves (and lets
    # half B skip once half A saturated every pixel).
    for h in range(HALVES):
        lo_h = jnp.clip(v_lo - h * CH, 0, CH)
        hi_h = jnp.clip(v_hi - h * CH, 0, CH)
        not_saturated = jnp.logical_not(jnp.all(t_s[...] < 0.0))
        active = jnp.logical_and(
            jnp.logical_and(jnp.logical_not(v_dummy), not_saturated),
            hi_h > lo_h,
        )

        @pl.when(active)
        def _(h=h, lo_h=lo_h, hi_h=hi_h):
            geo = _chunk_geometry(
                rec_ref[:, h * CH:(h + 1) * CH], t, lo_h, hi_h,
                grid_x, tile_w, tile_h, origin_y,
            )
            st = _blend_state(geo, t_s[...])
            contrib = _dot_prec(
                geo["rgb3"], st["wgt"], (((1,), (1,)), ((), ())),
                _scan_prec("GS_TPU_CONTRIB_PREC"),
            )  # (3, TPX)
            img_ref[0] = img_ref[0] + contrib
            t_s[...] = st["new_t"]

    @pl.when(jnp.logical_and(v_last, jnp.logical_not(v_dummy)))
    def _():
        ft_ref[...] = jnp.abs(t_s[...]).reshape(1, 1, tpx)


def _bwd_kernel(
    vt_ref, ts_ref, tp_ref, vo_ref, oy_ref,  # scalar prefetch (compact)
    rec_ref, img_ref, g_ref, gft_ref, ft_ref,  # inputs
    drec_ref,  # output (REC_ROWS, BLK) at the visit's source block
    t_s, pfx_s, tot_s,  # scratch (TPX, 1) x3
    *, grid_x: int, tile_w: int, tile_h: int,
):
    w = pl.program_id(0)
    origin_y = oy_ref[0]
    t, b, v_lo, v_hi, v_rank0, v_first, _v_last, v_dummy = _visit_meta(
        w, vt_ref, ts_ref, tp_ref, vo_ref
    )
    tpx = tile_w * tile_h
    # a new source block starts unless the previous visit wrote the same one
    t_prev = vt_ref[jnp.maximum(w - 1, 0)]
    b_prev = ts_ref[t_prev] // BLK + (w - 1 - vo_ref[t_prev])
    v_newblk = jnp.logical_and(
        jnp.logical_not(v_dummy), jnp.logical_or(w == 0, b != b_prev)
    )

    @pl.when(jnp.logical_and(v_first, jnp.logical_not(v_dummy)))
    def _():
        # TOTAL[p] = sum_c g[c,p] * acc[c,p] + g_ft[p] * T_final[p]
        # (acc = pre-background image; the suffix color term of
        # backward.cu:549 becomes TOTAL - prefix, enabling a forward walk.)
        g2 = g_ref[0]  # (3, TPX)
        acc2 = img_ref[0]
        tot_row = jnp.sum(g2 * acc2, axis=0, keepdims=True) + gft_ref[0] * ft_ref[0]
        tot_s[...] = tot_row.reshape(tpx, 1)
        t_s[...] = jnp.ones_like(t_s)
        pfx_s[...] = jnp.zeros_like(pfx_s)

    @pl.when(v_newblk)
    def _():
        drec_ref[...] = jnp.zeros_like(drec_ref)

    for h in range(HALVES):
        lo_h = jnp.clip(v_lo - h * CH, 0, CH)
        hi_h = jnp.clip(v_hi - h * CH, 0, CH)
        # Replay the forward's early-exit decisions exactly (same carries,
        # same arithmetic, same order) instead of consuming an n_contrib
        # residual — possible because this backward walks FORWARD, unlike
        # the reference's back-to-front walk (backward.cu:485-490), and it
        # gives the same whole-chunk skip once every pixel is saturated.
        not_saturated = jnp.logical_not(jnp.all(t_s[...] < 0.0))
        active = jnp.logical_and(
            jnp.logical_and(jnp.logical_not(v_dummy), not_saturated),
            hi_h > lo_h,
        )

        @pl.when(active)
        def _(h=h, lo_h=lo_h, hi_h=hi_h):
            sl = slice(h * CH, (h + 1) * CH)
            geo = _chunk_geometry(
                rec_ref[:, sl], t, lo_h, hi_h, grid_x, tile_w, tile_h, origin_y
            )
            st = _blend_state(geo, t_s[...])
            c2a, c2b, c2c = geo["c2a"], geo["c2b"], geo["c2c"]
            mxl, myl = geo["mxl"], geo["myl"]
            pxl, pyl = geo["pxl"], geo["pyl"]
            tcmp, om, t_i, wgt = st["tcmp"], st["om"], st["t_entry"], st["wgt"]

            g2 = g_ref[0]  # (3, TPX) image cotangent for this tile
            cg = _dot_prec(
                g2, geo["rgb3"], (((0,), (0,)), ((), ())),
                _scan_prec("GS_TPU_CG_PREC"),
            )  # (TPX, CH) = sum_c g[c,p] * rgb[c,i]
            cgw = cg * wgt
            pfx_incl = (
                _mm_scan(cgw, strict=False, prec=_scan_prec("GS_TPU_CGW_PREC"))
                + pfx_s[...]
            )
            a_i = tot_s[...] - pfx_incl  # suffix color dot g, incl final_t term

            # clamp gate folded into the select mask. dpower = dalpha * am
            # with dalpha = t_i*cg - a_i/om; under the live mask
            # (tcmp & unclamped) am * t_i == wgt, so the first term's
            # product am*t_i*cg IS the already-computed cgw — one fewer
            # full-size multiply (rounding differs from the (dalpha)*am
            # order by one reassociation; gradients are tolerance-tested).
            # Skipped lanes are zeroed by am = 0 itself (cgw = 0, om = 1).
            live = jnp.logical_and(tcmp, geo["raw"] < ALPHA_MAX)
            dpower = jnp.where(live, cgw - st["am"] * (a_i / om), 0.0)

            # All pixel-axis reductions as ONE moment matmul on the MXU:
            # dx = mxl - pxl is separable, so d{conic, mean2d} are linear
            # combinations of S_k = sum_p dpower * {1, px, py, px^2, py^2,
            # px*py}, and dop = S0 / op exactly (dpower = dalpha*op*g*gate).
            # Tile-local coords keep the expansion's cancellation benign.
            # Gradients are wrt the STORED pre-folded fields c2{a,b,c};
            # _render_core_bwd maps them back to the conic convention.
            s_mom = _dot_prec(
                _pix6(pxl, pyl), dpower, (((0,), (0,)), ((), ())),
                _scan_prec("GS_TPU_MOM_PREC"),
            )  # (6, CH)
            s0, s1x, s1y = s_mom[0:1], s_mom[1:2], s_mom[2:3]
            s2x, s2y, sxy = s_mom[3:4], s_mom[4:5], s_mom[5:6]
            dop = s0 / jnp.maximum(geo["op"], 1e-8)  # op >= 1/255 if included
            dc2a = mxl * mxl * s0 - 2.0 * mxl * s1x + s2x
            dc2b = mxl * myl * s0 - mxl * s1y - myl * s1x + sxy
            dc2c = myl * myl * s0 - 2.0 * myl * s1y + s2y
            dmx = 2.0 * c2a * (mxl * s0 - s1x) + c2b * (myl * s0 - s1y)
            dmy = 2.0 * c2c * (myl * s0 - s1y) + c2b * (mxl * s0 - s1x)
            drgb = _dot_prec(
                g2, wgt, (((1,), (0,)), ((), ())),
                _scan_prec("GS_TPU_CG_PREC"),
            )  # (3, CH)

            rows = jnp.concatenate(
                [dmx, dmy, dc2a, dc2b, dc2c, drgb, dop], axis=0
            )  # (REC_ROWS, CH) — one gradient row per record field
            drec_ref[:, sl] = drec_ref[:, sl] + rows

            t_s[...] = st["new_t"]
            # the inclusive scan's last lane IS old_pfx + sum(cgw): reuse
            # it instead of a separate full-size lane reduction
            pfx_s[...] = pfx_incl[:, CH - 1:CH]


def _fwd_call(cfg, rec, v: Visits, origin_y):
    grid_x, grid_y, tile_w, tile_h, interp = cfg
    num_tiles = grid_x * grid_y
    tpx = tile_w * tile_h
    wv = v.tile.shape[0]

    kernel = partial(_fwd_kernel, grid_x=grid_x, tile_w=tile_w, tile_h=tile_h)
    nblocks = rec.shape[1] // BLK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(wv,),
        in_specs=[
            pl.BlockSpec(
                (REC_ROWS, BLK), _visit_block_map(nblocks), memory_space=pltpu.VMEM
            )
        ],
        out_specs=[
            pl.BlockSpec((1, 3, tpx), _visit_tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tpx), _visit_tile_map, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((tpx, 1), _f32)],
    )
    out_shape = [
        jax.ShapeDtypeStruct((num_tiles, 3, tpx), _f32),
        jax.ShapeDtypeStruct((num_tiles, 1, tpx), _f32),
    ]
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=interp,
    )(v.tile, v.tile_start, v.tile_stop, v.voff, origin_y, rec)


def _bwd_call(cfg, rec, img, g_img, g_ft, ft, v: Visits, origin_y):
    grid_x, grid_y, tile_w, tile_h, interp = cfg
    tpx = tile_w * tile_h
    wv = v.tile.shape[0]

    kernel = partial(_bwd_kernel, grid_x=grid_x, tile_w=tile_w, tile_h=tile_h)
    nblocks = rec.shape[1] // BLK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(wv,),
        in_specs=[
            pl.BlockSpec(
                (REC_ROWS, BLK), _visit_block_map(nblocks), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 3, tpx), _visit_tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tpx), _visit_tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tpx), _visit_tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tpx), _visit_tile_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (REC_ROWS, BLK), _visit_block_map(nblocks), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[pltpu.VMEM((tpx, 1), _f32)] * 3,
    )
    (drec,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(rec.shape, _f32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=interp,
    )(
        v.tile, v.tile_start, v.tile_stop, v.voff, origin_y,
        rec, img, g_img, g_ft, ft,
    )
    return drec


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _render_core(
    cfg, means2d, conic, rgb, opacity, depths, rect_min, rect_max, tiles, oy,
):
    """Differentiable emit+sort+composite with a hand-written VJP.

    The custom boundary spans the sort: letting JAX AD linearize through
    emit_sorted_records keeps ~90 entry-sized residuals alive (6 GB at 1M
    entries). Here the residuals are the sorted records, the sorted
    gaussian ids, and the per-tile outputs only.
    """
    img, ft, _total, *_ = _render_core_fwd_impl(
        cfg, means2d, conic, rgb, opacity, depths, rect_min, rect_max, tiles,
        oy,
    )
    return img, ft


def _render_core_fwd_impl(
    cfg, means2d, conic, rgb, opacity, depths, rect_min, rect_max, tiles, oy,
):
    grid_x, grid_y, tile_w, tile_h, interp, capacity = cfg
    num_tiles = grid_x * grid_y
    sr = binning.emit_sorted_records(
        means2d, conic, rgb, opacity, depths, rect_min, rect_max, tiles,
        grid_x, grid_y, capacity,
    )
    v = binning.build_visits(sr.tile_start, sr.tile_stop, capacity, num_tiles)
    kcfg = (grid_x, grid_y, tile_w, tile_h, interp)
    img, ft = _fwd_call(kcfg, sr.rec, v, oy)
    # Tiles the kernel never visited (no entries) hold uninitialized HBM.
    empty = sr.tile_stop == sr.tile_start
    img = jnp.where(empty[:, None, None], 0.0, img)
    ft = jnp.where(empty[:, None, None], 1.0, ft)
    return img, ft, sr.total, sr, v


def _render_core_fwd(
    cfg, means2d, conic, rgb, opacity, depths, rect_min, rect_max, tiles, oy,
):
    img, ft, _total, sr, v = _render_core_fwd_impl(
        cfg, means2d, conic, rgb, opacity, depths, rect_min, rect_max, tiles,
        oy,
    )
    p = means2d.shape[0]
    res = (sr.rec, sr.gauss_id, sr.counts, v, img, ft, oy, p)
    return (img, ft), res


def _render_core_bwd(cfg, res, cts):
    rec, gid, gcounts, v, img, ft, oy, p = res
    g_img, g_ft = cts
    grid_x, grid_y, tile_w, tile_h, interp, capacity = cfg
    kcfg = (grid_x, grid_y, tile_w, tile_h, interp)
    drec = _bwd_call(kcfg, rec, img, g_img, g_ft, ft, v, oy)

    # Route per-entry gradients back to gaussians. A direct segment_sum
    # lowers to a slow TPU scatter-add (~57 ms at 4M entries). Grouping
    # entries by gaussian with an argsort + row gather is also slow: a
    # random row gather from a K-sized table measured ~49 ms at K=2.1M
    # (~2x the P-table form; profile_stages `gforms`, round 3). The fast
    # form carries the nine gradient columns through the sort as PAYLOAD
    # operands: each extra sort operand costs ~1.5-2 ms, so a 10-operand
    # (gid, d0..d8) sort lands around ~16 ms — the regroup and the gather
    # in one pass, ~3x cheaper than sort+gather. The now-contiguous runs
    # reduce by prefix sums + boundary differences. Padding entries carry
    # the P sentinel id, sort last, and fall outside every run — this
    # also quarantines uninitialized gradient blocks of never-visited
    # padding space.
    #
    # Can the sort shrink below 1 key + 9 payloads? No, with exact math:
    # the 9 routed values per entry are 6 independent moments of dpower
    # over the pixel axis (S0 and the frame-independent first/second
    # moments that dmx/dmy/dc2* are per-gaussian-constant combinations
    # of) plus the 3 drgb rows, which contract the cotangent's full
    # spatial pattern (g2 @ wgt) and are not moment-derivable. dop in
    # particular is S0/op — the 0th moment — while {dmx, dmy} span only
    # the 1st and {dc2*} the 2nd: S0 cannot be recovered from them (the
    # 5 equations leave the 6-moment space underdetermined), so dropping
    # the dop operand would lose the opacity gradient. Re-basing the
    # rows to raw moments permutes, never shrinks, the set.
    sorted_ops = jax.lax.sort(
        (gid,) + tuple(drec[i] for i in range(9)),
        num_keys=1, is_stable=False,
    )
    dsorted = jnp.stack(sorted_ops[1:], axis=0)  # (9, K) runs by gid
    # run boundaries: entries of gaussian g occupy [ends[g]-cnt[g], ends[g])
    ends = binning._cumsum_1d(gcounts)
    starts = ends - gcounts
    # Run sums via prefix differences — but a raw global prefix sum makes
    # the absolute rounding error of every run scale with the global
    # running-sum magnitude (small-contribution gaussians lose their
    # significant bits). Centering each row by its mean turns the linear
    # prefix drift into a near-random walk, so ulp(prefix) stays close to
    # run-local magnitudes; the subtracted mean is restored exactly per
    # run as m * count. The tail past the last real entry is masked to
    # zero (it is uninitialized never-visited block memory; runs never
    # cover it, and masking keeps it out of the row means too).
    n_real = ends[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, dsorted.shape, 1)
    real = lane < n_real
    xm = jnp.where(real, dsorted, 0.0)
    m = jnp.sum(xm, axis=1, keepdims=True) / jnp.maximum(
        n_real.astype(jnp.float32), 1.0
    )  # (9, 1)
    csum = binning._cumsum_rows(jnp.where(real, dsorted - m, 0.0))
    # Run sums need csum at the P run boundaries. Gathering from `csum.T`
    # directly lets XLA fold the transpose into a {0,1} output layout,
    # turning each boundary row into 9 strided 4-byte reads (~6 ms per
    # gather at P=262k). Pinning the transpose in a Pallas relayout makes
    # both gathers contiguous 36-byte row reads. incl[-1] := 0 is
    # realized by clamping the index and masking.
    csum_rows = relayout_to_rows(csum)  # (K, 9), rows contiguous
    # ONE boundary gather, not two: emission runs are contiguous, so
    # starts[g] = ends[g-1] and the lower boundary row is just the upper
    # row of the previous gaussian — a row SHIFT (bit-identical to the
    # second gather, including the starts==0 mask: ends[g-1] == 0 zeroes
    # the same rows).
    top = jnp.where(
        (ends > 0)[:, None], csum_rows[jnp.maximum(ends - 1, 0)], 0.0
    )
    bot = jnp.concatenate([jnp.zeros_like(top[:1]), top[:-1]], axis=0)
    run = top - bot
    dcols = run + gcounts.astype(jnp.float32)[:, None] * m[:, 0][None, :]
    dmeans2d = dcols[:, 0:2]
    # records carry pre-folded c2 = (-0.5*ca, -cb, -0.5*cc); map the
    # kernel's d/d_c2 back to the conic convention of `preprocess`.
    dconic = dcols[:, 2:5] * jnp.asarray([-0.5, -1.0, -0.5], jnp.float32)
    drgb = dcols[:, 5:8]
    dop = dcols[:, 8]
    f0 = lambda shape: np.zeros(shape, jax.dtypes.float0)
    # Blend order is piecewise constant in depth: zero gradient, like the
    # reference (depth only orders the sort; backward.cu has no d/d-depth).
    return (
        dmeans2d, dconic, drgb, dop, jnp.zeros((p,), rec.dtype),
        f0((p, 2)), f0((p, 2)), f0((p,)), f0(oy.shape),
    )


_render_core.defvjp(_render_core_fwd, _render_core_bwd)


def render_tiles_pallas(
    prep: PreprocessOut,
    width: int,
    height: int,
    tile_w: int,
    tile_h: int,
    bg: jnp.ndarray,
    capacity: int,
    origin_y=0,
):
    """Pallas fast path with the same contract as composite.composite_tiles.

    Returns (CompositeOut, total_entries).
    """
    grid_x = (width + tile_w - 1) // tile_w
    grid_y = (height + tile_h - 1) // tile_h
    num_tiles = grid_x * grid_y
    tpx = tile_w * tile_h
    # keep >= one trailing unused block so dummy visits have a safe target
    capacity = ((capacity + BLK - 1) // BLK) * BLK + BLK

    cfg = (grid_x, grid_y, tile_w, tile_h, _interpret(), capacity)
    oy = jnp.asarray(origin_y, jnp.int32).reshape(1)
    img_tiles, ft_tiles = _render_core(
        cfg, prep.means2d, prep.conic, prep.rgb, prep.opacity, prep.depths,
        prep.rect_min, prep.rect_max, prep.tiles_touched, oy,
    )
    total = jnp.sum(prep.tiles_touched)

    ft_tiles = ft_tiles.reshape(num_tiles, tpx)
    img_tiles = img_tiles + ft_tiles[:, None, :] * bg[None, :, None]
    img = img_tiles.reshape(grid_y, grid_x, 3, tile_h, tile_w)
    img = img.transpose(0, 3, 1, 4, 2).reshape(grid_y * tile_h, grid_x * tile_w, 3)
    ft = ft_tiles.reshape(grid_y, grid_x, tile_h, tile_w)
    ft = ft.transpose(0, 2, 1, 3).reshape(grid_y * tile_h, grid_x * tile_w)
    out = CompositeOut(image=img[:height, :width], final_t=ft[:height, :width])
    return out, total
