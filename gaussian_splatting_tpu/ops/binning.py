"""Tile binning: duplicate-key emission, (tile, depth) sort, tile ranges.

TPU-native replacement for the reference's device pipeline
(cuda_rasterizer/rasterizer_impl.cu:286-410):

    cub::DeviceScan::InclusiveSum(tiles_touched)      -> jnp.cumsum
    duplicateWithKeys (tileID<<32 | depth bits)       -> jnp.repeat with a
        static total_repeat_length + rect arithmetic (no 64-bit keys: we
        sort lexicographically on (tile, depth) instead)
    cub::DeviceRadixSort::SortPairs                   -> lax.sort(num_keys=2)
    identifyTileRanges                                -> searchsorted

The one data-dependent quantity — `num_rendered` (rasterizer_impl.cu:331) —
becomes a *static capacity* K. Entries beyond the capacity are dropped and
`total` is returned so the host can grow the capacity bucket (the reference
instead reallocates its arena buffers dynamically).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp


CHUNK = 128  # Pallas lane width (entries per in-kernel vector chunk)
BLOCK = 256  # entries per source block / visit granularity (2 lane chunks
# per grid step: halves the Mosaic grid-step overhead; the kernels scan
# each 128-lane half separately so no roll crosses a lane-tile boundary)



class TileLists(NamedTuple):
    gauss_id: jnp.ndarray  # (K,) int32: Gaussian index per sorted entry
    entry_tile: jnp.ndarray  # (K,) int32: tile index per sorted entry (== num_tiles for padding)
    entry_valid: jnp.ndarray  # (K,) bool
    tile_start: jnp.ndarray  # (num_tiles,) int32 range start in sorted list
    tile_stop: jnp.ndarray  # (num_tiles,) int32 range end (exclusive)
    total: jnp.ndarray  # () int32: true number of entries (may exceed K => overflow)


def build_tile_lists(
    rect_min: jnp.ndarray,  # (P, 2) int32
    rect_max: jnp.ndarray,  # (P, 2) int32
    depths: jnp.ndarray,  # (P,) f32
    tiles_touched: jnp.ndarray,  # (P,) int32 (0 for invisible)
    grid_x: int,
    grid_y: int,
    capacity: int,
) -> TileLists:
    P = depths.shape[0]
    num_tiles = grid_x * grid_y

    counts = tiles_touched.astype(jnp.int32)
    offsets = jnp.cumsum(counts) - counts  # exclusive prefix sum
    total = offsets[-1] + counts[-1]

    # Emit one entry per (Gaussian, covered tile): gauss index repeated
    # `counts` times, padded/truncated to the static capacity K.
    gauss_id = jnp.repeat(
        jnp.arange(P, dtype=jnp.int32), counts, total_repeat_length=capacity
    )

    slot = jnp.arange(capacity, dtype=jnp.int32)
    local = slot - offsets[gauss_id]
    rw = jnp.maximum(rect_max[gauss_id, 0] - rect_min[gauss_id, 0], 1)
    tile_x = rect_min[gauss_id, 0] + local % rw
    tile_y = rect_min[gauss_id, 1] + local // rw
    tile = tile_y * grid_x + tile_x

    valid = slot < total
    # Padding entries sort to the very end (tile key = num_tiles sentinel).
    tile_key = jnp.where(valid, tile, num_tiles).astype(jnp.int32)
    depth_key = jnp.where(valid, depths[gauss_id], jnp.inf).astype(jnp.float32)

    # Padding slots (jnp.repeat pads with the last id) must not reference
    # any real row: any garbage there would leak NaN/Inf into gradients
    # through 0 * NaN cotangents in the compositing backward.
    gauss_id = jnp.where(valid, gauss_id, 0)

    # Lexicographic (tile, depth) sort == the reference's single radix sort
    # over tileID<<32|depth (rasterizer_impl.cu:357-374); stable like cub.
    s_tile, s_depth, s_gauss, s_valid = jax.lax.sort(
        (tile_key, depth_key, gauss_id, valid), num_keys=2, is_stable=True
    )

    tile_start, tile_stop = _tile_ranges(s_tile, num_tiles)

    return TileLists(
        gauss_id=s_gauss,
        entry_tile=s_tile,
        entry_valid=s_valid,
        tile_start=tile_start,
        tile_stop=tile_stop,
        total=total,
    )

# ---------------------------------------------------------------------------
# Fast path for the Pallas compositing kernels. TPU cost model (measured
# on v5e at 3-4M entries): random *element* gathers run on the scalar path
# (~35 ms per pass), *row* gathers have a flat ~15 ms cost regardless of
# width, every lax.sort operand beyond the first adds a full pass (and
# multi-operand sorts take minutes to COMPILE), while a P-sized scatter
# plus a K-sized cumsum costs only ~3.5 ms. So the entry stream is built
# the cheap way:
#
# 1. Per-gaussian int32 fields are expanded to per-entry values by
#    *delta-scatter + cumsum*: scatter field DELTAS at each gaussian's
#    first slot and prefix-sum along K. Exact in int32 (garbage values of
#    culled gaussians telescope away), and ~2x cheaper than one row
#    gather for the three columns needed (run offset, depth rank, packed
#    rect geometry).
# 2. The f32 depth key travels as its BIT PATTERN (order-isomorphic to
#    the float for the positive depths that survive culling) so it also
#    expands exactly through the int delta-cumsum; the (tile, depth, gid)
#    sort runs unstable with no tiebreak operand.
# 3. Overflow drops *whole* trailing gaussians (counts zeroed when a
#    rect doesn't fit in the remaining capacity), never a rect's tail —
#    so the per-gaussian `counts` array stays consistent with the entry
#    stream for the VJP's run-boundary reductions.
# 4. One row-gather by sorted rank fetches the 9 render fields from a
#    rank-permuted (P, 16) table — the only K-sized gather left.
#
# The reference GPU does the opposite (radix-sorts ids and gathers per
# entry inside the render kernel, rasterizer_impl.cu:345-374); gathers are
# cheap there and sorts expensive, the mirror image of the TPU trade-off.
# ---------------------------------------------------------------------------

# Record rows: mx my c2a c2b c2c r g b op — exactly the 9 fields the
# compositing kernel consumes. Rounds 1-4 padded to 16; the round-5
# microbench (MICROBENCH_gather_r5.log, hoisting-proofed) confirms the
# gather cost is a per-row issue floor (~13.8 ns/row) INVARIANT to row
# width, so dropping the 7 zero-pad rows does not speed the gather — but
# it does cut the rec residual, the backward's drec buffer, and every
# kernel visit's record DMA by 7/16 of their bytes for free.
REC_ROWS = 9

_GEO_BITS = 10  # rect fields packed 10/10/10 => grids up to 1024x1024 tiles


class SortedRecords(NamedTuple):
    rec: jnp.ndarray  # (REC_ROWS, K) f32, entries sorted by (tile, depth)
    gauss_id: jnp.ndarray  # (K,) int32 source gaussian (== P for padding)
    counts: jnp.ndarray  # (P,) int32 emitted entries per gaussian (post-clip)
    tile_start: jnp.ndarray  # (num_tiles,) int32
    tile_stop: jnp.ndarray  # (num_tiles,) int32
    total: jnp.ndarray  # () int32 true entry count (> K => overflow)


class Visits(NamedTuple):
    """Static-shape work list for the Pallas kernels: one visit per
    (tile, BLOCK-entry source block) pair, tiles ascending, blocks
    ascending. Source blocks are aligned slices of the sorted entry array;
    a block at a tile boundary is visited once per overlapping tile with
    complementary lane masks. Wv = K//BLOCK + num_tiles.

    Only `tile` is Wv-sized; everything else a visit needs (block index,
    lane bounds, first/last flags, entry rank) is derived in-kernel from
    the (num_tiles,)-sized range arrays — the scalar-prefetch arrays live
    in SMEM (1 MB on v5e), so per-visit metadata at full width would not
    fit at scene scale.
    """

    tile: jnp.ndarray  # (Wv,) int32 (dummies alias the last real tile)
    tile_start: jnp.ndarray  # (num_tiles,) int32 entry range start
    tile_stop: jnp.ndarray  # (num_tiles,) int32 entry range stop
    voff: jnp.ndarray  # (num_tiles + 1,) int32 visit offset per tile; [-1] = real visit count
    tile_count: jnp.ndarray  # (num_tiles,) int32 entries per tile


def _cummax_fill(marks: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.cummax(marks) - 1


def _tile_ranges(s_tile: jnp.ndarray, num_tiles: int):
    """Per-tile [start, stop) ranges in the tile-sorted entry list.

    One searchsorted instead of two: with s_tile ascending,
    start[t] = #entries < t = #entries <= t-1 = stop[t-1], so the 'left'
    search is just the 'right' search shifted by one tile (each
    searchsorted lowers to a ~2.5 ms 22-step binary-search gather chain
    at K~3M on v5e, so halving the searches saves ~2.5 ms/frame).
    """
    i32 = jnp.int32
    tile_ids = jnp.arange(num_tiles, dtype=i32)
    tile_stop = jnp.searchsorted(s_tile, tile_ids, side="right").astype(i32)
    tile_start = jnp.concatenate([jnp.zeros((1,), i32), tile_stop[:-1]])
    return tile_start, tile_stop


def _cumsum_1d(x: jnp.ndarray) -> jnp.ndarray:
    """Exact inclusive 1-D cumsum via lane-major 2-level decomposition.

    XLA lowers a plain (N,) cumsum as a latency-bound multi-stage chain
    (~14 ms at N=262k on v5e!) while cumsum along the minor axis of a
    (rows, 128) array is a cheap reduce-window — so scan lanes per row and
    recurse on the 128x-smaller row totals."""
    n = x.shape[0]
    if n < 1024 or n % 128 != 0:
        return jnp.cumsum(x)
    r = n // 128
    cs = jnp.cumsum(x.reshape(r, 128), axis=1)
    tot = cs[:, -1]
    rowoff = _cumsum_1d(tot) - tot  # exclusive prefix of row totals
    return (cs + rowoff[:, None]).reshape(n)


def _cumsum_rows(x: jnp.ndarray) -> jnp.ndarray:
    """Exact inclusive cumsum of an (R, N) array along axis 1, same
    lane-major decomposition as _cumsum_1d, shared across the R rows."""
    r, n = x.shape
    if n < 1024 or n % 128 != 0:
        return jnp.cumsum(x, axis=1)
    c = n // 128
    cs = jnp.cumsum(x.reshape(r, c, 128), axis=2)
    tot = cs[:, :, -1]  # (R, C)
    rowoff = _cumsum_rows(tot) - tot
    return (cs + rowoff[:, :, None]).reshape(r, n)


def _fused_expand() -> bool:
    # Default fused: bitwise identical to per-column expansion and never
    # more passes (one scatter + one shared multi-row cumsum vs one pair
    # per column); percol kept as the A/B arm for measurement.
    return os.environ.get("GS_TPU_EXPAND", "fused") != "percol"


# How the 9 render fields reach their sorted entry order: one post-sort
# row gather from the (P, 16) record table — measured ~12 ns/row (~25 ms
# at K=2.1M), an XLA issue-rate floor invariant to layout (round-3
# gforms). The round-4 "sortpay" alternative — fields ride the
# (tile, depth) sort as 9 expanded f32-bit-pattern payload operands,
# replacing the gather entirely — measured decisively SLOWER
# (MEASURE_r4.log: cloud 13.0 vs 19.1 fps, shell 16.4 vs 26.6: the 9
# extra expansion columns + 12-operand sort cost ~25 ms MORE per frame
# than the gather they replace, the cost model's 14-18 ms was wrong)
# and was deleted per the losers-get-deleted convention.


def _expand_many(cols, offs, k):
    """Expand C per-gaussian i32 columns to per-entry values with ONE
    scatter + ONE lane-major multi-row cumsum, instead of C separate
    (scatter, cumsum) pairs.

    The per-column path costs ~3 ms each on v5e (a monotone P-scatter is
    ~2.3 ms, mostly issue latency, plus a ~0.7 ms K-cumsum); fusing lays
    the C delta streams out in one flat (C*K,) buffer at indices
    c*K + offs — still globally monotone, so XLA keeps the fast scatter
    path — and the (C, K) reshape makes all C prefix sums share one
    reduce-window sweep across sublanes. A/B via GS_TPU_EXPAND=fused.
    """
    i32 = jnp.int32
    c = len(cols)
    stacked = jnp.stack(cols, axis=0)  # (C, P)
    deltas = stacked - jnp.concatenate(
        [jnp.zeros((c, 1), i32), stacked[:, :-1]], axis=1
    )
    # Out-of-capacity offsets must be dropped explicitly: c*K + offs with
    # offs >= K would otherwise land inside the NEXT column's region.
    idx = jnp.where(
        offs[None, :] < k,
        jnp.arange(c, dtype=i32)[:, None] * k + offs[None, :],
        c * k,
    )
    z = jnp.zeros((c * k,), i32).at[idx.ravel()].add(deltas.ravel(), mode="drop")
    out = _cumsum_rows(z.reshape(c, k))
    return [out[i] for i in range(c)]


def emit_sorted_records(
    means2d: jnp.ndarray,  # (P, 2)
    conic: jnp.ndarray,  # (P, 3)
    rgb: jnp.ndarray,  # (P, 3)
    opacity: jnp.ndarray,  # (P,)
    depths: jnp.ndarray,  # (P,)
    rect_min: jnp.ndarray,  # (P, 2) int32
    rect_max: jnp.ndarray,  # (P, 2) int32
    tiles_touched: jnp.ndarray,  # (P,) int32
    grid_x: int,
    grid_y: int,
    capacity: int,
) -> SortedRecords:
    p = depths.shape[0]
    k = capacity
    num_tiles = grid_x * grid_y
    f32 = jnp.float32
    i32 = jnp.int32
    if max(grid_x, grid_y) >= (1 << _GEO_BITS):
        raise ValueError("tile grid exceeds the 10-bit rect packing")

    counts_raw = tiles_touched.astype(i32)
    cum_raw = _cumsum_1d(counts_raw)
    raw_off = cum_raw - counts_raw
    total = cum_raw[-1]

    # Overflow drops WHOLE trailing gaussians (a rect that doesn't fit in
    # the remaining capacity emits nothing) so the rect-corner histogram
    # below stays exact. `fits` is a prefix mask: raw_off is monotone, so
    # once one rect overflows capacity every later one does too — which
    # means raw_off doubles as the post-clip run offset (dropped
    # gaussians' offsets all land in the padding region and their deltas
    # never touch valid slots). This avoids a second P-sized cumsum
    # (XLA lowers (P,) cumsum as a ~7 ms latency-bound 4-stage chain).
    # The reference instead reallocates its arena (rasterize_points.cu:
    # 28-36); here `total` tells the host to grow the capacity bucket.
    fits = (raw_off + counts_raw) <= k
    counts = jnp.where(fits, counts_raw, 0)
    offs = raw_off
    total_eff = jnp.sum(counts)

    def expand(col):
        """Per-entry value of a per-gaussian i32 field via delta-scatter +
        cumsum. Exact (mod 2^32): deltas of skipped gaussians telescope
        away, the scatter-add merges colliding deltas at shared run
        starts, and the monotone `offs` indices keep XLA on the fast
        scatter path (random-index scatters lower to a sort-equivalent
        ~7 ms chain)."""
        delta = col - jnp.concatenate([jnp.zeros((1,), i32), col[:-1]])
        z = jnp.zeros((k,), i32).at[offs].add(delta, mode="drop")
        return jnp.cumsum(z)

    # Column 1: gaussian id packed with the low bits of the run offset
    # (local index = (slot - offs) mod 2^off_bits is exact because a rect
    # covers at most num_tiles <= 2^off_bits tiles). off_bits grows with
    # the grid — up to 20 bits for the largest 10-bit-geo grids (~16K px
    # at 16-px tiles) — and the gaussian id falls back to its own second
    # expansion column when it no longer fits the remaining bits.
    iota_p = jnp.arange(p, dtype=i32)
    off_bits = max(14, (num_tiles - 1).bit_length())
    off_mask = (1 << off_bits) - 1
    pack_gid = p <= (1 << (32 - off_bits))

    # Column 2: rect geometry; column 3: f32 depth BIT PATTERN (positive
    # floats order like their int bits, and bit-pattern deltas telescope
    # exactly — so the sort key is bit-identical to sorting f32 depths).
    rw = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 1)
    geo = (
        (rect_min[:, 0] << (2 * _GEO_BITS))
        | (rect_min[:, 1] << _GEO_BITS)
        | rw
    )
    depth_bits = jax.lax.bitcast_convert_type(depths.astype(f32), i32)

    # The 9 render fields the compositing kernel consumes, in record-row
    # order (conic pre-folded, see `prow` below).
    field_cols = [
        means2d[:, 0].astype(f32),
        means2d[:, 1].astype(f32),
        (-0.5 * conic[:, 0]).astype(f32),
        (-conic[:, 1]).astype(f32),
        (-0.5 * conic[:, 2]).astype(f32),
        rgb[:, 0].astype(f32),
        rgb[:, 1].astype(f32),
        rgb[:, 2].astype(f32),
        opacity.astype(f32),
    ]

    src_cols = (
        [(iota_p << off_bits) | (offs & off_mask)]
        if pack_gid
        else [iota_p, offs]
    )
    src_cols += [geo, depth_bits]
    if _fused_expand():
        e_cols = _expand_many(src_cols, offs, k)
    else:
        e_cols = [expand(c) for c in src_cols]

    if pack_gid:
        e_go = e_cols.pop(0)
        e_gid = jax.lax.shift_right_logical(e_go, off_bits)
        e_off_low = e_go & off_mask
    else:
        e_gid = e_cols.pop(0)
        e_off_low = e_cols.pop(0) & off_mask
    e_geo = e_cols.pop(0)
    e_depth = e_cols.pop(0)

    slot = jnp.arange(k, dtype=i32)
    valid = slot < total_eff
    local = (slot - e_off_low) & off_mask
    e_rw = jnp.maximum(e_geo & ((1 << _GEO_BITS) - 1), 1)
    e_ry = (e_geo >> _GEO_BITS) & ((1 << _GEO_BITS) - 1)
    e_rx = (e_geo >> (2 * _GEO_BITS)) & ((1 << _GEO_BITS) - 1)
    tile = (e_ry + local // e_rw) * grid_x + e_rx + local % e_rw

    # Unstable 3-operand sort on (tile, depth-bits): pairs can tie only on
    # exactly equal f32 depths in the same tile, where blend order is
    # arbitrary but deterministic (the reference's stable radix sort
    # breaks such ties by id instead).
    tile_key = jnp.where(valid, tile, num_tiles)
    depth_key = jnp.where(valid, e_depth, jnp.int32(0x7F7FFFFF))
    gid_key = jnp.where(valid, e_gid, p)
    s_tile, _, s_gid = jax.lax.sort(
        (tile_key, depth_key, gid_key), num_keys=2, is_stable=False
    )

    # Render fields per sorted entry: ONE K-sized row gather. Padding
    # rows carry clamped-but-finite garbage — safe, since the kernels
    # mask every lane outside a tile's [start, stop) range and the VJP
    # routes the padding sentinel id outside every reduction run.
    # Conic coefficients are stored PRE-FOLDED as (-0.5*ca, -cb,
    # -0.5*cc) so the compositing kernels evaluate power = c2a*dx^2 +
    # c2c*dy^2 + c2b*dx*dy with no sign/scale fixups (the VJP maps
    # gradients back).
    prow = jnp.stack(field_cols, axis=1)  # (P, REC_ROWS)
    ids = jnp.minimum(s_gid, p - 1)
    # Direct XLA row gather + .T. Round-3 gforms measured the gather's
    # ~12 ns/row cost INVARIANT to consumer/output layout at these
    # shapes, so the Pallas layout-pinning sandwich (relayout_to_cols)
    # bought nothing here and was deleted (MEASURE_r3b.log: relayout
    # 14.0 vs direct 14.9 fps at 16x16; same ordering at 32x32).
    rec = prow[ids].T  # (REC_ROWS, K)

    tile_start, tile_stop = _tile_ranges(s_tile, num_tiles)
    return SortedRecords(
        rec=rec, gauss_id=s_gid, counts=counts,
        tile_start=tile_start, tile_stop=tile_stop, total=total,
    )


def build_visits(
    tile_start: jnp.ndarray, tile_stop: jnp.ndarray, capacity: int, num_tiles: int
) -> Visits:
    a = BLOCK
    wv = capacity // a + num_tiles

    count = (tile_stop - tile_start).astype(jnp.int32)
    first_blk = tile_start // a
    last_blk = jnp.where(count > 0, (tile_stop - 1) // a, first_blk - 1)
    nblk = jnp.where(count > 0, last_blk - first_blk + 1, 0)
    voff = jnp.cumsum(nblk) - nblk
    w_real = voff[-1] + nblk[-1]

    w = jnp.arange(wv, dtype=jnp.int32)
    marks = jnp.zeros((wv,), jnp.int32).at[voff].max(
        jnp.where(nblk > 0, jnp.arange(num_tiles, dtype=jnp.int32) + 1, 0),
        mode="drop",
    )
    v_tile = jnp.maximum(_cummax_fill(marks), 0)
    real = w < w_real
    last_real_tile = jnp.max(jnp.where(real, v_tile, 0))
    v_tile = jnp.where(real, v_tile, last_real_tile)

    voff_ext = jnp.concatenate([voff, w_real[None]]).astype(jnp.int32)
    return Visits(
        tile=v_tile.astype(jnp.int32),
        tile_start=tile_start.astype(jnp.int32),
        tile_stop=tile_stop.astype(jnp.int32),
        voff=voff_ext,
        tile_count=count,
    )
