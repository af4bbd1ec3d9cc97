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

from typing import NamedTuple

import jax
import jax.numpy as jnp


CHUNK = 128  # entries per source block == Pallas lane width



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

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(s_tile, tile_ids, side="left").astype(jnp.int32)
    tile_stop = jnp.searchsorted(s_tile, tile_ids, side="right").astype(jnp.int32)

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
# 2. The f32 depth sort key is replaced by a *depth rank* from one cheap
#    P-sized sort — ranks expand exactly through the delta-cumsum, make
#    (tile, rank) pairs unique (=> unstable sort, no tiebreak operand),
#    and pack with the tile id into a single s32 key when the bits fit.
# 3. Tile ranges come from a rect-corner histogram (2-D prefix sums),
#    not searchsorted over the sorted keys. Exact because overflow drops
#    *whole* trailing gaussians (counts zeroed when a rect doesn't fit in
#    the remaining capacity), never a rect's tail.
# 4. One row-gather by sorted rank fetches the 9 render fields from a
#    rank-permuted (P, 16) table — the only K-sized gather left.
#
# The reference GPU does the opposite (radix-sorts ids and gathers per
# entry inside the render kernel, rasterizer_impl.cu:345-374); gathers are
# cheap there and sorts expensive, the mirror image of the TPU trade-off.
# ---------------------------------------------------------------------------

REC_ROWS = 16  # mx my ca cb cc r g b op + 7 zero pad rows (sublane aligned)

_GEO_BITS = 10  # rect fields packed 10/10/10 => grids up to 1024x1024 tiles


class SortedRecords(NamedTuple):
    rec: jnp.ndarray  # (REC_ROWS, K) f32, entries sorted by (tile, depth)
    rank: jnp.ndarray  # (K,) int32 depth rank per entry (== P for padding)
    order: jnp.ndarray  # (P,) int32 gaussian id per depth rank
    counts: jnp.ndarray  # (P,) int32 emitted entries per gaussian (post-clip)
    tile_start: jnp.ndarray  # (num_tiles,) int32
    tile_stop: jnp.ndarray  # (num_tiles,) int32
    total: jnp.ndarray  # () int32 true entry count (> K => overflow)


class Visits(NamedTuple):
    """Static-shape work list for the Pallas kernels: one visit per
    (tile, 128-entry source block) pair, tiles ascending, blocks ascending.
    Source blocks are aligned slices of the sorted entry array; a block at
    a tile boundary is visited once per overlapping tile with
    complementary lane masks. Wv = K//128 + num_tiles.

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
    raw_off = jnp.cumsum(counts_raw) - counts_raw
    total = raw_off[-1] + counts_raw[-1]

    # Overflow drops WHOLE trailing gaussians (a rect that doesn't fit in
    # the remaining capacity emits nothing) so the rect-corner histogram
    # below stays exact. The reference instead reallocates its arena
    # (rasterize_points.cu:28-36); here `total` tells the host to grow the
    # capacity bucket.
    fits = (raw_off + counts_raw) <= k
    counts = jnp.where(fits, counts_raw, 0)
    offs = jnp.cumsum(counts) - counts
    total_eff = offs[-1] + counts[-1]

    # Depth rank: position of each gaussian in the (depth, id)-stable
    # order. Ranks sort exactly like f32 depth keys (ties broken by id,
    # matching the reference's stable radix sort) but expand exactly
    # through the int delta-cumsum and pack into the sort key.
    iota_p = jnp.arange(p, dtype=i32)
    _, order = jax.lax.sort(
        (depths.astype(f32), iota_p), num_keys=1, is_stable=True
    )
    _, rank_of = jax.lax.sort((order, iota_p), num_keys=1, is_stable=False)

    rw = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 1)
    geo = (
        (rect_min[:, 0] << (2 * _GEO_BITS))
        | (rect_min[:, 1] << _GEO_BITS)
        | rw
    )

    def expand(col):
        """Per-entry value of a per-gaussian i32 field via delta-scatter +
        cumsum. Exact: deltas of skipped gaussians telescope away, and the
        scatter-add merges colliding deltas at shared run starts."""
        delta = col - jnp.concatenate([jnp.zeros((1,), i32), col[:-1]])
        z = jnp.zeros((k,), i32).at[offs].add(delta, mode="drop")
        return jnp.cumsum(z)

    e_off = expand(offs)
    e_rank = expand(rank_of)
    e_geo = expand(geo)

    slot = jnp.arange(k, dtype=i32)
    valid = slot < total_eff
    local = slot - e_off
    e_rw = jnp.maximum(e_geo & ((1 << _GEO_BITS) - 1), 1)
    e_ry = (e_geo >> _GEO_BITS) & ((1 << _GEO_BITS) - 1)
    e_rx = (e_geo >> (2 * _GEO_BITS)) & ((1 << _GEO_BITS) - 1)
    tile = (e_ry + local // e_rw) * grid_x + e_rx + local % e_rw

    rank_bits = max((p - 1).bit_length(), 1)
    rank_mask = (1 << rank_bits) - 1
    pad_key = num_tiles << rank_bits  # > every real key; == for all padding
    if (pad_key | (p - 1)) < 2**31:
        # (tile, rank) packed into one s32: a single-operand unstable sort.
        key = jnp.where(valid, (tile << rank_bits) | e_rank, pad_key)
        (s_key,) = jax.lax.sort((key,), num_keys=1, is_stable=False)
        is_pad = s_key >= pad_key
        s_rank = jnp.where(is_pad, p, s_key & rank_mask)
    else:
        tile_key = jnp.where(valid, tile, num_tiles)
        rank_key = jnp.where(valid, e_rank, p)
        _, s_rank = jax.lax.sort((tile_key, rank_key), num_keys=2, is_stable=False)

    # Render fields per sorted entry: ONE K-sized row gather from the
    # rank-permuted table (rank doubles as the gaussian id in entry
    # space); the where() zeroes padding rows.
    prow = jnp.stack(
        [
            means2d[:, 0].astype(f32),
            means2d[:, 1].astype(f32),
            conic[:, 0].astype(f32),
            conic[:, 1].astype(f32),
            conic[:, 2].astype(f32),
            rgb[:, 0].astype(f32),
            rgb[:, 1].astype(f32),
            rgb[:, 2].astype(f32),
            opacity.astype(f32),
        ]
        + [jnp.zeros((p,), f32)] * (REC_ROWS - 9),
        axis=1,
    )  # (P, REC_ROWS)
    prow_ranked = prow[order]  # (P, REC_ROWS), cheap P-sized row gather
    rec = jnp.where(
        (s_rank < p)[None, :], prow_ranked[jnp.minimum(s_rank, p - 1)].T, 0.0
    )  # (REC_ROWS, K)

    tile_start, tile_stop = _tile_ranges_histogram(
        rect_min, rect_max, counts, grid_x, grid_y
    )
    return SortedRecords(
        rec=rec, rank=s_rank, order=order, counts=counts,
        tile_start=tile_start, tile_stop=tile_stop, total=total,
    )


def _tile_ranges_histogram(rect_min, rect_max, counts, grid_x, grid_y):
    """Per-tile [start, stop) ranges in the sorted entry list, from a 2-D
    rect-corner histogram + prefix sums (O(P + T), no searchsorted over K).
    Exact because every emitting gaussian contributes its whole clipped
    rect (`counts` is the rect area or 0)."""
    vis = counts > 0
    x0 = jnp.where(vis, rect_min[:, 0], 0)
    y0 = jnp.where(vis, rect_min[:, 1], 0)
    x1 = jnp.where(vis, rect_max[:, 0], 0)
    y1 = jnp.where(vis, rect_max[:, 1], 0)
    one = jnp.where(vis, 1, 0)
    grid = jnp.zeros((grid_y + 1, grid_x + 1), jnp.int32)
    grid = grid.at[y0, x0].add(one, mode="drop")
    grid = grid.at[y0, x1].add(-one, mode="drop")
    grid = grid.at[y1, x0].add(-one, mode="drop")
    grid = grid.at[y1, x1].add(one, mode="drop")
    tcounts = jnp.cumsum(jnp.cumsum(grid, axis=0), axis=1)[:grid_y, :grid_x]
    tcounts = tcounts.reshape(grid_y * grid_x)
    stop = jnp.cumsum(tcounts).astype(jnp.int32)
    start = stop - tcounts
    return start, stop


def build_visits(
    tile_start: jnp.ndarray, tile_stop: jnp.ndarray, capacity: int, num_tiles: int
) -> Visits:
    a = CHUNK
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
