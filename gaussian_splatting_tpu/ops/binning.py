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
# on v5e at 4M entries): random *element* gathers run on the scalar path
# (~35 ms per pass), *row* gathers amortize that over the row (~22 ms for
# (K,16)), a 3-operand lax.sort costs ~15 ms but every extra value operand
# adds a full pass (and multi-operand sorts take minutes to COMPILE). So:
# one small row-gather for the (tile, depth) keys, a 3-operand sort of
# (tile, depth, gaussian id), and one row-gather of the 9 render fields by
# the sorted ids — the opposite decomposition from the reference GPU,
# which radix-sorts ids and gathers per entry inside the render kernel
# (rasterizer_impl.cu:345-374).
# ---------------------------------------------------------------------------

REC_ROWS = 16  # mx my ca cb cc r g b op + 7 zero pad rows (sublane aligned)


class SortedRecords(NamedTuple):
    rec: jnp.ndarray  # (REC_ROWS, K) f32, entries sorted by (tile, depth)
    gauss_id: jnp.ndarray  # (K,) int32 source gaussian (== P sentinel for padding)
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

    counts = tiles_touched.astype(jnp.int32)
    offsets = jnp.cumsum(counts) - counts
    total = offsets[-1] + counts[-1]

    # slot -> gaussian id via scatter + cummax (cheaper than jnp.repeat's
    # gather-based lowering on TPU)
    marks = jnp.zeros((k,), jnp.int32).at[offsets].max(
        jnp.arange(p, dtype=jnp.int32) + 1, mode="drop"
    )
    gid = jnp.maximum(_cummax_fill(marks), 0)

    # key fields per entry: one small row gather
    kprow = jnp.stack(
        [
            rect_min[:, 0].astype(f32),
            rect_min[:, 1].astype(f32),
            jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 1).astype(f32),
            offsets.astype(f32),  # exact below 2^24; capacities stay below
            depths.astype(f32),
            jnp.zeros((p,), f32),
            jnp.zeros((p,), f32),
            jnp.zeros((p,), f32),
        ],
        axis=1,
    )  # (P, 8)
    # transposed once: contiguous row reads instead of strided column
    # slices (each of which XLA materializes as its own pass)
    krows = kprow[gid].T  # (8, K)

    slot = jnp.arange(k, dtype=jnp.int32)
    valid = slot < total
    local = slot - krows[3].astype(jnp.int32)
    rw = jnp.maximum(krows[2].astype(jnp.int32), 1)
    tile_x = krows[0].astype(jnp.int32) + local % rw
    tile_y = krows[1].astype(jnp.int32) + local // rw
    tile_key = jnp.where(valid, tile_y * grid_x + tile_x, num_tiles)
    depth_key = jnp.where(valid, krows[4], jnp.inf)
    # gid travels through the sort: it routes the record row-gather below
    # AND the hand-written VJP's per-gaussian segment_sum (padding slots
    # get the P sentinel segment, which also quarantines uninitialized
    # gradient blocks of never-visited padding space).
    gid_key = jnp.where(valid, gid, p)

    s_tile, _s_depth, s_gid = jax.lax.sort(
        (tile_key.astype(jnp.int32), depth_key, gid_key.astype(jnp.int32)),
        num_keys=2,
        is_stable=True,
    )

    # render fields per sorted entry: one row gather + transpose to the
    # kernel's fields-on-sublanes layout; the where() zeroes padding rows
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
    rec = jnp.where(
        (s_gid < p)[None, :], prow[jnp.minimum(s_gid, p - 1)].T, 0.0
    )  # (REC_ROWS, K)

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(s_tile, tile_ids, side="left").astype(jnp.int32)
    tile_stop = jnp.searchsorted(s_tile, tile_ids, side="right").astype(jnp.int32)
    return SortedRecords(
        rec=rec, gauss_id=s_gid, tile_start=tile_start, tile_stop=tile_stop,
        total=total,
    )


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
