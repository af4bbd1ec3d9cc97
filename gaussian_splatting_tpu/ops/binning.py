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
