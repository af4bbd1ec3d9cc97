"""Streaming Pallas transposes that PIN memory layouts across a gather.

XLA's layout assignment will happily give a gather a {0,1} output layout
to make a downstream transpose free — which turns each gathered row into
R strided 4-byte writes (~37 ms at 3M rows on v5e) instead of one
contiguous 4R-byte row (~15 ms). `optimization_barrier` does not stop
that layout propagation; a Mosaic custom call does (Pallas operands and
results take default {1,0} layouts). Sandwiching the gather between
these two kernels therefore forces the fast contiguous-row form on both
its input and output sides, at the cost of two HBM-bandwidth streams.

Used by the backward gradient routing's boundary gathers. (A forward
record-gather variant and an inverse relayout_to_cols existed as A/B
arms; both measured slower than the direct forms at every operating
point and were deleted in round 3.) See cuda_rasterizer/
rasterizer_impl.cu:345-374 for the reference's mirror-image trade-off
(GPU gathers per entry inside the kernel; TPU pre-streams sorted
records).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-call block width. Grid-step overhead (~1 us) dominated the original
# 256-wide blocks (K/256 ~ 8k steps = ~7.5 ms measured at K=2.1M); wider
# blocks amortize it. The ceiling is the OUTPUT block's VMEM footprint:
# an (blk, R) block lane-pads R up to 128, so blk=16384 costs 8 MiB per
# buffer and OOMed the 16 MiB scoped-vmem limit once the lane-axis
# padding made it actually engage (train crash, round 4). blk=2048 keeps
# the grid at ~K/2048 steps (~1 ms overhead at K=2.1M) with a 1 MiB
# output block — 2.3 MiB total double-buffered. Real capacities are
# 256-multiples but rarely blk-multiples, so the lane axis is PADDED up
# to the block: <= 2047 zero lanes streamed once vs ~7 ms of grid-step
# overhead saved.
_RELAYOUT_BLK = 2048


def _blk(k: int) -> int:
    return _RELAYOUT_BLK if k >= _RELAYOUT_BLK else 256


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _to_rows_kernel(in_ref, out_ref):
    out_ref[...] = in_ref[...].T


def relayout_to_rows(x: jnp.ndarray) -> jnp.ndarray:
    """(R, K) fields-on-sublanes -> (K, R) entries-on-sublanes, via a
    streaming Pallas transpose whose Mosaic boundary PINS both layouts to
    {1,0} (rows contiguous). XLA's layout assignment cannot propagate a
    strided layout through a custom call, so a row gather consuming this
    output reads contiguous 4*R-byte rows instead of R strided columns."""
    r, k = x.shape
    blk = _blk(k)
    kp = -(-k // blk) * blk
    if kp != k:
        x = jnp.pad(x, ((0, 0), (0, kp - k)))
    assert kp % blk == 0, (r, k, kp)
    out = pl.pallas_call(
        _to_rows_kernel,
        grid=(kp // blk,),
        in_specs=[
            pl.BlockSpec((r, blk), lambda b: (0, b),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((blk, r), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kp, r), x.dtype),
        interpret=_interpret(),
    )(x)
    # Callers gather rows by index < k, so the zero tail is never read;
    # returning the padded array avoids a k-sized slice copy.
    return out


