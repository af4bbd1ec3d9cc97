"""Differentiable Gaussian rasterization: the public render op.

The TPU-native replacement for the reference's autograd boundary
(diff_gaussian_rasterization/__init__.py:47-258 wrapping
rasterizer_impl.cu). There is no opaque byte-buffer handoff here: the whole
pipeline (preprocess -> binning -> composite) is one jittable function and
JAX AD differentiates it end to end. The "screenspace_points with
retain_grad" trick the reference uses to harvest 2D-mean gradients for
densification (gaussian_renderer/__init__.py:37-42) becomes an explicit
`mean2d_bias` input: take grad w.r.t. it to get dL/d(NDC mean), the same
quantity backward.cu emits via ddelx_dx = 0.5*W (backward.cu:481-482).

Backends:
  - "xla":    sorted tile lists + scan compositing (default; CPU + TPU)
  - "pallas": Pallas TPU kernel compositing (fast path; TPU only)
  - "reference": brute-force oracle (tests; small scenes)
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from gaussian_splatting_tpu.ops import binning, composite
from gaussian_splatting_tpu.ops.projection import preprocess
from gaussian_splatting_tpu.scene.cameras import CameraArrays


@dataclass(frozen=True)
class RasterizerConfig:
    """Static rasterizer configuration (hashable: safe as a jit static arg).

    tile_w/tile_h: screen tile size. 32x32 is the round-5 measured
      winner at every operating point (default_tile_geometry has the
      table); the reference's 16x16 (config.h:15-17) remains available
      and bit-identical in binning behavior.
    capacity_mult: tile-list capacity as a multiple of P (the padded
      Gaussian count). The true entry count is returned in aux["num_entries"]
      so training can grow the bucket on overflow.
    chunk: entries composited per scan step (XLA backend).
    backend: "auto" resolves at trace time to the Pallas fast path on TPU
      and the XLA composite path elsewhere; both produce the same image.
    """

    tile_w: int = 32
    tile_h: int = 32
    capacity_mult: int = 8
    chunk: int = 256
    backend: str = "auto"
    capacity_exact: Optional[int] = None  # overrides capacity_mult when set

    def capacity(self, num_points: int) -> int:
        cap = (
            self.capacity_exact
            if self.capacity_exact is not None
            else self.capacity_mult * num_points
        )
        return max(256, ((cap + 255) // 256) * 256)


def default_tile_geometry(converged: bool = True, training: bool = False) -> tuple:
    """Measured tile-geometry policy. As of round 5, 32x32 wins at EVERY
    measured point (MEASURE_r5.log / MEASURE_r5_trained.log):

    - converged render: 30.2 vs 24.2 fps (trained model)
    - training:         cloud 8.81 vs 7.60 it/s, trained 12.7 vs 9.0
    - unconverged render: cloud 21.1 vs 19.1 fps, shell 26.7 ~= 26.8

    The round-3 result that 32x16 beat 32x32 on unconverged renders
    (17.1 vs 14.8, MEASURE_r3b.log) no longer reproduces: REC_ROWS
    16->9 cut per-visit record DMA and the kernel slimmed since, so the
    K-proportional stages (the 13.8 ns/row gather, sort, routing) now
    dominate pixels-per-visit everywhere. The signature is kept so a
    future scene class that re-splits the decision has a place to live;
    both arguments are currently ignored.
    """
    del converged, training
    return (32, 32)


def entry_bucket_capacity(n_entries: int, bits: int = 16, headroom: float = 1.2) -> int:
    """Bucketed tile-list capacity for a measured entry count: multiples of
    2^bits at scene scale, power-of-two buckets below that so tiny scenes
    don't pay a big floor. The host-side analog of the reference's dynamic
    arena resize (rasterize_points.cu:28-36). 2^16 is the round-5 measured
    winner (MEASURE_r5.log: trained render 30.74 fps vs 30.28 at 2^17,
    trained train 13.71 vs 13.51, cloud train 9.89 vs 9.71; 2^15 is a
    plateau, so the coarser bucket wins for fewer mid-training
    recompiles). Compiled-binary quality is chaotically shape-sensitive
    at FINE granularity (a 0.05% capacity change once moved the frame
    36%), which is why this snaps to coarse buckets at all."""
    want = max(256, int(n_entries * headroom))
    bucket = 1 << bits
    if want >= bucket:
        return -(-want // bucket) * bucket
    return 1 << (want - 1).bit_length()


def _pallas_grid_ok(grid_x: int, grid_y: int) -> bool:
    """Whether the Pallas fast path's bit packings cover this tile grid.
    The local-index packing widens automatically up to 20 bits (binning.
    emit_sorted_records), so the only remaining bound is the 10-bit rect
    geometry: grids up to 1023x1023 tiles (~16K px at 16-px tiles)."""
    return max(grid_x, grid_y) < (1 << binning._GEO_BITS)


def _xla_path(prep, config, grid_x, grid_y, width, height, bg):
    lists = binning.build_tile_lists(
        prep.rect_min,
        prep.rect_max,
        prep.depths,
        prep.tiles_touched,
        grid_x,
        grid_y,
        config.capacity(prep.depths.shape[0]),
    )
    out = composite.composite_tiles(
        prep,
        lists,
        width,
        height,
        config.tile_w,
        config.tile_h,
        bg,
        chunk=config.chunk,
    )
    return out, lists.total


@partial(
    jax.jit,
    static_argnames=("sh_degree", "width", "height", "config", "return_aux"),
)
def rasterize(
    means3d: jnp.ndarray,  # (P, 3)
    scales: jnp.ndarray,  # (P, 3) activated
    quats: jnp.ndarray,  # (P, 4)
    opacities: jnp.ndarray,  # (P,) or (P, 1) activated
    shs: Optional[jnp.ndarray],  # (P, K, 3)
    sh_degree: int,
    cam: CameraArrays,
    width: int,
    height: int,
    bg: jnp.ndarray,  # (3,)
    config: RasterizerConfig = RasterizerConfig(),
    scale_modifier: float = 1.0,
    mean2d_bias: Optional[jnp.ndarray] = None,
    alive: Optional[jnp.ndarray] = None,
    colors_precomp: Optional[jnp.ndarray] = None,
    cov3d_precomp: Optional[jnp.ndarray] = None,
    return_aux: bool = True,
):
    """Render Gaussians to an (H, W, 3) image.

    Returns (image, aux) where aux has radii (P,), visible (P,),
    final_t (H, W), num_entries () — the analog of the reference's
    {render, radii, visibility_filter} dict plus overflow accounting.
    """
    P = means3d.shape[0]
    opacities = opacities.reshape(P)
    if config.backend == "auto":
        # Trace-time resolution (config is a static arg): the Pallas fast
        # path on TPU, the XLA composite path elsewhere. Same outputs.
        from dataclasses import replace as _dc_replace

        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
        config = _dc_replace(config, backend=backend)

    prep = preprocess(
        means3d,
        scales,
        quats,
        opacities,
        shs,
        sh_degree,
        cam,
        width,
        height,
        config.tile_w,
        config.tile_h,
        scale_modifier=scale_modifier,
        mean2d_bias=mean2d_bias,
        alive=alive,
        colors_precomp=colors_precomp,
        cov3d_precomp=cov3d_precomp,
    )

    grid_x = (width + config.tile_w - 1) // config.tile_w
    grid_y = (height + config.tile_h - 1) // config.tile_h

    if config.backend == "reference":
        out = composite.render_bruteforce(
            prep, width, height, config.tile_w, config.tile_h, bg
        )
        num_entries = jnp.sum(prep.tiles_touched)
    elif config.backend == "pallas" and not _pallas_grid_ok(grid_x, grid_y):
        # The emission packs rect geometry into 10 bits per axis
        # (binning._GEO_BITS); past ~16K px at 16-px tiles fall back to
        # the XLA composite path rather than crash (same outputs, several
        # times slower — warn so a benchmark cliff is explainable).
        import warnings

        warnings.warn(
            f"pallas backend: {grid_x}x{grid_y} tile grid exceeds the "
            "10-bit rect packing; using the (slower) XLA composite path",
            stacklevel=2,
        )
        out, num_entries = _xla_path(prep, config, grid_x, grid_y, width, height, bg)
    elif config.backend == "pallas":
        from gaussian_splatting_tpu.ops.composite_pallas import render_tiles_pallas

        out, num_entries = render_tiles_pallas(
            prep, width, height, config.tile_w, config.tile_h, bg,
            config.capacity(P),
        )
    else:
        out, num_entries = _xla_path(prep, config, grid_x, grid_y, width, height, bg)

    if not return_aux:
        return out.image
    aux = {
        "radii": prep.radii,
        "visible": prep.visible,
        "final_t": out.final_t,
        "num_entries": num_entries,
    }
    return out.image, aux


@partial(jax.jit, static_argnames=())
def mark_visible(positions: jnp.ndarray, viewmatrix: jnp.ndarray) -> jnp.ndarray:
    """Frustum visibility mask, the analog of GaussianRasterizer.markVisible
    (diff_gaussian_rasterization/__init__.py:246-258 -> rasterize_points.cu:
    218-237): camera-space z > 0.2, like the render-path cull
    (auxiliary.h:154-171 checks z only in practice).
    """
    p_view = positions @ viewmatrix[:3, :3].T + viewmatrix[:3, 3]
    return p_view[..., 2] > 0.2
