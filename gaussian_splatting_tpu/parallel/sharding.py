"""Multi-device training: primitive sharding + tile-strip sharding.

The reference is strictly single-GPU (utils/general_utils.py:173 pins
cuda:0; no torch.distributed anywhere). This module adds the two
first-class parallel axes the TPU build needs (SURVEY.md section 2.3):

1. **Primitive (Gaussian) sharding** — the padded parameter/optimizer
   pytree rows are sharded across the mesh's 'gauss' axis; the
   per-Gaussian stages (preprocess and its backward) run fully locally.

2. **Tile-strip sharding** — the image's tile-row grid is split across
   the same devices. After preprocess, each device all_gathers the
   *compact projected records* (means2d/depth/conic/rgb/opacity/rect —
   ~16 floats per Gaussian, not the raw params) over ICI and performs a
   DEVICE-LOCAL duplicate-key sort + composite for its own strip of tile
   rows. The decomposition is exact because the reference's global sort
   key has the tile id in the high bits (rasterizer_impl.cu:117-119) —
   a tile's entry range never crosses devices.

Gradients: shard_map AD turns the all_gather transpose into a
reduce_scatter of record cotangents over ICI, so each device receives
the full gradient for exactly its Gaussian shard — no separate psum of
parameter gradients is needed. The loss runs on the all_gathered full
image so SSIM windows see no strip seams.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from gaussian_splatting_tpu.ops import binning, composite, losses
from gaussian_splatting_tpu.ops.projection import PreprocessOut, preprocess
from gaussian_splatting_tpu.ops.rasterize import RasterizerConfig
from gaussian_splatting_tpu.scene.cameras import CameraArrays
from gaussian_splatting_tpu.scene.gaussians import GaussianParams, activate
from gaussian_splatting_tpu.scene.optim import AdamState, adam_update, expon_lr
from gaussian_splatting_tpu.training import OptimizationConfig, TrainState


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-host entry point: wire up jax.distributed so jax.devices()
    spans every host (the DCN analog of "nothing" in the single-GPU
    reference; SURVEY.md section 2.3 item 3).

    Env-gated: reads GS_COORDINATOR / GS_NUM_PROCESSES / GS_PROCESS_ID when
    arguments are omitted (on TPU pods with a cluster env, plain
    jax.distributed.initialize() autodetects all three). Returns True when
    a multi-process runtime was initialized, False for single-process runs.
    Idempotent: re-initialization attempts are ignored.
    """
    import os

    coordinator_address = coordinator_address or os.environ.get("GS_COORDINATOR")
    if num_processes is None and "GS_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["GS_NUM_PROCESSES"])
    if process_id is None and "GS_PROCESS_ID" in os.environ:
        process_id = int(os.environ["GS_PROCESS_ID"])
    if coordinator_address is None:
        return False
    is_init = getattr(jax.distributed, "is_initialized", None)
    if is_init is not None:
        if is_init():
            return True  # already initialized (idempotent)
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    try:  # older JAX: no public probe; let initialize() signal re-init
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already initialized" not in str(e).lower():
            raise
    return True


def make_mesh(n_devices: Optional[int] = None, axis: str = "gauss") -> Mesh:
    """1-D mesh over the first n (globally visible) devices. After
    initialize_distributed(), jax.devices() spans all hosts, so the mesh
    covers ICI within each host and DCN across hosts; the Gaussian-sharded
    stages communicate only through the record all_gather/reduce_scatter
    pair, which XLA maps to the fastest available link per hop."""
    devs = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.array(devs), (axis,))


def shard_train_state(state: TrainState, mesh: Mesh, axis: str = "gauss") -> TrainState:
    """Place all row-major state arrays with rows sharded over the mesh."""
    cap = state.alive.shape[0]

    def put(x):
        spec = PartitionSpec(axis) if (x.ndim >= 1 and x.shape[0] == cap) else PartitionSpec()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, state)


def make_sharded_train_step(
    mesh: Mesh,
    sh_degree: int,
    active_sh_degree: int,
    width: int,
    height: int,
    raster_cfg: RasterizerConfig,
    opt: OptimizationConfig,
    spatial_lr_scale: float,
    axis: str = "gauss",
    update_densify_stats: bool = True,
):
    """Build a jitted multi-device train step closed over static config.

    Returns fn(state, cam, gt, bg, iteration) -> (new_state, metrics);
    `state` must be placed by shard_train_state and its capacity must be
    divisible by the mesh size.
    """
    if raster_cfg.backend == "auto":
        from dataclasses import replace as _dc_replace

        raster_cfg = _dc_replace(
            raster_cfg,
            backend="pallas" if jax.default_backend() == "tpu" else "xla",
        )
    n = mesh.devices.size
    tw, th = raster_cfg.tile_w, raster_cfg.tile_h
    grid_x = (width + tw - 1) // tw
    grid_y = (height + th - 1) // th
    rows_per = (grid_y + n - 1) // n  # tile rows per device strip
    strip_h = rows_per * th

    def local_step(params_shard, m_shard, v_shard, opt_step, alive_shard,
                   max_radii2d, accum, denom, cam, gt, bg, iteration):
        strip_idx = jax.lax.axis_index(axis)
        row_lo = strip_idx * rows_per  # first tile row of my strip (traced)

        def loss_fn(params_shard, bias_shard):
            acts = activate(params_shard)
            prep_local = preprocess(
                acts.xyz, acts.scales, acts.quats, acts.opacities, acts.shs,
                active_sh_degree, cam, width, height, tw, th,
                mean2d_bias=bias_shard, alive=alive_shard,
            )
            # Compact records, replicated to every device over ICI.
            rec = [
                prep_local.means2d, prep_local.depths, prep_local.conic,
                prep_local.rgb, prep_local.opacity,
                prep_local.rect_min, prep_local.rect_max, prep_local.visible,
                prep_local.radii,
            ]
            rec = jax.tree.map(
                lambda x: jax.lax.all_gather(x, axis, axis=0, tiled=True), rec
            )
            (means2d, depths, conic, rgb, opacity, rect_min, rect_max,
             visible, radii_full) = rec
            P_full = means2d.shape[0]

            # Clip every Gaussian's tile rect to my strip of tile rows.
            rmin_y = jnp.clip(rect_min[:, 1] - row_lo, 0, rows_per)
            rmax_y = jnp.clip(rect_max[:, 1] - row_lo, 0, rows_per)
            rect_min_l = jnp.stack([rect_min[:, 0], rmin_y], axis=-1)
            rect_max_l = jnp.stack([rect_max[:, 0], rmax_y], axis=-1)
            tiles_l = jnp.where(
                visible,
                (rect_max_l[:, 0] - rect_min_l[:, 0]) * (rmax_y - rmin_y),
                0,
            ).astype(jnp.int32)

            capacity = max(raster_cfg.capacity(P_full) // n, 256)
            prep_full = PreprocessOut(
                means2d=means2d, depths=depths, conic=conic, rgb=rgb,
                opacity=opacity, radii=radii_full,
                rect_min=rect_min_l, rect_max=rect_max_l,
                tiles_touched=tiles_l, visible=visible,
            )
            if raster_cfg.backend == "pallas":
                from gaussian_splatting_tpu.ops.composite_pallas import (
                    render_tiles_pallas,
                )

                out, total = render_tiles_pallas(
                    prep_full, width, strip_h, tw, th, bg, capacity,
                    origin_y=row_lo * th,
                )
            else:
                lists = binning.build_tile_lists(
                    rect_min_l, rect_max_l, depths, tiles_l, grid_x, rows_per,
                    capacity,
                )
                out = composite.composite_tiles(
                    prep_full, lists, width, strip_h, tw, th, bg,
                    chunk=raster_cfg.chunk, origin_y=row_lo * th,
                )
                total = lists.total
            # Full image on every device so the SSIM window crosses strip
            # boundaries correctly; its transpose is a dynamic-slice.
            full = jax.lax.all_gather(out.image, axis, axis=0, tiled=True)[:height]
            l1 = losses.l1_loss(full, gt)
            loss = (1.0 - opt.lambda_dssim) * l1 + opt.lambda_dssim * (
                1.0 - losses.ssim(full, gt)
            )
            # Every device computes the identical replicated loss; inside
            # shard_map, grad differentiates the SUM of per-device losses
            # (the all_gather transpose is a psum_scatter), so scale by
            # 1/n to recover the true gradient.
            return loss / n, (prep_local, total, l1, loss, full)

        bias0 = jnp.zeros((params_shard.xyz.shape[0], 2), jnp.float32)
        (_, (prep_local, total, l1, loss, full)), (grads, bias_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params_shard, bias0)

        xyz_lr = expon_lr(
            iteration,
            opt.position_lr_init * spatial_lr_scale,
            opt.position_lr_final * spatial_lr_scale,
            lr_delay_mult=opt.position_lr_delay_mult,
            max_steps=opt.position_lr_max_steps,
        )
        lrs = GaussianParams(
            xyz=xyz_lr,
            features_dc=jnp.float32(opt.feature_lr),
            features_rest=jnp.float32(opt.feature_lr / 20.0),
            scaling=jnp.float32(opt.scaling_lr),
            rotation=jnp.float32(opt.rotation_lr),
            opacity=jnp.float32(opt.opacity_lr),
        )
        adam_shard = AdamState(m=m_shard, v=v_shard, step=opt_step)
        new_params, new_adam = adam_update(params_shard, grads, adam_shard, lrs, alive_shard)

        visible_l = prep_local.visible
        if update_densify_stats:
            radii_l = prep_local.radii.astype(jnp.float32)
            max_radii2d = jnp.where(
                visible_l, jnp.maximum(max_radii2d, radii_l), max_radii2d
            )
            accum = accum + jnp.where(
                visible_l, jnp.linalg.norm(bias_grad, axis=-1), 0.0
            )
            denom = denom + visible_l.astype(jnp.float32)

        metrics = {
            "loss": loss,
            "l1": l1,
            "psnr": losses.psnr(jnp.clip(full, 0.0, 1.0), gt),
            "num_entries": jax.lax.psum(total, axis),
            # Strip skew makes per-device totals uneven while the global
            # sum stays under budget; a device whose strip overflows its
            # capacity(P_full)//n share silently clips whole Gaussians out
            # of its tile lists (the reference never drops entries — its
            # arena resizes, rasterize_points.cu:28-36). Report the WORST
            # strip so the host can compare it against the per-device
            # budget and grow (trainer.step's overflow check).
            "max_strip_entries": jax.lax.pmax(total, axis),
            "num_visible": jax.lax.psum(visible_l.sum(), axis),
        }
        return (
            new_params, new_adam.m, new_adam.v, new_adam.step,
            max_radii2d, accum, denom, metrics,
        )

    Pg = PartitionSpec(axis)
    Pr = PartitionSpec()

    shard_fn = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(Pg, Pg, Pg, Pr, Pg, Pg, Pg, Pg, Pr, Pr, Pr, Pr),
        out_specs=(Pg, Pg, Pg, Pr, Pg, Pg, Pg, Pr),
        # the composite scan seeds its carry with unvarying zeros that
        # become device-varying after the first step; skip the VMA check.
        check_vma=False,
    )

    @jax.jit
    def step(state: TrainState, cam: CameraArrays, gt, bg, iteration):
        (new_params, new_m, new_v, new_step, max_radii2d, accum, denom, metrics) = shard_fn(
            state.params, state.adam.m, state.adam.v, state.adam.step,
            state.alive, state.max_radii2d, state.xyz_grad_accum, state.denom,
            cam, gt, bg, iteration,
        )
        new_state = TrainState(
            params=new_params,
            adam=AdamState(m=new_m, v=new_v, step=new_step),
            alive=state.alive,
            max_radii2d=max_radii2d,
            xyz_grad_accum=accum,
            denom=denom,
        )
        return new_state, metrics

    return step
