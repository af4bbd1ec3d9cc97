"""The jitted training step + host-side training state management.

Replaces the reference's torch loop body (train.py:75-180): one jitted
function renders, computes 0.8*L1 + 0.2*(1-SSIM), backprops, applies the
masked Adam update, and accumulates densification statistics — all on
device. The screenspace-points retain_grad trick becomes an explicit
zero `mean2d_bias` whose gradient (dL/dNDC-mean) feeds the stats, the
exact quantity the reference accumulates (gaussian_model.py:599-602 with
backward.cu:481-482 scaling).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.ops import losses
from gaussian_splatting_tpu.ops.rasterize import RasterizerConfig, rasterize
from gaussian_splatting_tpu.scene.cameras import CameraArrays
from gaussian_splatting_tpu.scene.gaussians import (
    GaussianParams,
    activate,
    capacity_bucket,
    repad,
)
from gaussian_splatting_tpu.scene.optim import AdamState, adam_update, expon_lr, init_adam


@dataclass(frozen=True)
class OptimizationConfig:
    """Defaults mirror arguments/__init__.py:89-108 verbatim."""

    iterations: int = 30_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002
    random_background: bool = False


class TrainState(NamedTuple):
    params: GaussianParams
    adam: AdamState
    alive: jnp.ndarray  # (N,) bool
    max_radii2d: jnp.ndarray  # (N,) f32
    xyz_grad_accum: jnp.ndarray  # (N,) f32
    denom: jnp.ndarray  # (N,) f32


def init_train_state(params: GaussianParams, alive) -> TrainState:
    N = params.xyz.shape[0]
    return TrainState(
        params=params,
        adam=init_adam(params),
        alive=jnp.asarray(alive),
        max_radii2d=jnp.zeros((N,), jnp.float32),
        xyz_grad_accum=jnp.zeros((N,), jnp.float32),
        denom=jnp.zeros((N,), jnp.float32),
    )


@partial(
    jax.jit,
    static_argnames=(
        "sh_degree",
        "active_sh_degree",
        "width",
        "height",
        "raster_cfg",
        "opt",
        "spatial_lr_scale",
        "update_densify_stats",
    ),
    donate_argnames=("state",),
)
def train_step(
    state: TrainState,
    cam: CameraArrays,
    gt_image: jnp.ndarray,  # (H, W, 3)
    bg: jnp.ndarray,  # (3,)
    iteration: jnp.ndarray,  # () int32, 1-based like the reference
    sh_degree: int,
    active_sh_degree: int,
    width: int,
    height: int,
    raster_cfg: RasterizerConfig,
    opt: OptimizationConfig,
    spatial_lr_scale: float,
    update_densify_stats: bool = True,
):
    """One optimization step. Returns (new_state, metrics dict)."""
    N = state.params.xyz.shape[0]
    bias0 = jnp.zeros((N, 2), jnp.float32)

    def loss_fn(params: GaussianParams, bias):
        acts = activate(params)
        img, aux = rasterize(
            acts.xyz,
            acts.scales,
            acts.quats,
            acts.opacities,
            acts.shs,
            active_sh_degree,
            cam,
            width,
            height,
            bg,
            raster_cfg,
            mean2d_bias=bias,
            alive=state.alive,
        )
        l1 = losses.l1_loss(img, gt_image)
        loss = (1.0 - opt.lambda_dssim) * l1 + opt.lambda_dssim * (
            1.0 - losses.ssim(img, gt_image)
        )
        return loss, (aux, img, l1)

    (loss, (aux, img, l1)), (grads, bias_grad) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(state.params, bias0)

    # --- per-group learning rates (gaussian_model.py:243-257) ---
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

    new_params, new_adam = adam_update(
        state.params, grads, state.adam, lrs, state.alive
    )

    # --- densification statistics (train.py:153-159) ---
    if update_densify_stats:
        visible = aux["visible"]
        radii = aux["radii"].astype(jnp.float32)
        max_radii2d = jnp.where(
            visible, jnp.maximum(state.max_radii2d, radii), state.max_radii2d
        )
        grad_norm = jnp.linalg.norm(bias_grad, axis=-1)
        xyz_grad_accum = state.xyz_grad_accum + jnp.where(visible, grad_norm, 0.0)
        denom = state.denom + visible.astype(jnp.float32)
    else:
        max_radii2d = state.max_radii2d
        xyz_grad_accum = state.xyz_grad_accum
        denom = state.denom

    new_state = TrainState(
        params=new_params,
        adam=new_adam,
        alive=state.alive,
        max_radii2d=max_radii2d,
        xyz_grad_accum=xyz_grad_accum,
        denom=denom,
    )
    metrics = {
        "loss": loss,
        "l1": l1,
        "psnr": losses.psnr(jnp.clip(img, 0.0, 1.0), gt_image),
        "num_entries": aux["num_entries"],
        "num_visible": aux["visible"].sum(),
    }
    return new_state, metrics


@partial(
    jax.jit,
    static_argnames=(
        "sh_degree", "active_sh_degree", "width", "height", "raster_cfg",
        "shs_python", "rot_scale_python",
    ),
)
def eval_render(
    params: GaussianParams,
    alive,
    cam: CameraArrays,
    bg: jnp.ndarray,
    sh_degree: int,
    active_sh_degree: int,
    width: int,
    height: int,
    raster_cfg: RasterizerConfig,
    scale_modifier: float = 1.0,
    shs_python: bool = False,
    rot_scale_python: bool = False,
):
    """Render from raw params (viewer + eval path). `scale_modifier` is the
    SIBR slider the reference threads through render() (train.py:84,
    gaussian_renderer/__init__.py:18,60); it is a traced scalar so slider
    motion does not recompile.

    `shs_python` / `rot_scale_python` are the SIBR debug toggles the
    reference routes into pipe.convert_SHs_python / compute_cov3D_python
    (train.py:81-84): colors / 3D covariances are precomputed here in
    plain jnp and fed through the rasterizer's precomp escape hatches,
    bypassing the fused preprocess equivalents. Images match the fused
    path (same math, same rounding class)."""
    from gaussian_splatting_tpu.ops import gsmath

    acts = activate(params)
    colors_precomp = None
    cov3d_precomp = None
    shs = acts.shs
    if shs_python:
        colors_precomp = gsmath.sh_to_rgb(
            active_sh_degree, acts.shs, acts.xyz, cam.campos
        )
        shs = None
    if rot_scale_python:
        # scale_modifier folds into the python-side covariance, exactly as
        # the reference's build_covariance_from_scaling_rotation does
        # (scene/gaussian_model.py:38-44).
        cov3d_precomp = gsmath.build_cov3d(acts.scales, acts.quats, scale_modifier)
    img, aux = rasterize(
        acts.xyz, acts.scales, acts.quats, acts.opacities, shs,
        active_sh_degree, cam, width, height, bg, raster_cfg, alive=alive,
        scale_modifier=scale_modifier,
        colors_precomp=colors_precomp, cov3d_precomp=cov3d_precomp,
    )
    return img, aux
