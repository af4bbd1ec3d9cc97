"""Masked Adam with per-parameter-group learning rates + LR schedules.

Replicates the reference's optimizer exactly (gaussian_model.py:243-257):
Adam(eps=1e-15), six groups with LRs
    xyz: position_lr_init * spatial_lr_scale, log-lerp decayed per step
    f_dc: feature_lr            f_rest: feature_lr / 20
    opacity: opacity_lr         scaling: scaling_lr      rotation: rotation_lr
and the Plenoxels-style exponential log-lerp schedule
(utils/general_utils.py:29-76).

Torch-Adam semantics: step = lr * m_hat / (sqrt(v_hat) + eps) with bias
correction; a single scalar step count (the reference keeps per-tensor
steps that are never reset, which is the same thing). Dead (padding) rows
are frozen via the alive mask.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.scene.gaussians import GaussianParams


class AdamState(NamedTuple):
    m: GaussianParams
    v: GaussianParams
    step: jnp.ndarray  # () int32


def init_adam(params: GaussianParams) -> AdamState:
    # Two *distinct* zero trees: m and v must not alias (the train step
    # donates the whole state, and XLA rejects donating a buffer twice).
    m = jax.tree.map(jnp.zeros_like, params)
    v = jax.tree.map(jnp.zeros_like, params)
    return AdamState(m=m, v=v, step=jnp.zeros((), jnp.int32))


def expon_lr(
    step,
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1000000,
):
    """Log-lerp LR schedule (general_utils.py:29-76). `step` may be traced."""
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(jnp.asarray(step, jnp.float32))
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
        )
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)
    return jnp.where(step < 0, 0.0, delay_rate * log_lerp)


def adam_update(
    params: GaussianParams,
    grads: GaussianParams,
    state: AdamState,
    lrs: GaussianParams,  # per-group scalar LRs (same pytree structure)
    alive: jnp.ndarray,  # (N,) bool
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-15,
) -> tuple[GaussianParams, AdamState]:
    step = state.step + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - beta1**t
    bc2 = 1.0 - beta2**t

    def upd(p, g, m, v, lr):
        mask = alive.reshape((-1,) + (1,) * (p.ndim - 1))
        g = jnp.where(mask, g, 0.0)
        m_new = beta1 * m + (1 - beta1) * g
        v_new = beta2 * v + (1 - beta2) * g * g
        step_size = lr * (m_new / bc1) / (jnp.sqrt(v_new / bc2) + eps)
        p_new = jnp.where(mask, p - step_size, p)
        m_new = jnp.where(mask, m_new, m)
        v_new = jnp.where(mask, v_new, v)
        return p_new, m_new, v_new

    out = jax.tree.map(upd, params, grads, state.m, state.v, lrs)
    new_params = GaussianParams(*[o[0] for o in out])
    new_m = GaussianParams(*[o[1] for o in out])
    new_v = GaussianParams(*[o[2] for o in out])
    return new_params, AdamState(m=new_m, v=new_v, step=step)
