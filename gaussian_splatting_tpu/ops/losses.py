"""Training losses: L1, L2, SSIM (and PSNR/MSE metrics).

Parity with the reference (utils/loss_utils.py:17-63, utils/image_utils.py):
SSIM uses an 11x11 Gaussian window, sigma=1.5, zero ('same') padding,
applied as a depthwise convolution, C1=0.01^2, C2=0.03^2.

Images are (..., H, W, C) float32 in [0, 1] (channel-last, the natural JAX
layout; the reference is channel-first torch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(pred, gt):
    return jnp.abs(pred - gt).mean()


def l2_loss(pred, gt):
    return ((pred - gt) ** 2).mean()


def mse(pred, gt):
    """Per-image MSE over (H, W, C) or batched (utils/image_utils.py:14)."""
    return ((pred - gt) ** 2).reshape(pred.shape[0], -1).mean(axis=1) if pred.ndim == 4 else ((pred - gt) ** 2).mean()


def psnr(pred, gt):
    m = ((pred - gt) ** 2).mean()
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(m))


@functools.lru_cache(maxsize=None)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs**2) / (2.0 * sigma**2))
    g = (g / g.sum()).astype(np.float32)
    return np.outer(g, g)


def _depthwise_conv_same(img, window):
    """img (H, W, C), window (k, k) -> same-padded depthwise conv."""
    C = img.shape[-1]
    k = window.shape[0]
    lhs = img.transpose(2, 0, 1)[None]  # (1, C, H, W)
    rhs = jnp.broadcast_to(jnp.asarray(window), (C, 1, k, k))
    out = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1, 1),
        padding=[(k // 2, k // 2), (k // 2, k // 2)],
        feature_group_count=C,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[0].transpose(1, 2, 0)


def ssim(img1, img2, window_size: int = 11, sigma: float = 1.5):
    """Mean SSIM matching utils/loss_utils.py:33-63 (zero-padded window)."""
    window = _gaussian_window(window_size, sigma)
    conv = lambda x: _depthwise_conv_same(x, window)

    mu1 = conv(img1)
    mu2 = conv(img2)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = conv(img1 * img1) - mu1_sq
    sigma2_sq = conv(img2 * img2) - mu2_sq
    sigma12 = conv(img1 * img2) - mu1_mu2

    c1 = 0.01**2
    c2 = 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return ssim_map.mean()


def photometric_loss(pred, gt, lambda_dssim: float = 0.2):
    """0.8 * L1 + 0.2 * (1 - SSIM) (train.py:126-127)."""
    return (1.0 - lambda_dssim) * l1_loss(pred, gt) + lambda_dssim * (1.0 - ssim(pred, gt))
