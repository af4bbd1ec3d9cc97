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
def _gaussian_1d(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _band_matrix(n: int, window_size: int, sigma: float) -> np.ndarray:
    """(n, n) banded matrix B with B[u, v] = g[v - u + r]: `x @ B` is the
    zero-padded 'same' 1-D Gaussian convolution along x's last axis."""
    g = _gaussian_1d(window_size, sigma)
    r = window_size // 2
    m = np.zeros((n, n), np.float32)
    for i, w in enumerate(g):
        off = i - r
        u = np.arange(max(0, -off), min(n, n - off))
        m[u, u + off] += w
    return m


def _depthwise_conv_same(img, window_size: int, sigma: float):
    """img (H, W, C) -> same-padded depthwise 2-D Gaussian conv.

    The reference's 11x11 window (loss_utils.py:23-31) is the outer
    product of a 1-D Gaussian, so the conv separates into a row pass and
    a column pass. Each pass runs as a dense banded MATMUL on the MXU —
    175x more MACs than an 11-tap stencil but ~60x faster on TPU than
    the depthwise `conv_general_dilated` lowering (which costs ~21 ms
    per conv at 1080p in a T(1,128) layout)."""
    H, W, C = img.shape[-3], img.shape[-2], img.shape[-1]
    bw = jnp.asarray(_band_matrix(W, window_size, sigma))
    bh = jnp.asarray(_band_matrix(H, window_size, sigma))
    # HIGH (bf16_3x) halves the MXU passes of the 10 forward einsums and
    # their AD transposes vs HIGHEST; SSIM operands live in [0, 1] so the
    # ~2^-21 relative error moves the loss ~1e-6 — far below the view-to-
    # view loss noise training sees. GS_TPU_SSIM_PREC=hi restores the
    # f32-exact form (CPU tests are unaffected either way: CPU einsums
    # ignore precision and stay exact).
    import os

    prec = {
        "high": jax.lax.Precision.HIGH, "hi": jax.lax.Precision.HIGHEST
    }[os.environ.get("GS_TPU_SSIM_PREC", "high")]
    x = jnp.einsum("...hwc,wv->...hvc", img, bw, precision=prec)
    x = jnp.einsum("...hwc,hu->...uwc", x, bh, precision=prec)
    return x


def ssim(img1, img2, window_size: int = 11, sigma: float = 1.5):
    """Mean SSIM matching utils/loss_utils.py:33-63 (zero-padded window)."""
    conv = lambda x: _depthwise_conv_same(x, window_size, sigma)

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
