"""Loss-function oracle tests: the separable band-matmul Gaussian conv
and SSIM against direct numpy implementations of the reference formulas
(utils/loss_utils.py:17-63, utils/image_utils.py:14-18)."""

import numpy as np
import jax.numpy as jnp

from gaussian_splatting_tpu.ops import losses


def _np_gaussian_window(k, sigma):
    xs = np.arange(k) - k // 2
    g = np.exp(-(xs**2) / (2.0 * sigma**2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float64)


def _np_conv_same(img, window):
    """Direct zero-padded 'same' depthwise 2-D convolution, float64."""
    k = window.shape[0]
    r = k // 2
    H, W, C = img.shape
    pad = np.zeros((H + 2 * r, W + 2 * r, C), np.float64)
    pad[r:-r, r:-r] = img
    out = np.zeros_like(img, dtype=np.float64)
    for dy in range(k):
        for dx in range(k):
            out += window[dy, dx] * pad[dy:dy + H, dx:dx + W]
    return out


def test_band_matmul_conv_matches_direct():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (40, 56, 3)).astype(np.float32)
    win = _np_gaussian_window(11, 1.5)
    want = _np_conv_same(img.astype(np.float64), win)
    got = np.asarray(losses._depthwise_conv_same(jnp.asarray(img), 11, 1.5))
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_ssim_identical_images():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (48, 64, 3)), jnp.float32)
    assert abs(float(losses.ssim(img, img)) - 1.0) < 1e-5


def test_ssim_matches_reference_formula():
    rng = np.random.default_rng(2)
    a = rng.uniform(0, 1, (40, 48, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.08, a.shape), 0, 1).astype(np.float32)
    win = _np_gaussian_window(11, 1.5)
    conv = lambda x: _np_conv_same(x.astype(np.float64), win)
    mu1, mu2 = conv(a), conv(b)
    s1 = conv(a * a) - mu1 * mu1
    s2 = conv(b * b) - mu2 * mu2
    s12 = conv(a * b) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    want = (
        ((2 * mu1 * mu2 + c1) * (2 * s12 + c2))
        / ((mu1 * mu1 + mu2 * mu2 + c1) * (s1 + s2 + c2))
    ).mean()
    got = float(losses.ssim(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - want) < 1e-5, (got, want)


def test_psnr_l1():
    a = jnp.zeros((8, 8, 3))
    b = jnp.full((8, 8, 3), 0.1)
    assert abs(float(losses.l1_loss(a, b)) - 0.1) < 1e-7
    assert abs(float(losses.psnr(a, b)) - 20.0) < 1e-4
