"""LPIPS perceptual metric (VGG16 backbone) in pure JAX.

Reimplementation of the reference's vendored lpipsPyTorch/ (modules/
lpips.py, networks.py): VGG16 features at the 5 standard stages, unit-
normalized channel-wise, squared differences projected by the LPIPS v0.1
linear heads, spatially averaged and summed over stages.

The reference downloads torchvision VGG16 weights + richzhang LPIPS heads
from the internet at runtime (lpipsPyTorch/modules/utils.py:11-20). This
environment has no egress, so weights must be provided as an .npz via
$GS_TPU_LPIPS_WEIGHTS (keys: conv{i}_w, conv{i}_b for the 13 VGG convs in
order, lin{j}_w for the 5 heads). `lpips_available()` reports whether the
metric can run; metrics fall back to SSIM/PSNR-only otherwise.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv layout: (out_channels, num convs) per stage before each pool.
_VGG_STAGES = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
# z_score constants of the reference's BaseNet (lpipsPyTorch/modules/
# networks.py:41-44) — the LPIPS v0.1 scaling layer, applied directly to
# [0,1] inputs exactly as the vendored code does (NOT ImageNet mean/std).
_NORM_MEAN = np.array([-0.030, -0.088, -0.188], np.float32)
_NORM_STD = np.array([0.458, 0.448, 0.450], np.float32)


@functools.lru_cache(maxsize=1)
def _load_weights() -> Optional[dict]:
    path = os.environ.get("GS_TPU_LPIPS_WEIGHTS", "")
    if not path or not os.path.exists(path):
        return None
    data = np.load(path)
    return {k: jnp.asarray(data[k]) for k in data.files}


def lpips_available() -> bool:
    return _load_weights() is not None


def _conv(x, w, b):
    """x (1, C, H, W), w (O, I, 3, 3) torch layout."""
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.DEFAULT,
    )
    return out + b.reshape(1, -1, 1, 1)


def _vgg_features(x, weights):
    """x (1, 3, H, W) normalized. Returns the 5 stage activations."""
    feats = []
    ci = 0
    for stage, (_, n_convs) in enumerate(_VGG_STAGES):
        for _ in range(n_convs):
            x = jax.nn.relu(_conv(x, weights[f"conv{ci}_w"], weights[f"conv{ci}_b"]))
            ci += 1
        feats.append(x)
        if stage < len(_VGG_STAGES) - 1:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
            )
    return feats


def lpips_vgg(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """img (H, W, 3) in [0, 1]. Returns scalar LPIPS distance."""
    weights = _load_weights()
    if weights is None:
        raise RuntimeError(
            "LPIPS weights not available; set GS_TPU_LPIPS_WEIGHTS to an .npz"
        )

    def prep(img):
        x = (img - _NORM_MEAN) / _NORM_STD
        return x.transpose(2, 0, 1)[None]

    f1 = _vgg_features(prep(img1), weights)
    f2 = _vgg_features(prep(img2), weights)
    total = 0.0
    for j, (a, b) in enumerate(zip(f1, f2)):
        # normalize_activation (modules/utils.py:6-8): eps OUTSIDE the sqrt
        a = a / (jnp.sqrt(jnp.sum(a * a, axis=1, keepdims=True)) + 1e-10)
        b = b / (jnp.sqrt(jnp.sum(b * b, axis=1, keepdims=True)) + 1e-10)
        d = (a - b) ** 2
        w = weights[f"lin{j}_w"].reshape(1, -1, 1, 1)
        total = total + jnp.mean(jnp.sum(d * w, axis=1))
    return total


def export_weights_from_torch(out_path: str):
    """One-time exporter: torchvision VGG16 + richzhang LPIPS heads -> .npz.

    Runs only where torchvision/weights are available (not in this
    sandbox); kept so users can produce the .npz offline.
    """
    import torchvision  # noqa: F401  (not available in this image)
    import torch

    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1").features
    convs = [m for m in vgg if isinstance(m, torch.nn.Conv2d)]
    out = {}
    for i, c in enumerate(convs):
        out[f"conv{i}_w"] = c.weight.detach().numpy()
        out[f"conv{i}_b"] = c.bias.detach().numpy()
    url = "https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/master/lpips/weights/v0.1/vgg.pth"
    heads = torch.hub.load_state_dict_from_url(url, progress=False, map_location="cpu")
    for j in range(5):
        out[f"lin{j}_w"] = heads[f"lin{j}.model.1.weight"].squeeze().numpy()
    np.savez(out_path, **out)
