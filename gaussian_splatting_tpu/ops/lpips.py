"""LPIPS perceptual metric (vgg / alex / squeeze backbones) in pure JAX.

Reimplementation of the reference's vendored lpipsPyTorch/ (modules/
lpips.py, networks.py): backbone features at the reference's capture
points, unit-normalized channel-wise, squared differences projected by
the LPIPS v0.1 linear heads, spatially averaged and summed over stages.
All three reference backbones are implemented (networks.py:66-98):
VGG16 (5 stages, what metrics.py uses), AlexNet (5 stages), and
SqueezeNet1.1 (7 stages, Fire modules, ceil-mode pooling).

The reference downloads torchvision weights + richzhang LPIPS heads from
the internet at runtime (lpipsPyTorch/modules/utils.py:11-20). This
environment has no egress, so weights must be provided as an .npz via
$GS_TPU_LPIPS_WEIGHTS. Keys: vgg `conv{i}_w/b` (13 convs) + `lin{j}_w`
(5 heads); alex `alex_conv{i}_w/b` (5) + `alex_lin{j}_w` (5); squeeze
`sq_conv0_w/b`, `sq{f}_s_w/b`/`sq{f}_e1_w/b`/`sq{f}_e3_w/b` (8 Fires) +
`sq_lin{j}_w` (7). `lpips_available(net)` reports whether a backbone can
run; metrics fall back to SSIM/PSNR-only otherwise.
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


_NET_KEY0 = {"vgg": "conv0_w", "alex": "alex_conv0_w", "squeeze": "sq_conv0_w"}


def lpips_available(net_type: str = "vgg") -> bool:
    w = _load_weights()
    return w is not None and _NET_KEY0[net_type] in w


def _conv(x, w, b, stride: int = 1, pad: int = 1):
    """x (1, C, H, W), w (O, I, kh, kw) torch layout."""
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.DEFAULT,
    )
    return out + b.reshape(1, -1, 1, 1)


def _maxpool(x, k: int = 2, stride: int = 2, ceil_mode: bool = False):
    """Torch-semantics MaxPool2d(k, stride). ceil_mode pads the bottom/
    right with -inf so partial windows (which always contain at least one
    real element, matching torch's start-within-input rule) are kept."""
    pads = [(0, 0), (0, 0)]
    for h in x.shape[2:]:
        if ceil_mode:
            out = -((h - k) // -stride) + 1
            pads.append((0, max((out - 1) * stride + k - h, 0)))
        else:
            pads.append((0, 0))
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, k, k), (1, 1, stride, stride), pads
    )


def _vgg_features(x, weights):
    """x (1, 3, H, W) normalized. Returns the 5 stage activations
    (networks.py:88-98, torchvision vgg16.features indices 3/8/15/22/29)."""
    feats = []
    ci = 0
    for stage, (_, n_convs) in enumerate(_VGG_STAGES):
        for _ in range(n_convs):
            x = jax.nn.relu(_conv(x, weights[f"conv{ci}_w"], weights[f"conv{ci}_b"]))
            ci += 1
        feats.append(x)
        if stage < len(_VGG_STAGES) - 1:
            x = _maxpool(x, 2, 2)
    return feats


# AlexNet.features conv params (out_ch, kernel, stride, pad); captures
# after every ReLU, pools after captures 0 and 1 (networks.py:77-85,
# torchvision alexnet.features with target_layers [2, 5, 8, 10, 12]).
_ALEX_CONVS = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
               (256, 3, 1, 1), (256, 3, 1, 1)]


def _alex_features(x, weights):
    feats = []
    for i, (_, _, s, p) in enumerate(_ALEX_CONVS):
        x = jax.nn.relu(
            _conv(x, weights[f"alex_conv{i}_w"], weights[f"alex_conv{i}_b"],
                  stride=s, pad=p)
        )
        feats.append(x)
        if i < 2:
            x = _maxpool(x, 3, 2)
    return feats


def _fire(x, weights, f: int):
    """SqueezeNet Fire module: 1x1 squeeze -> relu -> (1x1 | 3x3 p1)
    expand -> relu -> channel concat (torchvision squeezenet1_1)."""
    s = jax.nn.relu(_conv(x, weights[f"sq{f}_s_w"], weights[f"sq{f}_s_b"], pad=0))
    e1 = jax.nn.relu(_conv(s, weights[f"sq{f}_e1_w"], weights[f"sq{f}_e1_b"], pad=0))
    e3 = jax.nn.relu(_conv(s, weights[f"sq{f}_e3_w"], weights[f"sq{f}_e3_b"], pad=1))
    return jnp.concatenate([e1, e3], axis=1)


def _squeeze_features(x, weights):
    """SqueezeNet1.1 captures at target_layers [2, 5, 8, 10, 11, 12, 13]
    (networks.py:66-74): after the stem ReLU, then after Fires 1, 3, 4,
    5, 6, 7; 3x3/2 ceil-mode maxpools sit after captures 0, 1, 2."""
    feats = []
    x = jax.nn.relu(_conv(x, weights["sq_conv0_w"], weights["sq_conv0_b"],
                          stride=2, pad=0))
    feats.append(x)
    x = _maxpool(x, 3, 2, ceil_mode=True)
    x = _fire(x, weights, 0)
    x = _fire(x, weights, 1)
    feats.append(x)
    x = _maxpool(x, 3, 2, ceil_mode=True)
    x = _fire(x, weights, 2)
    x = _fire(x, weights, 3)
    feats.append(x)
    x = _maxpool(x, 3, 2, ceil_mode=True)
    for f in (4, 5, 6, 7):
        x = _fire(x, weights, f)
        feats.append(x)
    return feats


_NETS = {
    "vgg": (_vgg_features, "lin{}_w", 5),
    "alex": (_alex_features, "alex_lin{}_w", 5),
    "squeeze": (_squeeze_features, "sq_lin{}_w", 7),
}


def lpips(img1: jnp.ndarray, img2: jnp.ndarray, net_type: str = "vgg") -> jnp.ndarray:
    """img (H, W, 3) in [0, 1]. Returns the scalar LPIPS v0.1 distance
    under the chosen backbone ('vgg' | 'alex' | 'squeeze'), matching
    lpipsPyTorch/modules/lpips.py:30-36."""
    weights = _load_weights()
    if weights is None or _NET_KEY0[net_type] not in weights:
        raise RuntimeError(
            f"LPIPS '{net_type}' weights not available; set "
            "GS_TPU_LPIPS_WEIGHTS to an .npz with that backbone's keys"
        )
    features, lin_fmt, n_stages = _NETS[net_type]

    def prep(img):
        x = (img - _NORM_MEAN) / _NORM_STD
        return x.transpose(2, 0, 1)[None]

    f1 = features(prep(img1), weights)
    f2 = features(prep(img2), weights)
    assert len(f1) == n_stages
    total = 0.0
    for j, (a, b) in enumerate(zip(f1, f2)):
        # normalize_activation (modules/utils.py:6-8): eps OUTSIDE the sqrt
        a = a / (jnp.sqrt(jnp.sum(a * a, axis=1, keepdims=True)) + 1e-10)
        b = b / (jnp.sqrt(jnp.sum(b * b, axis=1, keepdims=True)) + 1e-10)
        d = (a - b) ** 2
        w = weights[lin_fmt.format(j)].reshape(1, -1, 1, 1)
        total = total + jnp.mean(jnp.sum(d * w, axis=1))
    return total


def lpips_vgg(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """img (H, W, 3) in [0, 1]. Scalar LPIPS distance, VGG16 backbone
    (the backbone metrics.py uses, reference metrics.py:74)."""
    return lpips(img1, img2, "vgg")


def export_weights_from_torch(out_path: str):
    """One-time exporter: torchvision backbones + richzhang LPIPS heads
    -> one .npz holding all three backbones.

    Runs only where torchvision/weights are available (not in this
    sandbox); kept so users can produce the .npz offline.
    """
    import torchvision  # noqa: F401  (not available in this image)
    import torch

    def heads(net):
        url = (
            "https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/"
            f"master/lpips/weights/v0.1/{net}.pth"
        )
        return torch.hub.load_state_dict_from_url(
            url, progress=False, map_location="cpu"
        )

    out = {}
    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1").features
    for i, c in enumerate(m for m in vgg if isinstance(m, torch.nn.Conv2d)):
        out[f"conv{i}_w"] = c.weight.detach().numpy()
        out[f"conv{i}_b"] = c.bias.detach().numpy()
    for j in range(5):
        out[f"lin{j}_w"] = heads("vgg")[f"lin{j}.model.1.weight"].squeeze().numpy()

    alex = torchvision.models.alexnet(weights="IMAGENET1K_V1").features
    for i, c in enumerate(m for m in alex if isinstance(m, torch.nn.Conv2d)):
        out[f"alex_conv{i}_w"] = c.weight.detach().numpy()
        out[f"alex_conv{i}_b"] = c.bias.detach().numpy()
    for j in range(5):
        out[f"alex_lin{j}_w"] = heads("alex")[f"lin{j}.model.1.weight"].squeeze().numpy()

    sq = torchvision.models.squeezenet1_1(weights="IMAGENET1K_V1").features
    out["sq_conv0_w"] = sq[0].weight.detach().numpy()
    out["sq_conv0_b"] = sq[0].bias.detach().numpy()
    fires = [m for m in sq if m.__class__.__name__ == "Fire"]
    for f, fire in enumerate(fires):
        out[f"sq{f}_s_w"] = fire.squeeze.weight.detach().numpy()
        out[f"sq{f}_s_b"] = fire.squeeze.bias.detach().numpy()
        out[f"sq{f}_e1_w"] = fire.expand1x1.weight.detach().numpy()
        out[f"sq{f}_e1_b"] = fire.expand1x1.bias.detach().numpy()
        out[f"sq{f}_e3_w"] = fire.expand3x3.weight.detach().numpy()
        out[f"sq{f}_e3_b"] = fire.expand3x3.bias.detach().numpy()
    for j in range(7):
        out[f"sq_lin{j}_w"] = heads("squeeze")[f"lin{j}.model.1.weight"].squeeze().numpy()

    np.savez(out_path, **out)
