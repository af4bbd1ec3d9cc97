"""LPIPS-vgg math pinned against an independent torch oracle.

The reference runs lpipsPyTorch (modules/lpips.py, networks.py:88-96,
utils.py:6-8) with torchvision VGG16 weights. No weights exist in this
sandbox, so these tests generate a RANDOM weight set and check that
ops/lpips.py computes the same function a faithful torch transcription of
the reference modules computes — stage placement (ReLU outputs at
torchvision feature indices 3/8/15/22/29), maxpool positions, the v0.1
z_score constants, unit-normalization eps placement, 1x1 lin heads,
mean(H,W) then sum over stages. A wrong stride/normalization/stage cut
fails here regardless of which weights are later plugged in.
"""

import os

import numpy as np
import pytest
import torch
import torch.nn as nn

from gaussian_splatting_tpu.ops import lpips as gs_lpips

_VGG_STAGES = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]


def make_random_weights(rng):
    """Random VGG16-shaped conv stack + positive lin heads (npz dict)."""
    out = {}
    in_c = 3
    ci = 0
    for out_c, n_convs in _VGG_STAGES:
        for _ in range(n_convs):
            fan_in = in_c * 9
            out[f"conv{ci}_w"] = (
                rng.normal(0, np.sqrt(2.0 / fan_in), (out_c, in_c, 3, 3))
            ).astype(np.float32)
            out[f"conv{ci}_b"] = rng.normal(0, 0.02, out_c).astype(np.float32)
            in_c = out_c
            ci += 1
    for j, (out_c, _) in enumerate(_VGG_STAGES):
        out[f"lin{j}_w"] = rng.uniform(0.0, 0.2, out_c).astype(np.float32)
    return out


def torch_oracle_lpips(img1, img2, weights):
    """Faithful torch transcription of the reference LPIPS modules."""
    mean = torch.tensor([-0.030, -0.088, -0.188])[None, :, None, None]
    std = torch.tensor([0.458, 0.448, 0.450])[None, :, None, None]

    def features(img):
        x = torch.from_numpy(img.transpose(2, 0, 1)[None].copy())
        x = (x - mean) / std  # BaseNet.z_score (networks.py:50-51)
        feats = []
        ci = 0
        for stage, (out_c, n_convs) in enumerate(_VGG_STAGES):
            for _ in range(n_convs):
                w = torch.from_numpy(weights[f"conv{ci}_w"])
                b = torch.from_numpy(weights[f"conv{ci}_b"])
                x = torch.relu(nn.functional.conv2d(x, w, b, 1, 1))
                ci += 1
            # target_layers = relu outputs (networks.py:95 with the
            # 1-based enumerate in BaseNet.forward)
            norm = torch.sqrt((x * x).sum(1, keepdim=True))
            feats.append(x / (norm + 1e-10))  # utils.py:6-8
            if stage < len(_VGG_STAGES) - 1:
                x = nn.functional.max_pool2d(x, 2, 2)
        return feats

    f1, f2 = features(img1), features(img2)
    total = torch.zeros(())
    for j, (a, b) in enumerate(zip(f1, f2)):
        d = (a - b) ** 2
        lin = torch.from_numpy(weights[f"lin{j}_w"]).reshape(1, -1, 1, 1)
        total = total + (d * lin).sum(1, keepdim=True).mean((2, 3)).squeeze()
    return float(total)


@pytest.fixture()
def lpips_env(tmp_path, monkeypatch):
    rng = np.random.default_rng(11)
    weights = make_random_weights(rng)
    path = str(tmp_path / "lpips_rand.npz")
    np.savez(path, **weights)
    monkeypatch.setenv("GS_TPU_LPIPS_WEIGHTS", path)
    gs_lpips._load_weights.cache_clear()
    yield weights
    gs_lpips._load_weights.cache_clear()


def test_lpips_matches_torch_oracle(lpips_env):
    rng = np.random.default_rng(5)
    img1 = rng.uniform(size=(64, 96, 3)).astype(np.float32)
    img2 = np.clip(img1 + rng.normal(0, 0.1, img1.shape), 0, 1).astype(np.float32)

    assert gs_lpips.lpips_available()
    got = float(gs_lpips.lpips_vgg(img1, img2))
    want = torch_oracle_lpips(img1, img2, lpips_env)
    assert got == pytest.approx(want, rel=2e-4, abs=1e-6)
    # self-distance is ~0, different images are not
    assert float(gs_lpips.lpips_vgg(img1, img1)) == pytest.approx(0.0, abs=1e-6)
    assert got > 1e-5


def test_lpips_unavailable_without_weights(monkeypatch):
    monkeypatch.delenv("GS_TPU_LPIPS_WEIGHTS", raising=False)
    gs_lpips._load_weights.cache_clear()
    assert not gs_lpips.lpips_available()
    gs_lpips._load_weights.cache_clear()


def test_metrics_cli_reports_lpips(tmp_path, lpips_env):
    """End-to-end: the metrics CLI must pick up the weights and write real
    LPIPS numbers into results.json/per_view.json."""
    import imageio

    from gaussian_splatting_tpu.cli import metrics as metrics_cli

    model = tmp_path / "model"
    rdir = model / "test" / "ours_7000" / "renders"
    gdir = model / "test" / "ours_7000" / "gt"
    rdir.mkdir(parents=True)
    gdir.mkdir(parents=True)
    rng = np.random.default_rng(9)
    for i in range(2):
        a = (rng.uniform(size=(48, 64, 3)) * 255).astype(np.uint8)
        b = np.clip(a + rng.normal(0, 12, a.shape), 0, 255).astype(np.uint8)
        imageio.imwrite(str(rdir / f"{i:05d}.png"), a)
        imageio.imwrite(str(gdir / f"{i:05d}.png"), b)

    metrics_cli.evaluate([str(model)])

    import json
    res = json.load(open(model / "results.json"))
    lp = res["ours_7000"]["LPIPS"]
    assert lp is not None and np.isfinite(lp) and lp > 0
    pv = json.load(open(model / "per_view.json"))
    assert len(pv["ours_7000"]["LPIPS"]) == 2


# --- alex / squeeze backbones (networks.py:66-85) -------------------------

_ALEX_CONVS = [(3, 64, 11, 4, 2), (64, 192, 5, 1, 2), (192, 384, 3, 1, 1),
               (384, 256, 3, 1, 1), (256, 256, 3, 1, 1)]
_SQ_FIRES = [(64, 16, 64), (128, 16, 64), (128, 32, 128), (256, 32, 128),
             (256, 48, 192), (384, 48, 192), (384, 64, 256), (512, 64, 256)]
_SQ_CH = [64, 128, 256, 384, 384, 512, 512]


def make_random_alex_weights(rng):
    out = {}
    for i, (ic, oc, k, _, _) in enumerate(_ALEX_CONVS):
        out[f"alex_conv{i}_w"] = rng.normal(
            0, np.sqrt(2.0 / (ic * k * k)), (oc, ic, k, k)
        ).astype(np.float32)
        out[f"alex_conv{i}_b"] = rng.normal(0, 0.02, oc).astype(np.float32)
    for j, (_, oc, *_rest) in enumerate(_ALEX_CONVS):
        out[f"alex_lin{j}_w"] = rng.uniform(0.0, 0.2, oc).astype(np.float32)
    return out


def make_random_squeeze_weights(rng):
    def conv(ic, oc, k):
        return (
            rng.normal(0, np.sqrt(2.0 / (ic * k * k)), (oc, ic, k, k)).astype(np.float32),
            rng.normal(0, 0.02, oc).astype(np.float32),
        )

    out = {}
    out["sq_conv0_w"], out["sq_conv0_b"] = conv(3, 64, 3)
    for f, (ic, s, e) in enumerate(_SQ_FIRES):
        out[f"sq{f}_s_w"], out[f"sq{f}_s_b"] = conv(ic, s, 1)
        out[f"sq{f}_e1_w"], out[f"sq{f}_e1_b"] = conv(s, e, 1)
        out[f"sq{f}_e3_w"], out[f"sq{f}_e3_b"] = conv(s, e, 3)
    for j, c in enumerate(_SQ_CH):
        out[f"sq_lin{j}_w"] = rng.uniform(0.0, 0.2, c).astype(np.float32)
    return out


def _torch_norm(x):
    return x / (torch.sqrt((x * x).sum(1, keepdim=True)) + 1e-10)


def _torch_prep(img):
    mean = torch.tensor([-0.030, -0.088, -0.188])[None, :, None, None]
    std = torch.tensor([0.458, 0.448, 0.450])[None, :, None, None]
    x = torch.from_numpy(img.transpose(2, 0, 1)[None].copy())
    return (x - mean) / std


def _torch_head_sum(f1, f2, weights, fmt):
    total = torch.zeros(())
    for j, (a, b) in enumerate(zip(f1, f2)):
        d = (a - b) ** 2
        lin = torch.from_numpy(weights[fmt.format(j)]).reshape(1, -1, 1, 1)
        total = total + (d * lin).sum(1, keepdim=True).mean((2, 3)).squeeze()
    return float(total)


def torch_oracle_alex(img1, img2, weights):
    """AlexNet.features transcription: captures after each ReLU
    (target_layers [2, 5, 8, 10, 12]), 3x3/2 floor-mode pools after the
    first two captures."""

    def features(img):
        x = _torch_prep(img)
        feats = []
        for i, (_, _, _, s, p) in enumerate(_ALEX_CONVS):
            w = torch.from_numpy(weights[f"alex_conv{i}_w"])
            b = torch.from_numpy(weights[f"alex_conv{i}_b"])
            x = torch.relu(nn.functional.conv2d(x, w, b, s, p))
            feats.append(_torch_norm(x))
            if i < 2:
                x = nn.functional.max_pool2d(x, 3, 2)
        return feats

    return _torch_head_sum(features(img1), features(img2), weights, "alex_lin{}_w")


def torch_oracle_squeeze(img1, img2, weights):
    """SqueezeNet1.1 transcription: stem conv 3x3/2 + ReLU, Fire modules,
    ceil-mode 3x3/2 pools; captures at target_layers [2,5,8,10,11,12,13]."""

    def fire(x, f):
        s = torch.relu(nn.functional.conv2d(
            x, torch.from_numpy(weights[f"sq{f}_s_w"]),
            torch.from_numpy(weights[f"sq{f}_s_b"])))
        e1 = torch.relu(nn.functional.conv2d(
            s, torch.from_numpy(weights[f"sq{f}_e1_w"]),
            torch.from_numpy(weights[f"sq{f}_e1_b"])))
        e3 = torch.relu(nn.functional.conv2d(
            s, torch.from_numpy(weights[f"sq{f}_e3_w"]),
            torch.from_numpy(weights[f"sq{f}_e3_b"]), padding=1))
        return torch.cat([e1, e3], dim=1)

    def features(img):
        x = _torch_prep(img)
        x = torch.relu(nn.functional.conv2d(
            x, torch.from_numpy(weights["sq_conv0_w"]),
            torch.from_numpy(weights["sq_conv0_b"]), stride=2))
        feats = [_torch_norm(x)]
        x = nn.functional.max_pool2d(x, 3, 2, ceil_mode=True)
        x = fire(x, 0)
        x = fire(x, 1)
        feats.append(_torch_norm(x))
        x = nn.functional.max_pool2d(x, 3, 2, ceil_mode=True)
        x = fire(x, 2)
        x = fire(x, 3)
        feats.append(_torch_norm(x))
        x = nn.functional.max_pool2d(x, 3, 2, ceil_mode=True)
        for f in (4, 5, 6, 7):
            x = fire(x, f)
            feats.append(_torch_norm(x))
        return feats

    return _torch_head_sum(features(img1), features(img2), weights, "sq_lin{}_w")


@pytest.mark.parametrize("net,maker,oracle,size", [
    ("alex", make_random_alex_weights, torch_oracle_alex, (96, 128)),
    # odd sizes exercise the ceil-mode pooling path
    ("squeeze", make_random_squeeze_weights, torch_oracle_squeeze, (95, 129)),
])
def test_lpips_alex_squeeze_match_torch_oracle(
    tmp_path, monkeypatch, net, maker, oracle, size
):
    rng = np.random.default_rng(21)
    weights = maker(rng)
    path = str(tmp_path / f"lpips_{net}.npz")
    np.savez(path, **weights)
    monkeypatch.setenv("GS_TPU_LPIPS_WEIGHTS", path)
    gs_lpips._load_weights.cache_clear()
    try:
        assert gs_lpips.lpips_available(net)
        assert not gs_lpips.lpips_available("vgg")  # per-backbone detection
        img1 = rng.uniform(size=(*size, 3)).astype(np.float32)
        img2 = np.clip(img1 + rng.normal(0, 0.1, img1.shape), 0, 1).astype(np.float32)
        got = float(gs_lpips.lpips(img1, img2, net))
        want = oracle(img1, img2, weights)
        assert got == pytest.approx(want, rel=2e-4, abs=1e-6)
        assert float(gs_lpips.lpips(img1, img1, net)) == pytest.approx(0.0, abs=1e-6)
        assert got > 1e-5
    finally:
        gs_lpips._load_weights.cache_clear()


def test_metrics_cli_lpips_net_flag(tmp_path, monkeypatch):
    """--lpips_net alex drives the alex backbone end-to-end through the
    metrics CLI (and vgg correctly reports unavailable with alex-only
    weights: LPIPS must be null under the default net)."""
    import imageio
    import json

    from gaussian_splatting_tpu.cli import metrics as metrics_cli

    rng = np.random.default_rng(13)
    weights = make_random_alex_weights(rng)
    path = str(tmp_path / "lpips_alex.npz")
    np.savez(path, **weights)
    monkeypatch.setenv("GS_TPU_LPIPS_WEIGHTS", path)
    gs_lpips._load_weights.cache_clear()
    try:
        model = tmp_path / "model"
        rdir = model / "test" / "ours_7000" / "renders"
        gdir = model / "test" / "ours_7000" / "gt"
        rdir.mkdir(parents=True)
        gdir.mkdir(parents=True)
        a = (rng.uniform(size=(64, 96, 3)) * 255).astype(np.uint8)
        b = np.clip(a + rng.normal(0, 12, a.shape), 0, 255).astype(np.uint8)
        imageio.imwrite(str(rdir / "00000.png"), a)
        imageio.imwrite(str(gdir / "00000.png"), b)

        metrics_cli.main(["-m", str(model), "--lpips_net", "alex"])
        res = json.load(open(model / "results.json"))
        lp = res["ours_7000"]["LPIPS"]
        assert lp is not None and np.isfinite(lp) and lp > 0

        metrics_cli.main(["-m", str(model)])  # default vgg: unavailable
        res = json.load(open(model / "results.json"))
        assert res["ours_7000"]["LPIPS"] is None
    finally:
        gs_lpips._load_weights.cache_clear()
