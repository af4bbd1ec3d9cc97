"""Independent numpy oracle for the EWA projection (preprocess).

The oracle below is a from-scratch per-Gaussian transcription of the
reference semantics — forward.cu:84-140 (computeCov2D), :194-324
(preprocessCUDA: frustum cull, projection, conic, radius), auxiliary.h:42-58
(ndc2Pix, getRect) — written with explicit small-matrix numpy products and
a Python loop, deliberately NOT sharing any code or algebraic structure
with `ops/projection.py` (which expands A = J @ W elementwise). A
transposed Jacobian, a J@W vs W@J mixup, or a sign flip that is consistent
across the repo's backends would fail here.

cov3D is injected via `cov3d_precomp` (random PSD matrices) so this test
isolates the 3D→2D projection math from the scale/quat construction, which
has its own oracle in test_gsmath.py.
"""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from gaussian_splatting_tpu.ops.projection import preprocess
from gaussian_splatting_tpu.scene.cameras import Camera


def oracle_preprocess(means, cov3d_packed, opacities, cam_np, W, H,
                      tile_w=16, tile_h=16):
    """Reference-semantics preprocess, one Gaussian at a time, f32.

    cam_np: dict with viewmatrix (4,4) row-major W2C, projmatrix (4,4)
    row-major full projection, tanfovx, tanfovy.
    """
    V = cam_np["viewmatrix"].astype(np.float32)
    PM = cam_np["projmatrix"].astype(np.float32)
    tanx = np.float32(cam_np["tanfovx"])
    tany = np.float32(cam_np["tanfovy"])
    focal_x = np.float32(W / (2.0 * tanx))
    focal_y = np.float32(H / (2.0 * tany))
    n = means.shape[0]
    out = {
        "visible": np.zeros(n, bool),
        "depth": np.zeros(n, np.float32),
        "mean2d": np.zeros((n, 2), np.float32),
        "conic": np.zeros((n, 3), np.float32),
        "radius": np.zeros(n, np.int32),
        "rect_min": np.zeros((n, 2), np.int32),
        "rect_max": np.zeros((n, 2), np.int32),
    }
    grid = np.array([(W + tile_w - 1) // tile_w, (H + tile_h - 1) // tile_h])
    for i in range(n):
        p = means[i].astype(np.float32)
        # in_frustum (auxiliary.h:144-175): near-plane cull on camera z.
        t = (V @ np.append(p, 1.0).astype(np.float32))[:3]
        if not (t[2] > 0.2):
            continue
        # projection (forward.cu:241-246): full 4x4, guarded divide.
        hom = PM @ np.append(p, 1.0).astype(np.float32)
        inv_w = np.float32(1.0) / (hom[3] + np.float32(1e-7))
        ndc = hom[:3] * inv_w
        # ndc2Pix (auxiliary.h:42-45)
        pix = np.array(
            [((ndc[0] + 1.0) * W - 1.0) * 0.5,
             ((ndc[1] + 1.0) * H - 1.0) * 0.5], np.float32)

        # computeCov2D (forward.cu:84-140). The reference builds, in glm
        # COLUMN-major, T = W * J and cov = T^T * Vrk^T * T. Writing the
        # same math in row-major: A = J2x3 @ Wrot, cov2d = A @ Vrk @ A^T.
        tz = t[2]
        limx = np.float32(1.3) * tanx
        limy = np.float32(1.3) * tany
        txtz, tytz = t[0] / tz, t[1] / tz
        tx = np.float32(min(limx, max(-limx, txtz)) * tz)
        ty = np.float32(min(limy, max(-limy, tytz)) * tz)
        J = np.array(
            [[focal_x / tz, 0.0, -(focal_x * tx) / (tz * tz)],
             [0.0, focal_y / tz, -(focal_y * ty) / (tz * tz)]], np.float32)
        Wrot = V[:3, :3]
        A = J @ Wrot  # (2,3)
        c6 = cov3d_packed[i].astype(np.float32)
        Vrk = np.array(
            [[c6[0], c6[1], c6[2]],
             [c6[1], c6[3], c6[4]],
             [c6[2], c6[4], c6[5]]], np.float32)
        cov = A @ Vrk @ A.T
        cov[0, 0] += np.float32(0.3)  # low-pass (forward.cu:137-138)
        cov[1, 1] += np.float32(0.3)

        det = cov[0, 0] * cov[1, 1] - cov[0, 1] * cov[0, 1]
        if det == 0.0:
            continue
        conic = np.array(
            [cov[1, 1] / det, -cov[0, 1] / det, cov[0, 0] / det], np.float32)
        # radius (forward.cu:284-289)
        mid = np.float32(0.5) * (cov[0, 0] + cov[1, 1])
        lam1 = mid + np.sqrt(max(np.float32(0.1), mid * mid - det))
        lam2 = mid - np.sqrt(max(np.float32(0.1), mid * mid - det))
        radius = int(math.ceil(3.0 * math.sqrt(max(lam1, lam2))))
        # getRect (auxiliary.h:48-58) — the reference's square rect.
        rmin = np.array(
            [min(grid[0], max(0, int((pix[0] - radius) / tile_w))),
             min(grid[1], max(0, int((pix[1] - radius) / tile_h)))],
            np.int32)
        rmax = np.array(
            [min(grid[0], max(0, int((pix[0] + radius + tile_w - 1) / tile_w))),
             min(grid[1], max(0, int((pix[1] + radius + tile_h - 1) / tile_h)))],
            np.int32)
        if (rmax[0] - rmin[0]) * (rmax[1] - rmin[1]) == 0:
            continue
        out["visible"][i] = True
        out["depth"][i] = tz
        out["mean2d"][i] = pix
        out["conic"][i] = conic
        out["radius"][i] = radius
        out["rect_min"][i] = rmin
        out["rect_max"][i] = rmax
    return out


def _random_camera(rng, W, H):
    # Proper random rotation via QR, det forced to +1.
    Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(Q) < 0:
        Q[:, 0] = -Q[:, 0]
    return Camera(
        uid=0, colmap_id=0, R=Q, T=rng.normal(0, 0.5, 3) + [0, 0, 4.0],
        fovx=math.radians(70), fovy=math.radians(70 * H / W), image=None,
        image_name="o", width=W, height=H,
    )


@pytest.mark.parametrize("seed", [0, 3])
def test_preprocess_matches_independent_oracle(seed):
    rng = np.random.default_rng(seed)
    P, W, H = 256, 640, 360
    cam = _random_camera(rng, W, H)
    means = rng.normal(0, 1.2, (P, 3)).astype(np.float32)
    # Random PSD cov3d: B B^T with B scaled to splat-like sizes.
    B = rng.normal(0, 1.0, (P, 3, 3)).astype(np.float32) * \
        rng.uniform(0.005, 0.08, (P, 1, 1)).astype(np.float32)
    covm = np.einsum("pij,pkj->pik", B, B)
    cov6 = np.stack([covm[:, 0, 0], covm[:, 0, 1], covm[:, 0, 2],
                     covm[:, 1, 1], covm[:, 1, 2], covm[:, 2, 2]], axis=1)
    opac = rng.uniform(0.02, 1.0, P).astype(np.float32)

    ca = cam.arrays()
    got = preprocess(
        jnp.asarray(means), None, None, jnp.asarray(opac), None, 0,
        ca, W, H, 16, 16,
        colors_precomp=jnp.zeros((P, 3), jnp.float32),
        cov3d_precomp=jnp.asarray(cov6),
    )
    want = oracle_preprocess(
        means, cov6, opac,
        dict(viewmatrix=ca.viewmatrix, projmatrix=ca.projmatrix,
             tanfovx=ca.tanfovx, tanfovy=ca.tanfovy), W, H)

    got_vis = np.asarray(got.visible)
    # `visible` gates on the UNtightened 3-sigma rect (the reference's
    # getRect semantics), so it must match the oracle exactly — the
    # opacity-tightened rect only shrinks the *emitted* tile lists.
    assert np.array_equal(got_vis, want["visible"])
    both = got_vis & want["visible"]
    assert both.sum() > 50  # sanity: the scene is non-trivial

    np.testing.assert_allclose(
        np.asarray(got.depths)[both], want["depth"][both], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got.means2d)[both], want["mean2d"][both],
        rtol=2e-5, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(got.conic)[both], want["conic"][both],
        rtol=3e-4, atol=3e-4)
    # radius: integer ceil of a float expression — allow 1px of f32 slack
    # on a handful of gaussians, exact for the rest.
    rg = np.asarray(got.radii)[both].astype(np.int64)
    rw = want["radius"][both].astype(np.int64)
    assert np.abs(rg - rw).max() <= 1
    assert (rg != rw).mean() < 0.05

    # Tightened tile rects must be contained in the reference's square rect.
    gmin = np.asarray(got.rect_min)[both]
    gmax = np.asarray(got.rect_max)[both]
    assert np.all(gmin >= want["rect_min"][both] - 0)
    assert np.all(gmax <= want["rect_max"][both] + 0)
    # Splats whose tightened rect collapsed (alpha < 1/255 everywhere)
    # stay visible but emit nothing; every EMITTING splat has a positive
    # rect area.
    emitting = np.asarray(got.tiles_touched)[both] > 0
    assert np.all(((gmax - gmin) > 0)[emitting])
    assert emitting.sum() > 50


def test_oracle_catches_transposed_jacobian():
    """Self-check: the oracle is sensitive to the J@W vs W^T@J^T order —
    with an anisotropic covariance and a rotated camera, swapping the
    contraction order changes conics measurably."""
    rng = np.random.default_rng(7)
    P, W, H = 64, 640, 360
    cam = _random_camera(rng, W, H)
    ca = cam.arrays()
    means = rng.normal(0, 1.0, (P, 3)).astype(np.float32)
    B = rng.normal(0, 1.0, (P, 3, 3)).astype(np.float32) * 0.05
    covm = np.einsum("pij,pkj->pik", B, B)
    cov6 = np.stack([covm[:, 0, 0], covm[:, 0, 1], covm[:, 0, 2],
                     covm[:, 1, 1], covm[:, 1, 2], covm[:, 2, 2]], axis=1)
    opac = np.full(P, 0.9, np.float32)
    camd = dict(viewmatrix=ca.viewmatrix, projmatrix=ca.projmatrix,
                tanfovx=ca.tanfovx, tanfovy=ca.tanfovy)
    base = oracle_preprocess(means, cov6, opac, camd, W, H)
    # transpose the view rotation -> simulates the classic W@J mixup
    camd_t = dict(camd)
    vm = camd["viewmatrix"].copy()
    vm[:3, :3] = vm[:3, :3].T
    camd_t["viewmatrix"] = vm
    swapped = oracle_preprocess(means, cov6, opac, camd_t, W, H)
    both = base["visible"] & swapped["visible"]
    assert both.sum() > 10
    diff = np.abs(base["conic"][both] - swapped["conic"][both]).max()
    assert diff > 1e-2
