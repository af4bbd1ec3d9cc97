"""Exact per-tile ellipse culling (RasterizerConfig.tile_cull).

The cull must be LOSSLESS: it may only drop (gaussian, tile) entries whose
every pixel fails the alpha >= 1/255 blend test the compositor applies
anyway (forward.cu:449), so the rendered image and all gradients are
bit-identical with the cull on or off.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussian_splatting_tpu.ops import binning, projection
from gaussian_splatting_tpu.ops.projection import preprocess
from gaussian_splatting_tpu.ops.rasterize import RasterizerConfig, rasterize

from helpers import make_camera, make_gaussians

W, H = 160, 96
TILE = 16


def _scene(p=400, seed=0):
    means, scales, quats, opacities, shs = make_gaussians(
        P=p, seed=seed, scale_mu=-2.0
    )
    return tuple(map(jnp.asarray, (means, scales, quats, opacities, shs)))


def _prep(g, tile_cull, tw=16, th=16):
    cam = make_camera(W, H)
    means, scales, quats, opacities, shs = g
    return preprocess(
        means, scales, quats, opacities, shs,
        2, cam.arrays(), W, H, tw, th, tile_cull=tile_cull,
    )


def test_select_tile_bit_oracle():
    """_select_tile_bit(bm, i) must return the position of the i-th set
    bit of the 32-bit mask (the all-ones sentinel rows return i itself,
    which coincides with the i-th set bit anyway)."""
    rng = np.random.default_rng(3)
    masks = rng.integers(0, 2, size=(200, 32)).astype(np.uint64)
    masks[0] = 0
    masks[0][7] = 1  # degenerate: single bit
    masks[1] = np.ones(32)  # full mask == the -1 sentinel
    bm = np.zeros(200, np.int64)
    for b in range(32):
        bm |= masks[:, b].astype(np.int64) << b
    bm32 = jnp.asarray(bm.astype(np.uint32).view(np.int32))
    idx, want, rows = [], [], []
    for r in range(200):
        setbits = np.flatnonzero(masks[r])
        for i, b in enumerate(setbits):
            rows.append(r)
            idx.append(i)
            want.append(b)
    got = binning._select_tile_bit(
        bm32[jnp.asarray(rows)], jnp.asarray(idx, jnp.int32)
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_cull_is_lossless_per_tile():
    """Every culled tile must have zero pixels passing the blend test."""
    g = _scene(500, seed=1)
    prep = _prep(g, tile_cull=True)
    prep_ref = _prep(g, tile_cull=False)
    bms = np.asarray(prep.cull_bm)
    cap_bits = projection._CULL_CAP_BITS
    rect_min = np.asarray(prep.rect_min)
    rect_max = np.asarray(prep.rect_max)
    conic = np.asarray(prep.conic)
    mean = np.asarray(prep.means2d)
    op = np.asarray(prep.opacity)
    vis = np.asarray(prep_ref.visible)
    counts = np.asarray(prep.tiles_touched)

    checked_cull = 0
    for i in np.flatnonzero(vis)[:200]:
        rw = rect_max[i, 0] - rect_min[i, 0]
        rh = rect_max[i, 1] - rect_min[i, 1]
        if rw * rh > cap_bits or rw > 8 or rh > 8:
            assert counts[i] == rw * rh  # fallback keeps the full rect
            continue
        bm = np.uint64(np.uint32(bms[i]))
        nbits = bin(int(bm) & ((1 << int(rw * rh)) - 1)).count("1")
        assert counts[i] == nbits, i
        a, b, c = conic[i]
        for dy in range(rh):
            for dx in range(rw):
                if (int(bm) >> (dy * rw + dx)) & 1:
                    continue
                # culled tile: no pixel may shade
                tx = (rect_min[i, 0] + dx) * TILE
                ty = (rect_min[i, 1] + dy) * TILE
                px, py = np.meshgrid(np.arange(TILE), np.arange(TILE))
                ddx = mean[i, 0] - (tx + px)
                ddy = mean[i, 1] - (ty + py)
                power = -0.5 * (a * ddx**2 + c * ddy**2) - b * ddx * ddy
                alpha = np.minimum(0.99, op[i] * np.exp(power))
                shaded = (power <= 0) & (alpha >= 1.0 / 255.0)
                assert not shaded.any(), (i, dx, dy)
                checked_cull += 1
    assert checked_cull > 20  # the scene must actually exercise culling


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_cull_image_and_grads_identical(backend):
    g = _scene(400, seed=2)
    means, scales, quats, opacities, shs = g
    cam = make_camera(W, H)
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)

    def render(tile_cull):
        cfg = RasterizerConfig(backend=backend, capacity_mult=32,
                               tile_cull=tile_cull)

        def f(m, s, o):
            img, aux = rasterize(
                m, s, quats, o, shs, 2, cam.arrays(), W, H, bg, cfg,
            )
            return jnp.sum(img * img) + jnp.sum(aux["final_t"]), img

        (loss, img), grads = jax.value_and_grad(f, argnums=(0, 1, 2),
                                                has_aux=True)(
            means, scales, opacities
        )
        return img, grads

    img_off, g_off = render(False)
    img_on, g_on = render(True)
    np.testing.assert_allclose(np.asarray(img_on), np.asarray(img_off),
                               atol=1e-6, rtol=0)
    # Gradients are mathematically identical (culled entries contribute
    # exact zeros) but the Pallas VJP reduces per-gaussian runs via prefix
    # differences, so dropping entries changes the summation order; allow
    # reduction-rounding scaled by the gradient magnitude.
    for a, b in zip(g_on, g_off):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(a, b, atol=1e-3 * scale, rtol=1e-3)


def test_cull_reduces_entries():
    g = _scene(600, seed=4)
    p_on = _prep(g, tile_cull=True)
    p_off = _prep(g, tile_cull=False)
    n_on = int(jnp.sum(p_on.tiles_touched))
    n_off = int(jnp.sum(p_off.tiles_touched))
    assert n_on < n_off  # anisotropic random scene must cull something
    assert n_on > 0
    # radii (densification stat parity) must be unaffected by the cull
    np.testing.assert_array_equal(
        np.asarray(p_on.radii), np.asarray(p_off.radii)
    )


def test_saturated_stack_matches_xla_oracle():
    """The MXU log-sum carry (now the only carry form) must agree with
    the independent XLA-composite backend on a deeply saturating opaque
    stack: same image to reduction rounding, same early-exit replay."""
    means, scales, quats, opacities, shs = make_gaussians(
        P=500, seed=9, scale_mu=-1.5
    )
    opacities = np.clip(opacities * 3.0, 0.0, 0.995)  # deep saturation
    g = tuple(map(jnp.asarray, (means, scales, quats, opacities, shs)))
    cam = make_camera(W, H)
    bg = jnp.asarray([0.0, 0.5, 1.0], jnp.float32)
    cfg = RasterizerConfig(backend="pallas", capacity_mult=48)
    cfg_xla = RasterizerConfig(backend="xla", capacity_mult=48)

    def render(c):
        img, aux = rasterize(
            *g, 2, cam.arrays(), W, H, bg, c,
        )
        return np.asarray(img), np.asarray(aux["final_t"])

    img_min, ft_min = render(cfg_xla)
    img_mx, ft_mx = render(cfg)
    np.testing.assert_allclose(img_mx, img_min, atol=2e-5, rtol=0)
    np.testing.assert_allclose(ft_mx, ft_min, atol=2e-5, rtol=0)

    # gradients replay the same carries (bwd shares _blend_state)
    def loss(m, o):
        img, _ = rasterize(m, g[1], g[2], o, g[4], 2, cam.arrays(), W, H,
                           bg, cfg)
        return jnp.sum(img * img)

    gm, go = jax.grad(loss, argnums=(0, 1))(g[0], g[3])
    assert np.isfinite(np.asarray(gm)).all()
    assert np.isfinite(np.asarray(go)).all()
    assert float(jnp.abs(go).max()) > 0


def test_faint_splat_stays_visible_with_zero_tiles():
    """A splat with activated opacity < 1/255 loses its (opacity-
    tightened) rect — zero emitted entries — but the reference's
    visibility_filter counts it (forward.cu getRect uses the full
    3*sigma radius), so `visible`/`radii` must stay on."""
    means, scales, quats, opacities, shs = map(
        np.copy, make_gaussians(P=8, seed=3, scale_mu=-1.2)
    )
    opacities[:] = 1.0 / 400.0  # below 1/255, well-formed otherwise
    g = tuple(map(jnp.asarray, (means, scales, quats, opacities, shs)))
    prep = _prep(g, tile_cull=True)
    vis = np.asarray(prep.visible)
    tiles = np.asarray(prep.tiles_touched)
    radii = np.asarray(prep.radii)
    assert vis.any(), "faint splats in front of the camera must be visible"
    # the zero-half-extent rect keeps at most the tile under the center,
    # and drops even that when the center sits in a tile's first pixel —
    # THOSE splats are the regression: they must stay visible.
    assert (tiles[vis] <= 1).all()
    assert (tiles[vis] == 0).any(), "seed should produce a dropped-rect case"
    assert (radii[vis] > 0).all(), "radii keep the 3-sigma reference value"
    # and the untightened gate never turns ON splats the tight rect kept
    prep_nc = _prep(g, tile_cull=False)
    assert (np.asarray(prep_nc.visible) == vis).all()


def test_clip_cull_bitmaps_rows_oracle():
    """Bit-shift row clipping must match a brute-force numpy re-derivation
    (bit dy*w+dx of the clipped map == bit (dy+drop)*w+dx of the global),
    including the -1 keep-all sentinel and empty clips."""
    from gaussian_splatting_tpu.ops.projection import clip_cull_bitmaps_rows

    rng = np.random.default_rng(7)
    n = 512
    w = rng.integers(1, 9, n)
    h = rng.integers(1, 9, n)
    area = w * h
    bm = rng.integers(0, 1 << 32, n, dtype=np.uint64)
    bm &= np.where(area >= 32, np.uint64(0xFFFFFFFF),
                   (np.uint64(1) << area.astype(np.uint64)) - np.uint64(1))
    # producer semantics (tile_cull_bitmaps): rects wider than the 32-bit
    # bitmap keep all tiles via the sentinel; also sprinkle sentinels on
    # small rects (the producer emits them for >8-wide/tall rects too).
    sentinel = (rng.random(n) < 0.15) | (area > 32)
    bm = np.where(sentinel, np.uint64(0xFFFFFFFF), bm)
    drop = rng.integers(0, 10, n)  # may exceed h (empty clip)
    clipped_h = np.maximum(h - drop, 0)

    exp_counts = np.zeros(n, np.int64)
    exp_bm = np.zeros(n, np.uint64)
    for i in range(n):
        if sentinel[i]:
            exp_counts[i] = w[i] * clipped_h[i]
            continue
        for dy in range(clipped_h[i]):
            for dx in range(w[i]):
                src = (dy + drop[i]) * w[i] + dx
                if (bm[i] >> np.uint64(src)) & np.uint64(1):
                    exp_bm[i] |= np.uint64(1) << np.uint64(dy * w[i] + dx)
                    exp_counts[i] += 1

    bm_in = jnp.asarray(bm.astype(np.uint32).view(np.int32))
    out, counts = clip_cull_bitmaps_rows(
        bm_in, jnp.asarray(w, jnp.int32), jnp.asarray(drop, jnp.int32),
        jnp.asarray(clipped_h, jnp.int32),
    )
    got = np.asarray(out).view(np.uint32).astype(np.uint64)
    np.testing.assert_array_equal(np.asarray(counts), exp_counts)
    # sentinel rows stay sentinel (keep-all)
    assert np.all(got[sentinel] == np.uint64(0xFFFFFFFF))
    ok = sentinel | (got == exp_bm)
    assert ok.all(), np.nonzero(~ok)
