"""Scene/data-layer tests: PLY round-trips, COLMAP parsers, Blender reader."""

import os

import jax
import numpy as np
import pytest

from gaussian_splatting_tpu.scene import colmap, ply


def test_gaussian_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    P = 17
    params = {
        "xyz": rng.normal(size=(P, 3)).astype(np.float32),
        "features_dc": rng.normal(size=(P, 1, 3)).astype(np.float32),
        "features_rest": rng.normal(size=(P, 15, 3)).astype(np.float32),
        "opacity": rng.normal(size=(P, 1)).astype(np.float32),
        "scaling": rng.normal(size=(P, 3)).astype(np.float32),
        "rotation": rng.normal(size=(P, 4)).astype(np.float32),
    }
    path = str(tmp_path / "pc.ply")
    ply.save_gaussians_ply(path, params)
    loaded = ply.load_gaussians_ply(path, sh_degree=3)
    for k in params:
        np.testing.assert_array_equal(loaded[k], params[k], err_msg=k)


def test_gaussian_ply_attribute_order(tmp_path):
    """The header must list attributes exactly as gaussian_model.py:277-289
    does — viewers depend on this order."""
    P = 2
    params = {
        "xyz": np.zeros((P, 3), np.float32),
        "features_dc": np.zeros((P, 1, 3), np.float32),
        "features_rest": np.zeros((P, 15, 3), np.float32),
        "opacity": np.zeros((P, 1), np.float32),
        "scaling": np.zeros((P, 3), np.float32),
        "rotation": np.zeros((P, 4), np.float32),
    }
    path = str(tmp_path / "pc.ply")
    ply.save_gaussians_ply(path, params)
    header = open(path, "rb").read(4096).split(b"end_header")[0].decode()
    names = [l.split()[-1] for l in header.splitlines() if l.startswith("property")]
    expected = (
        ["x", "y", "z", "nx", "ny", "nz"]
        + [f"f_dc_{i}" for i in range(3)]
        + [f"f_rest_{i}" for i in range(45)]
        + ["opacity"]
        + [f"scale_{i}" for i in range(3)]
        + [f"rot_{i}" for i in range(4)]
    )
    assert names == expected


def test_point_cloud_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    colors = rng.uniform(size=(10, 3)).astype(np.float32)
    path = str(tmp_path / "input.ply")
    ply.save_point_cloud_ply(path, pts, colors)
    p2, c2, n2 = ply.load_point_cloud_ply(path)
    np.testing.assert_allclose(p2, pts, atol=1e-6)
    np.testing.assert_allclose(c2, colors, atol=1 / 255.0)


def test_colmap_binary_roundtrip(tmp_path):
    cams = {
        1: colmap.ColmapCamera(id=1, model="PINHOLE", width=640, height=480,
                               params=np.array([500.0, 505.0, 320.0, 240.0]))
    }
    colmap.write_cameras_binary(cams, str(tmp_path / "cameras.bin"))
    back = colmap.read_cameras_binary(str(tmp_path / "cameras.bin"))
    assert back[1].model == "PINHOLE" and back[1].width == 640
    np.testing.assert_array_equal(back[1].params, cams[1].params)

    rng = np.random.default_rng(2)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    ims = {
        5: colmap.ColmapImage(
            id=5, qvec=q, tvec=rng.normal(size=3), camera_id=1, name="img001.png",
            xys=rng.normal(size=(7, 2)), point3d_ids=np.arange(7, dtype=np.int64),
        )
    }
    colmap.write_images_binary(ims, str(tmp_path / "images.bin"))
    back = colmap.read_images_binary(str(tmp_path / "images.bin"))
    assert back[5].name == "img001.png"
    np.testing.assert_allclose(back[5].qvec, q)
    np.testing.assert_array_equal(back[5].point3d_ids, ims[5].point3d_ids)

    xyz = rng.normal(size=(9, 3))
    rgb = rng.integers(0, 255, (9, 3)).astype(np.uint8)
    err = rng.uniform(size=9)
    colmap.write_points3d_binary(xyz, rgb, err, str(tmp_path / "points3D.bin"))
    x2, r2, e2 = colmap.read_points3d_binary(str(tmp_path / "points3D.bin"))
    np.testing.assert_allclose(x2, xyz)
    np.testing.assert_array_equal(r2, rgb)


def test_qvec_rotmat_roundtrip():
    rng = np.random.default_rng(3)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    R = colmap.qvec2rotmat(q)
    q2 = colmap.rotmat2qvec(R)
    np.testing.assert_allclose(q2, q, atol=1e-6)


def test_blender_scene_end_to_end(tmp_path):
    """Write a Blender scene to disk, read it through the real Scene path,
    and check reconstructed cameras render the same images."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    import jax.numpy as jnp
    from make_synthetic_scene import make_blender_scene
    from gaussian_splatting_tpu.scene.scene import Scene
    from gaussian_splatting_tpu.ops.rasterize import RasterizerConfig, rasterize
    from helpers import make_gaussians

    scene_dir = str(tmp_path / "scene")
    model_dir = str(tmp_path / "model")
    make_blender_scene(scene_dir, n_train=3, n_test=1)

    scene = Scene(
        source_path=scene_dir, model_path=model_dir, eval_split=True,
        shuffle=False, resolution=1,
    )
    assert len(scene.get_train_cameras()) == 3
    assert len(scene.get_test_cameras()) == 1
    assert os.path.exists(os.path.join(model_dir, "cameras.json"))
    assert os.path.exists(os.path.join(model_dir, "input.ply"))
    # random-point init created on disk (100k by default; conftest shrinks it
    # via GS_TPU_BLENDER_INIT_POINTS for test speed)
    expected_pts = int(os.environ.get("GS_TPU_BLENDER_INIT_POINTS", 100_000))
    assert scene.info.points.shape[0] == expected_pts

    # reconstructed camera must reproduce the stored GT image when we
    # re-render the same Gaussians through it (round-trip through the
    # OpenGL->COLMAP flip and back).
    cam = scene.get_train_cameras()[0]
    means, scales, quats, opacities, shs = make_gaussians(P=48, seed=3, spread=0.8)
    cfg = RasterizerConfig(backend="xla", capacity_mult=32, chunk=128)
    img, _ = rasterize(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(opacities), jnp.asarray(shs), 3, cam.arrays(),
        cam.width, cam.height, jnp.zeros(3), cfg,
    )
    rendered = np.clip(np.asarray(img), 0, 1)
    stored = cam.image.transpose(1, 2, 0)
    assert np.abs(rendered - stored).mean() < 2.5 / 255.0  # 8-bit quantization


def test_golden_ply_fixture_roundtrip(tmp_path):
    """Interop pinned by fixture: a checked-in reference-layout PLY (built
    by the independent generator tests/fixtures/make_golden_ply.py, spec =
    gaussian_model.py:277-308) must load, render, and re-save BYTE-identical
    — so ecosystem compatibility does not rest on our own writer's
    conventions."""
    import math
    import jax.numpy as jnp
    from gaussian_splatting_tpu.ops.rasterize import RasterizerConfig, rasterize
    from gaussian_splatting_tpu.scene.cameras import Camera

    fixture = os.path.join(os.path.dirname(__file__), "fixtures",
                           "golden_gaussians.ply")
    golden_bytes = open(fixture, "rb").read()
    params = ply.load_gaussians_ply(fixture, sh_degree=3)

    # Spot-check values against the generator's formulas (independent).
    P = 8
    ang = np.arange(P, dtype=np.float32) * np.float32(2.0 * np.pi / P)
    np.testing.assert_allclose(params["xyz"][:, 0], 0.8 * np.cos(ang), rtol=1e-6)
    np.testing.assert_allclose(params["opacity"], np.full((P, 1), 2.0))
    np.testing.assert_allclose(params["rotation"][:, 0], np.ones(P))
    assert params["features_rest"].shape == (P, 15, 3)
    # channel-major flattening: f_rest_17 is channel 1, coeff 2
    np.testing.assert_allclose(
        params["features_rest"][:, 2, 1],
        0.01 * np.sin(1.0 + np.arange(P) + 7 + 2).astype(np.float32),
        rtol=1e-6)

    # It must render to a non-trivial image through the real pipeline.
    cam = Camera(
        uid=0, colmap_id=0, R=np.eye(3), T=np.array([0.0, 0.0, 3.0]),
        fovx=math.radians(60), fovy=math.radians(60), image=None,
        image_name="g", width=128, height=128)
    shs = np.concatenate([params["features_dc"], params["features_rest"]], axis=1)
    img, aux = rasterize(
        jnp.asarray(params["xyz"]),
        jnp.exp(jnp.asarray(params["scaling"])),
        jnp.asarray(params["rotation"]),
        jax.nn.sigmoid(jnp.asarray(params["opacity"][:, 0])),
        jnp.asarray(shs), 3, cam.arrays(), 128, 128, jnp.zeros(3),
        RasterizerConfig(backend="xla", capacity_mult=64, chunk=128),
    )
    assert int(aux["visible"].sum()) == P
    assert float(jnp.abs(img).max()) > 0.1

    # Byte-identical re-save.
    out = str(tmp_path / "resaved.ply")
    ply.save_gaussians_ply(out, params)
    assert open(out, "rb").read() == golden_bytes


def test_native_points3d_matches_python(tmp_path):
    """The C++ points3D.bin parser must agree with the pure-Python one."""
    pytest.importorskip("gs_native", reason="native extension not built")
    rng = np.random.default_rng(4)
    xyz = rng.normal(size=(50, 3))
    rgb = rng.integers(0, 255, (50, 3)).astype(np.uint8)
    err = rng.uniform(size=50)
    path = str(tmp_path / "points3D.bin")
    colmap.write_points3d_binary(xyz, rgb, err, path)

    import gs_native

    nx, nr, ne = gs_native.read_points3d_bin(path)
    np.testing.assert_allclose(nx, xyz)
    np.testing.assert_array_equal(nr, rgb)
    np.testing.assert_allclose(ne, err)


def test_native_points3d_rejects_corrupt_files(tmp_path):
    """Untrusted count / track-length fields must raise, not crash."""
    pytest.importorskip("gs_native", reason="native extension not built")
    import struct

    import gs_native

    # absurd record count
    p1 = str(tmp_path / "badcount.bin")
    open(p1, "wb").write(struct.pack("<Q", 1 << 60))
    with pytest.raises(ValueError):
        gs_native.read_points3d_bin(p1)

    # valid first record header but absurd track length
    p2 = str(tmp_path / "badtrack.bin")
    rec = struct.pack("<q", 1) + b"\0" * 24 + b"\0" * 3 + b"\0" * 8
    rec += struct.pack("<Q", (1 << 62))
    open(p2, "wb").write(struct.pack("<Q", 1) + rec)
    with pytest.raises(ValueError):
        gs_native.read_points3d_bin(p2)

    # truncated mid-record
    p3 = str(tmp_path / "trunc.bin")
    open(p3, "wb").write(struct.pack("<Q", 2) + rec[:20])
    with pytest.raises(ValueError):
        gs_native.read_points3d_bin(p3)


def test_native_knn_close_to_exact():
    """Native Morton 3-NN should be near the exact answer (approximation
    quality only affects initial scales, like the reference simple-knn)."""
    pytest.importorskip("gs_native", reason="native extension not built")
    import gs_native
    import jax.numpy as jnp
    from gaussian_splatting_tpu.ops.knn import mean_knn_dist2_exact

    rng = np.random.default_rng(5)
    pts = rng.normal(size=(3000, 3)).astype(np.float32)
    exact = np.asarray(mean_knn_dist2_exact(jnp.asarray(pts)))
    approx = np.asarray(gs_native.mean_knn_dist2(pts))
    rel = np.abs(approx - exact) / np.maximum(exact, 1e-12)
    # the Morton window sweep is an approximation (like the reference
    # simple-knn); it must be exact for most points and sane for the rest
    assert np.median(rel) < 1e-4
    assert (rel < 0.5).mean() > 0.75
    assert (approx >= 0).all() and np.isfinite(approx).all()
