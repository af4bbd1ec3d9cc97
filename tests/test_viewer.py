"""Loopback test of the SIBR-remote TCP protocol (network_gui)."""

import json
import math
import socket
import threading

import numpy as np
import pytest


def _client_request(port, width, height, view, viewproj, scaling_modifier=1.0,
                    shs_python=False, rot_scale_python=False):
    """Speak the reference wire protocol (network_gui.py:43-55): length-
    prefixed JSON in, raw RGB + length-prefixed source path out."""
    s = socket.create_connection(("127.0.0.1", port), timeout=10)
    msg = dict(
        resolution_x=width,
        resolution_y=height,
        train=False,
        fov_y=math.radians(60),
        fov_x=math.radians(60),
        z_near=0.01,
        z_far=100.0,
        shs_python=shs_python,
        rot_scale_python=rot_scale_python,
        keep_alive=True,
        scaling_modifier=scaling_modifier,
        view_matrix=view,
        view_projection_matrix=viewproj,
    )
    payload = json.dumps(msg).encode("utf-8")
    s.sendall(len(payload).to_bytes(4, "little") + payload)
    img = b""
    want = width * height * 3
    while len(img) < want:
        chunk = s.recv(want - len(img))
        assert chunk, "server closed early"
        img += chunk
    n = int.from_bytes(s.recv(4), "little")
    path = s.recv(n).decode("ascii") if n else ""
    s.close()
    return np.frombuffer(img, np.uint8).reshape(height, width, 3), path


def test_network_gui_roundtrip():
    import jax.numpy as jnp

    from gaussian_splatting_tpu.ops.rasterize import RasterizerConfig
    from gaussian_splatting_tpu.scene.cameras import Camera
    from gaussian_splatting_tpu.scene.gaussians import create_from_pcd
    from gaussian_splatting_tpu.training import OptimizationConfig, init_train_state
    from gaussian_splatting_tpu.trainer import Trainer
    from gaussian_splatting_tpu.viewer.network_gui import NetworkGUI

    W = H = 32
    rng = np.random.default_rng(0)
    params, alive = create_from_pcd(
        rng.normal(0, 0.5, (32, 3)).astype(np.float32),
        rng.uniform(0.3, 0.8, (32, 3)).astype(np.float32),
        sh_degree=3,
        capacity=64,
    )
    cam = Camera(
        uid=0, colmap_id=0, R=np.eye(3), T=np.array([0.0, 0.0, 3.0]),
        fovx=math.radians(60), fovy=math.radians(60), image=None,
        image_name="v", width=W, height=H,
    )
    trainer = Trainer(cameras=[cam], raster_cfg=RasterizerConfig(backend="xla"),
                      opt=OptimizationConfig(iterations=1))
    trainer.state = init_train_state(params, alive)
    trainer.iteration = 1  # loop exit condition

    # Wire matrices in the reference's transposed layout with Y/Z flips
    # (network_gui.py:74-78): undo what receive() applies.
    ca = cam.arrays()
    wv = np.asarray(ca.viewmatrix).copy()
    wv[1] *= -1
    wv[2] *= -1
    fp = np.asarray(ca.projmatrix).copy()
    fp[1] *= -1
    view = wv.T.reshape(-1).tolist()
    viewproj = fp.T.reshape(-1).tolist()

    gui = NetworkGUI(port=0)  # ephemeral port
    port = gui.listener.getsockname()[1]
    gui.source_path = "/tmp/model"

    result = {}

    def client():
        result["img"], result["path"] = _client_request(port, W, H, view, viewproj)

    t = threading.Thread(target=client)
    t.start()
    # the listener is non-blocking; wait for the client to connect before
    # serving (train.py polls every iteration, so this race never matters
    # in the real loop)
    import time

    for _ in range(200):
        gui.try_connect()
        if gui.conn is not None:
            break
        time.sleep(0.05)
    gui.poll(trainer)
    t.join(timeout=30)
    assert not t.is_alive()
    assert result["path"] == "/tmp/model"
    assert result["img"].shape == (H, W, 3)
    # the splats must actually render (not an all-background frame)
    assert result["img"].max() > 0

    # compare against a direct render through the same camera
    from gaussian_splatting_tpu.training import eval_render
    import jax

    img_direct, _ = eval_render(
        trainer.state.params, trainer.state.alive,
        jax.tree.map(jnp.asarray, ca), trainer.background,
        3, 0, W, H, trainer.raster_cfg,
    )
    direct = (np.clip(np.asarray(img_direct), 0, 1) * 255).astype(np.uint8)
    assert np.abs(direct.astype(int) - result["img"].astype(int)).max() <= 1

    # --- scaling_modifier must reach the rasterizer (train.py:84): a 0.5
    # slider shrinks every splat, so the frame changes and covers less ---
    import time as _time

    res2 = {}

    def client2():
        res2["img"], _ = _client_request(port, W, H, view, viewproj,
                                         scaling_modifier=0.5)

    t2 = threading.Thread(target=client2)
    t2.start()
    for _ in range(200):
        gui.try_connect()
        if gui.conn is not None:
            break
        _time.sleep(0.05)
    gui.poll(trainer)
    t2.join(timeout=30)
    assert not t2.is_alive()
    assert not np.array_equal(res2["img"], result["img"])
    # shrunken splats light strictly fewer pixels
    assert (res2["img"].sum(-1) > 0).sum() < (result["img"].sum(-1) > 0).sum()
    # and match a direct render with the same modifier
    img_half, aux_half = eval_render(
        trainer.state.params, trainer.state.alive,
        jax.tree.map(jnp.asarray, ca), trainer.background,
        3, 0, W, H, trainer.raster_cfg, scale_modifier=0.5,
    )
    half = (np.clip(np.asarray(img_half), 0, 1) * 255).astype(np.uint8)
    assert np.abs(half.astype(int) - res2["img"].astype(int)).max() <= 1
    _, aux_full = eval_render(
        trainer.state.params, trainer.state.alive,
        jax.tree.map(jnp.asarray, ca), trainer.background,
        3, 0, W, H, trainer.raster_cfg, scale_modifier=1.0,
    )
    assert int(aux_half["num_entries"]) <= int(aux_full["num_entries"])

    # --- shs_python / rot_scale_python toggles (train.py:81-84) must reach
    # the precomp escape hatches and reproduce the fused-path frame ---
    res3 = {}

    def client3():
        res3["img"], _ = _client_request(port, W, H, view, viewproj,
                                         shs_python=True,
                                         rot_scale_python=True)

    t3 = threading.Thread(target=client3)
    t3.start()
    for _ in range(200):
        gui.try_connect()
        if gui.conn is not None:
            break
        _time.sleep(0.05)
    gui.poll(trainer)
    t3.join(timeout=30)
    assert not t3.is_alive()
    assert "img" in res3, "GUI dropped the toggled request"
    # same math, same rounding class: at most 1 uint8 count of drift
    assert np.abs(res3["img"].astype(int) - result["img"].astype(int)).max() <= 1
    # and the direct toggled render is bit-identical to the fused one
    img_tog, _ = eval_render(
        trainer.state.params, trainer.state.alive,
        jax.tree.map(jnp.asarray, ca), trainer.background,
        3, 0, W, H, trainer.raster_cfg,
        shs_python=True, rot_scale_python=True,
    )
    np.testing.assert_array_equal(np.asarray(img_tog), np.asarray(img_direct))
