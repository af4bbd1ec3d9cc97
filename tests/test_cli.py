"""CLI end-to-end: train -> render -> metrics on a synthetic Blender scene.

The full reference workflow (train.py / render.py / metrics.py surfaces)
driven in-process with tiny settings.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    from make_synthetic_scene import make_blender_scene

    d = str(tmp_path_factory.mktemp("scene"))
    make_blender_scene(d, n_train=3, n_test=1)
    return d


def test_train_render_metrics(scene_dir, tmp_path):
    from gaussian_splatting_tpu.cli import metrics as metrics_cli
    from gaussian_splatting_tpu.cli import render as render_cli
    from gaussian_splatting_tpu.cli import train as train_cli

    model_dir = str(tmp_path / "model")
    train_cli.main(
        [
            "-s", scene_dir, "-m", model_dir,
            "--iterations", "20",
            "--test_iterations", "20",
            "--save_iterations", "20",
            "--checkpoint_iterations", "20",
            "--densify_from_iter", "1000",
            "--eval",
            "--disable_viewer",
            "--capacity_mult", "2",
        ]
    )
    ply_path = os.path.join(model_dir, "point_cloud/iteration_20/point_cloud.ply")
    assert os.path.exists(ply_path)
    assert os.path.exists(os.path.join(model_dir, "cfg_args"))
    assert os.path.exists(os.path.join(model_dir, "chkpnt20.pth"))

    render_cli.main(["-m", model_dir, "--skip_train"])
    out = os.path.join(model_dir, "test/ours_20")
    renders = os.listdir(os.path.join(out, "renders"))
    assert len(renders) == 1
    gts = os.listdir(os.path.join(out, "gt"))
    assert len(gts) == 1

    metrics_cli.main(["-m", model_dir])
    with open(os.path.join(model_dir, "results.json")) as f:
        results = json.load(f)
    m = results["ours_20"]
    assert 0.0 < m["SSIM"] <= 1.0
    assert m["PSNR"] > 5.0


def test_full_eval_arg_validation():
    """full_eval mirrors the reference CLI surface (full_eval.py:15-75):
    dataset paths are required unless every stage that needs them is
    skipped, and the all-skipped invocation is a no-op."""
    import pytest

    from gaussian_splatting_tpu.cli import full_eval

    full_eval.main([
        "--skip_training", "--skip_rendering", "--skip_metrics",
        "--output_path", "/tmp/nonexistent_eval",
    ])
    with pytest.raises(SystemExit):
        full_eval.main(["--output_path", "/tmp/nonexistent_eval"])


def test_render_cli_tile_policy_explicit_override(tmp_path, monkeypatch):
    """The render CLI applies default_tile_geometry for loaded models
    unless --tile_size/--tile_size_y appear on the command line (cfg_args'
    training-time tile size must not leak into inference)."""
    import gaussian_splatting_tpu.cli.render as render_cli

    captured = {}

    def fake_render_sets(dataset, iteration, pipe, skip_train=False,
                        skip_test=False, explicit_tiles=False):
        captured["explicit"] = explicit_tiles

    monkeypatch.setattr(render_cli, "render_sets", fake_render_sets)
    monkeypatch.setattr(render_cli, "safe_state", lambda q: None)
    monkeypatch.setattr(render_cli, "enable_compilation_cache", lambda: None)

    render_cli.main(["-m", str(tmp_path)])
    assert captured["explicit"] is False

    render_cli.main(["-m", str(tmp_path), "--tile_size", "16"])
    assert captured["explicit"] is True


def test_bench_default_scene_is_committed_ply():
    """bench.py's default scene is deterministic from a fresh clone: the
    committed trained model drives the headline metric (VERDICT r4 item
    5 -- the metric name must not switch silently between rounds)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_module", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    assert os.path.exists(bench.TRAINED_PLY), bench.TRAINED_PLY
    assert bench._default_scene() == "ply"
