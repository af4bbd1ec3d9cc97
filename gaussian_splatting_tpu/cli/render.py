"""Offline rendering CLI — same surface as the reference render.py.

    python -m gaussian_splatting_tpu.cli.render -m <model> [--iteration N]

Renders train+test cameras of a trained model to PNGs under
<model>/{train,test}/ours_<iter>/{renders,gt}/NNNNN.png (render.py:24-35).
"""

from __future__ import annotations

import os
import sys
from argparse import ArgumentParser

import numpy as np

from gaussian_splatting_tpu.config import (
    ModelParams,
    PipelineParams,
    get_combined_args,
    resolve_backend,
)
from gaussian_splatting_tpu.ops.rasterize import RasterizerConfig
from gaussian_splatting_tpu.scene.gaussians import GaussianParams, capacity_bucket
from gaussian_splatting_tpu.scene.scene import Scene
from gaussian_splatting_tpu.training import eval_render
from gaussian_splatting_tpu.utils.general import enable_compilation_cache, mkdir_p, safe_state


def _save_png(path: str, img: np.ndarray):
    import imageio

    imageio.imwrite(path, (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8))


def load_model_padded(scene: Scene, min_capacity: int = 1024):
    """Load a trained PLY into a padded (params, alive) pair."""
    import jax.numpy as jnp

    raw = scene.load_gaussians()
    n = raw["xyz"].shape[0]
    cap = capacity_bucket(n, min_capacity)

    def pad(x, fill=0.0):
        out = np.full((cap,) + x.shape[1:], fill, np.float32)
        out[:n] = x
        return out

    params = GaussianParams(
        xyz=jnp.asarray(pad(raw["xyz"])),
        features_dc=jnp.asarray(pad(raw["features_dc"])),
        features_rest=jnp.asarray(pad(raw["features_rest"])),
        scaling=jnp.asarray(pad(raw["scaling"], -10.0)),
        rotation=jnp.asarray(pad(raw["rotation"])),
        opacity=jnp.asarray(pad(raw["opacity"], -10.0)),
    )
    alive = np.zeros((cap,), bool)
    alive[:n] = True
    return params, jnp.asarray(alive)


def auto_capacity(params, alive, views, raster_cfg, sh_degree, bits=16):
    """Entry-driven tile-list capacity: probe the true entry count of each
    view with a preprocess-only jit, bucket the max (ops/rasterize.py::
    entry_bucket_capacity) — so every K-sized stage runs near the true
    entry count instead of a P-multiple (bench-measured +7% render)."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    from gaussian_splatting_tpu.ops.projection import preprocess
    from gaussian_splatting_tpu.ops.rasterize import entry_bucket_capacity
    from gaussian_splatting_tpu.scene.gaussians import activate

    @partial(jax.jit, static_argnames=("w", "h", "tw", "th", "sh"))
    def count(params, alive, cam, w, h, tw, th, sh):
        acts = activate(params)
        prep = preprocess(
            acts.xyz, acts.scales, acts.quats, acts.opacities, acts.shs,
            sh, cam, w, h, tw, th, alive=alive,
        )
        return jnp.sum(prep.tiles_touched)

    worst = 0
    for view in views:
        cam = jax.tree.map(jnp.asarray, view.arrays())
        worst = max(worst, int(count(
            params, alive, cam, view.width, view.height,
            raster_cfg.tile_w, raster_cfg.tile_h,
            sh_degree,
        )))
    return entry_bucket_capacity(worst, bits)


def render_set(model_path, name, iteration, views, params, alive, bg, sh_degree, raster_cfg):
    import jax
    import jax.numpy as jnp

    render_path = os.path.join(model_path, name, f"ours_{iteration}", "renders")
    gts_path = os.path.join(model_path, name, f"ours_{iteration}", "gt")
    mkdir_p(render_path)
    mkdir_p(gts_path)

    for idx, view in enumerate(views):
        cam = jax.tree.map(jnp.asarray, view.arrays())
        img, _ = eval_render(
            params, alive, cam, bg, sh_degree, sh_degree,
            view.width, view.height, raster_cfg,
        )
        _save_png(os.path.join(render_path, f"{idx:05d}.png"), np.asarray(img))
        _save_png(
            os.path.join(gts_path, f"{idx:05d}.png"),
            view.image.transpose(1, 2, 0),
        )
        print(f"\rRendering {name} {idx + 1}/{len(views)}", end="")
    print()


def render_sets(dataset, iteration, pipe, skip_train=False, skip_test=False,
                explicit_tiles=False):
    import jax.numpy as jnp

    scene = Scene(
        source_path=dataset.source_path,
        model_path=dataset.model_path,
        images=dataset.images,
        eval_split=dataset.eval,
        white_background=dataset.white_background,
        resolution=dataset.resolution,
        load_iteration=iteration,
        shuffle=False,
        sh_degree=dataset.sh_degree,
    )
    params, alive = load_model_padded(scene)
    bg = jnp.asarray([1.0, 1.0, 1.0] if dataset.white_background else [0.0, 0.0, 0.0])
    # Inference renders a CONVERGED model: the measured tile winner is
    # 32x32, not training's 32x16 (rasterize.default_tile_geometry).
    # cfg_args carries the TRAINING-time tile size, so it must not leak
    # into inference; an explicit --tile_size on THIS command line wins.
    if explicit_tiles:
        tile_w, tile_h = pipe.tile_size, (pipe.tile_size_y or pipe.tile_size)
    else:
        from gaussian_splatting_tpu.ops.rasterize import default_tile_geometry

        tile_w, tile_h = default_tile_geometry(converged=True)
    raster_cfg = RasterizerConfig(
        tile_w=tile_w,
        tile_h=tile_h,
        capacity_mult=pipe.capacity_mult, backend=resolve_backend(pipe.backend),
    )
    views = (
        ([] if skip_train else scene.get_train_cameras())
        + ([] if skip_test else scene.get_test_cameras())
    )
    if views:
        from dataclasses import replace as _dc_replace

        cap = auto_capacity(params, alive, views, raster_cfg, dataset.sh_degree)
        raster_cfg = _dc_replace(raster_cfg, capacity_exact=cap)
    if not skip_train:
        render_set(
            dataset.model_path, "train", scene.loaded_iter,
            scene.get_train_cameras(), params, alive, bg, dataset.sh_degree, raster_cfg,
        )
    if not skip_test:
        render_set(
            dataset.model_path, "test", scene.loaded_iter,
            scene.get_test_cameras(), params, alive, bg, dataset.sh_degree, raster_cfg,
        )


def main(argv=None):
    parser = ArgumentParser(description="Testing script parameters")
    ModelParams.add_to_parser(parser, "Loading Parameters", fill_none=True)
    PipelineParams.add_to_parser(parser, "Pipeline Parameters")
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--quiet", action="store_true")
    args = get_combined_args(parser, argv)
    print("Rendering " + args.model_path)
    safe_state(args.quiet)
    enable_compilation_cache()
    # fill_none leaves unset flags as None; restore dataclass defaults
    for f, default in (("sh_degree", 3), ("images", "images"), ("resolution", -1),
                       ("white_background", False), ("eval", False), ("data_device", "tpu")):
        if getattr(args, f, None) is None:
            setattr(args, f, default)
    if getattr(args, "backend", None) is None:
        args.backend = "auto"
    if getattr(args, "tile_size", None) is None:
        args.tile_size = 32
    if getattr(args, "tile_size_y", None) is None:
        args.tile_size_y = 16
    if getattr(args, "capacity_mult", None) is None:
        args.capacity_mult = 8
    explicit_tiles = any(
        a.split("=")[0] in ("--tile_size", "--tile_size_y")
        for a in (sys.argv[1:] if argv is None else argv)
    )
    render_sets(
        ModelParams.extract(args),
        args.iteration,
        PipelineParams.extract(args),
        skip_train=args.skip_train,
        skip_test=args.skip_test,
        explicit_tiles=explicit_tiles,
    )


if __name__ == "__main__":
    main()
