"""Reflection-based CLI flag groups — the arguments/ system.

Same surface as the reference (arguments/__init__.py:19-130): dataclass
fields become argparse flags, names listed in `SHORTHAND` also get a
one-letter short flag, bools become store_true. `get_combined_args`
merges the persisted cfg_args from a trained model dir with CLI overrides
— parsed safely (the reference `eval()`s the file, :124; we parse the
repr'd Namespace without executing it).
"""

from __future__ import annotations

import ast
import os
import sys
from argparse import ArgumentParser, Namespace
from dataclasses import dataclass, field, fields


class ParamGroup:
    SHORTHAND: tuple = ()

    @classmethod
    def add_to_parser(cls, parser: ArgumentParser, name: str, fill_none: bool = False):
        group = parser.add_argument_group(name)
        for f in fields(cls):
            default = None if fill_none else f.default
            flag = "--" + f.name
            args = (flag, "-" + f.name[0]) if f.name in cls.SHORTHAND else (flag,)
            if f.type in (bool, "bool"):
                group.add_argument(*args, default=default, action="store_true")
            else:
                t = {"int": int, "float": float, "str": str}.get(f.type, f.type)
                group.add_argument(*args, default=default, type=t)

    @classmethod
    def extract(cls, args: Namespace):
        kwargs = {f.name: getattr(args, f.name) for f in fields(cls) if hasattr(args, f.name)}
        return cls(**kwargs)


@dataclass
class ModelParams(ParamGroup):
    """arguments/__init__.py:62-80."""

    SHORTHAND = ("source_path", "model_path", "images", "resolution", "white_background")

    sh_degree: int = 3
    source_path: str = ""
    model_path: str = ""
    images: str = "images"
    resolution: int = -1
    white_background: bool = False
    data_device: str = "tpu"
    eval: bool = False

    @classmethod
    def extract(cls, args: Namespace):
        g = super().extract(args)
        g.source_path = os.path.abspath(g.source_path)
        return g


@dataclass
class PipelineParams(ParamGroup):
    """arguments/__init__.py:82-87 + TPU-specific pipeline knobs."""

    SHORTHAND = ()

    # Accepted for reference CLI compatibility. In the reference these
    # switch SH/cov3D evaluation from CUDA to torch (gaussian_renderer/
    # __init__.py:79-99); here the whole pipeline is one jitted program, so
    # there is no separate "python side" — the equivalent escape hatches
    # are rasterize()'s colors_precomp / cov3d_precomp inputs.
    convert_SHs_python: bool = False
    compute_cov3D_python: bool = False
    debug: bool = False
    backend: str = "auto"  # "auto" | "xla" | "pallas" | "reference"
    # Tile shape. The reference's 16x16 (config.h:15-17) is a CUDA
    # blocking choice; on TPU the frame cost is dominated by K-sized
    # stream stages (sort/gather/expand scale with the number of tile
    # entries), so LARGER tiles win for TRAINING at every measured
    # point (cloud 8.81 vs 7.60 it/s at 32x32 vs 32x16, MEASURE_r5.log;
    # trained scene 12.2 vs 9.0) — the backward's gradient-routing sort
    # and drec traffic scale with K. rasterize.default_tile_geometry
    # holds the full measured policy; inference rendering picks its own
    # geometry there. tile_size_y = 0 means "same as tile_size".
    tile_size: int = 32
    tile_size_y: int = 32
    capacity_mult: int = 8
    # scenes, but its expansion columns + bitmap loop cost more than the
    # entry reduction saves at the benchmark operating point (round-3


@dataclass
class OptimizationParams(ParamGroup):
    """arguments/__init__.py:89-108 — defaults preserved verbatim."""

    SHORTHAND = ()

    iterations: int = 30_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002
    random_background: bool = False


def parse_namespace_repr(s: str) -> Namespace:
    """Safely parse `repr(Namespace(...))` without eval."""
    s = s.strip()
    prefix, suffix = "Namespace(", ")"
    if not (s.startswith(prefix) and s.endswith(suffix)):
        return Namespace()
    body = s[len(prefix) : -1]
    # Parse as a call expression's keyword list via ast.
    tree = ast.parse(f"f({body})", mode="eval")
    kwargs = {}
    for kw in tree.body.keywords:  # type: ignore[attr-defined]
        kwargs[kw.arg] = ast.literal_eval(kw.value)
    return Namespace(**kwargs)


def get_combined_args(parser: ArgumentParser, argv=None) -> Namespace:
    """arguments/__init__.py:110-130 behavior with safe parsing."""
    cmdline = parser.parse_args(sys.argv[1:] if argv is None else argv)
    cfg_ns = Namespace()
    try:
        cfgfilepath = os.path.join(cmdline.model_path, "cfg_args")
        print("Looking for config file in", cfgfilepath)
        with open(cfgfilepath) as f:
            print(f"Config file found: {cfgfilepath}")
            cfg_ns = parse_namespace_repr(f.read())
    except (TypeError, FileNotFoundError):
        print("Config file not found")
    merged = vars(cfg_ns).copy()
    for k, v in vars(cmdline).items():
        if v is not None:
            merged[k] = v
    return Namespace(**merged)


def write_cfg_args(model_path: str, args: Namespace):
    """train.py:194-197: persist the run config."""
    os.makedirs(model_path, exist_ok=True)
    with open(os.path.join(model_path, "cfg_args"), "w") as f:
        f.write(str(Namespace(**vars(args))))


def resolve_backend(backend: str) -> str:
    """'auto' picks the Pallas fast path on TPU, the XLA path elsewhere."""
    if backend != "auto":
        return backend
    import jax

    return "pallas" if jax.default_backend() == "tpu" else "xla"
