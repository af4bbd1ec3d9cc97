"""Evaluation CLI — SSIM/PSNR/LPIPS over rendered-vs-GT image dirs.

Same surface as the reference metrics.py:36-103: walks
<model>/test/ours_<iter>/{renders,gt}, writes results.json + per_view.json.
LPIPS uses the torch-free reimplementation in ops/lpips.py when VGG
weights are available, else reports null (the reference downloads weights
from GitHub, which a zero-egress environment cannot).
"""

from __future__ import annotations

import json
import os
from argparse import ArgumentParser
from pathlib import Path

import numpy as np


def read_images(renders_dir, gt_dir):
    import imageio

    renders, gts, names = [], [], []
    for fname in sorted(os.listdir(renders_dir)):
        r = np.asarray(imageio.imread(renders_dir / fname), np.float32) / 255.0
        g = np.asarray(imageio.imread(gt_dir / fname), np.float32) / 255.0
        renders.append(r[..., :3])
        gts.append(g[..., :3])
        names.append(fname)
    return renders, gts, names


def evaluate(model_paths, lpips_net="vgg"):
    import jax.numpy as jnp

    from gaussian_splatting_tpu.ops import losses
    from gaussian_splatting_tpu.ops.lpips import lpips, lpips_available

    full_dict = {}
    per_view_dict = {}
    for scene_dir in model_paths:
        try:
            print("Scene:", scene_dir)
            full_dict[scene_dir] = {}
            per_view_dict[scene_dir] = {}
            test_dir = Path(scene_dir) / "test"
            for method in os.listdir(test_dir):
                print("Method:", method)
                full_dict[scene_dir][method] = {}
                per_view_dict[scene_dir][method] = {}
                method_dir = test_dir / method
                renders, gts, names = read_images(method_dir / "renders", method_dir / "gt")

                ssims, psnrs, lpipss = [], [], []
                use_lpips = lpips_available(lpips_net)
                for r, g in zip(renders, gts):
                    rj, gj = jnp.asarray(r), jnp.asarray(g)
                    ssims.append(float(losses.ssim(rj, gj)))
                    psnrs.append(float(losses.psnr(rj, gj)))
                    if use_lpips:
                        lpipss.append(float(lpips(rj, gj, lpips_net)))
                print(f"  SSIM : {np.mean(ssims):.7f}")
                print(f"  PSNR : {np.mean(psnrs):.7f}")
                if use_lpips:
                    print(f"  LPIPS: {np.mean(lpipss):.7f}")

                full_dict[scene_dir][method].update(
                    {
                        "SSIM": float(np.mean(ssims)),
                        "PSNR": float(np.mean(psnrs)),
                        "LPIPS": float(np.mean(lpipss)) if use_lpips else None,
                    }
                )
                per_view_dict[scene_dir][method].update(
                    {
                        "SSIM": dict(zip(names, map(float, ssims))),
                        "PSNR": dict(zip(names, map(float, psnrs))),
                        "LPIPS": dict(zip(names, map(float, lpipss))) if use_lpips else {},
                    }
                )
            with open(scene_dir + "/results.json", "w") as fp:
                json.dump(full_dict[scene_dir], fp, indent=True)
            with open(scene_dir + "/per_view.json", "w") as fp:
                json.dump(per_view_dict[scene_dir], fp, indent=True)
        except Exception as e:
            print(f"Unable to compute metrics for model {scene_dir}: {e}")
    return full_dict


def main(argv=None):
    parser = ArgumentParser(description="Training script parameters")
    parser.add_argument(
        "--model_paths", "-m", required=True, nargs="+", type=str, default=[]
    )
    parser.add_argument(
        "--lpips_net", choices=["vgg", "alex", "squeeze"], default="vgg",
        help="LPIPS backbone (the reference's metrics.py uses vgg)",
    )
    args = parser.parse_args(argv)
    evaluate(args.model_paths, lpips_net=args.lpips_net)


if __name__ == "__main__":
    main()
