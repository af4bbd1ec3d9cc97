"""Benchmark: 1080p novel-view render FPS on one TPU chip.

Baseline: the reference claims >= 30 fps at 1080p on a contemporary GPU
(README.md:14). vs_baseline = fps / 30.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Tunables via env: GS_BENCH_P (Gaussians), GS_BENCH_W/H, GS_BENCH_BACKEND.
"""

import json
import math
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gaussian_splatting_tpu.utils.general import enable_compilation_cache

    enable_compilation_cache()

    from gaussian_splatting_tpu.ops.rasterize import RasterizerConfig, rasterize
    from gaussian_splatting_tpu.scene.cameras import Camera

    P = int(os.environ.get("GS_BENCH_P", 262_144))
    W = int(os.environ.get("GS_BENCH_W", 1920))
    H = int(os.environ.get("GS_BENCH_H", 1080))
    backend = os.environ.get("GS_BENCH_BACKEND", "pallas")
    chunk = int(os.environ.get("GS_BENCH_CHUNK", 1024))
    cap_mult = int(os.environ.get("GS_BENCH_CAPMULT", 8))

    rng = np.random.default_rng(0)
    means = jnp.asarray(rng.normal(0, 1.0, (P, 3)), jnp.float32)
    scales = jnp.asarray(np.exp(rng.normal(-4.2, 0.5, (P, 3))), jnp.float32)
    quats = jnp.asarray(rng.normal(0, 1, (P, 4)), jnp.float32)
    opacities = jnp.asarray(1 / (1 + np.exp(-rng.normal(0.0, 1.0, (P,)))), jnp.float32)
    shs_np = rng.normal(0, 0.2, (P, 16, 3)).astype(np.float32)
    shs_np[:, 0, :] += 1.0
    shs = jnp.asarray(shs_np)

    cam = Camera(
        uid=0, colmap_id=0, R=np.eye(3), T=np.array([0.0, 0.0, 4.0]),
        fovx=math.radians(70), fovy=math.radians(70 * H / W), image=None,
        image_name="bench", width=W, height=H,
    ).arrays()
    cfg = RasterizerConfig(backend=backend, capacity_mult=cap_mult, chunk=chunk)
    bg = jnp.zeros(3, jnp.float32)

    def render():
        img, aux = rasterize(
            means, scales, quats, opacities, shs, 3, cam, W, H, bg, cfg
        )
        return img, aux

    img, aux = render()
    jax.block_until_ready(img)
    n_entries = int(aux["num_entries"])
    capacity = cfg.capacity(P)
    if n_entries > capacity:
        print(
            f"# warning: tile list clipped ({n_entries} > {capacity})",
            file=sys.stderr,
        )

    # warmup + timed runs
    for _ in range(3):
        img, _ = render()
    jax.block_until_ready(img)
    n_iters = int(os.environ.get("GS_BENCH_ITERS", 20))
    t0 = time.perf_counter()
    for _ in range(n_iters):
        img, _ = render()
    jax.block_until_ready(img)
    dt = (time.perf_counter() - t0) / n_iters
    fps = 1.0 / dt

    print(
        json.dumps(
            {
                "metric": f"render_fps_{W}x{H}_P{P}_{backend}",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / 30.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
