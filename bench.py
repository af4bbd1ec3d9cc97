"""Benchmark: 1080p novel-view render FPS on one TPU chip.

Baseline: the reference claims >= 30 fps at 1080p on a contemporary GPU
(README.md:14). vs_baseline = fps / 30. The claim is about TRAINED
converged scenes, so the default bench renders the committed trained
model (assets/trained_r5.ply, trained on-chip by tools/bench_trained.sh);
GS_BENCH_SCENE=cloud|shell selects the synthetic stress proxies.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Tunables via env: GS_BENCH_P (Gaussians), GS_BENCH_W/H, GS_BENCH_BACKEND,
GS_BENCH_MODE=train (full train-step it/s instead of render fps; the
baseline there is ~20 it/s — 30k iterations in roughly 25 of the ~32
minutes the A6000 full_eval spends per scene, README.md:262).
"""

import json
import math
import os
import subprocess
import sys
import time

import numpy as np

# Committed last-known-good measurements, keyed by bench mode. Refreshed on
# every successful run; read back when the TPU tunnel is down so an outage
# degrades the evidence to "stale" instead of "absent" (round-2 lesson:
# BENCH_r02.json was an rc=1 backend failure with no number at all).
MEASURED_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "MEASURED.json")

# Committed trained model (bench_trained.sh: 400x400 synthetic scene, 3000
# iters with densification, PSNR 33.4). When present it is the DEFAULT
# bench scene: the reference's ">= 30 fps at 1080p" headline (README.md:14)
# is a claim about trained converged scenes — where opacity saturation
# drives the compositor's early exit — not about random stress clouds.
# GS_BENCH_SCENE=cloud|shell still selects the synthetic proxies.
TRAINED_PLY = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "assets", "trained_r5.ply"
)


def _default_scene():
    return "ply" if os.path.exists(TRAINED_PLY) else "cloud"


def main():
    """Retry wrapper: backend-init failures are cached per-process by the
    axon plugin, so each attempt runs in a fresh subprocess. On persistent
    failure, emit the committed last-known-good number marked stale."""
    if os.environ.get("GS_BENCH_INNER"):
        _run()
        return
    mode = os.environ.get("GS_BENCH_MODE", "render")
    scene = os.environ.get("GS_BENCH_SCENE") or _default_scene()
    if scene != "cloud":
        mode = f"{mode}_{scene}"  # separate last-known-good slot per scene
    retries = int(os.environ.get("GS_BENCH_RETRIES", 3))
    timeout_s = int(os.environ.get("GS_BENCH_TIMEOUT", 2400))
    last_tail = ""
    for attempt in range(retries):
        env = dict(os.environ, GS_BENCH_INNER="1")
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, timeout=timeout_s,
            )
            out_lines = (proc.stdout or "").strip().splitlines()
            result = None
            for line in out_lines:
                line = line.strip()
                if line.startswith("{"):
                    try:
                        cand = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    if "metric" in cand and "value" in cand:
                        result = cand
            if result is not None:
                if not os.environ.get("GS_BENCH_PLATFORM") and not os.environ.get(
                    "GS_BENCH_NOSAVE"
                ):
                    # Don't let CPU debug runs (or measure-script A/B arms,
                    # which set GS_BENCH_NOSAVE=1 on non-default flags)
                    # clobber the last-known-good TPU numbers.
                    _save_measured(mode, result)
                print(json.dumps(result))
                return
            last_tail = ((proc.stderr or "") + "\n" + (proc.stdout or ""))[-2000:]
        except subprocess.TimeoutExpired:
            last_tail = f"timeout after {timeout_s}s"
        print(
            f"# bench attempt {attempt + 1}/{retries} failed:\n{last_tail}",
            file=sys.stderr,
        )
        if attempt + 1 < retries:
            time.sleep(30)
    fallback = _load_measured(mode)
    err = last_tail.strip().splitlines()[-1][:300] if last_tail.strip() else "unknown"
    if fallback is not None:
        fallback = dict(fallback)
        fallback["error"] = err
        fallback["stale"] = True
        print(json.dumps(fallback))
    else:
        print(json.dumps({
            "metric": f"bench_{mode}", "value": 0.0, "unit": "n/a",
            "vs_baseline": 0.0, "error": err,
        }))
    sys.exit(0)


def _save_measured(mode, result):
    try:
        data = {}
        if os.path.exists(MEASURED_PATH):
            with open(MEASURED_PATH) as f:
                data = json.load(f)
        data[mode] = dict(result, measured_at=time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()))
        with open(MEASURED_PATH, "w") as f:
            json.dump(data, f, indent=2)
            f.write("\n")
    except OSError:
        pass


def _load_measured(mode):
    try:
        with open(MEASURED_PATH) as f:
            return json.load(f).get(mode)
    except (OSError, json.JSONDecodeError):
        return None


def _run():
    import jax

    if os.environ.get("GS_BENCH_PLATFORM"):
        # Debug/CI escape hatch (the axon plugin ignores JAX_PLATFORMS).
        jax.config.update("jax_platforms", os.environ["GS_BENCH_PLATFORM"])
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
    mode = os.environ.get("GS_BENCH_MODE", "render")
    scene = os.environ.get("GS_BENCH_SCENE") or _default_scene()
    os.environ["GS_BENCH_SCENE"] = scene  # downstream metric names read it
    # Measured tile winner: 32x32 at every round-5 operating point
    # (rasterize.default_tile_geometry has the table).
    from gaussian_splatting_tpu.ops.rasterize import default_tile_geometry

    dtw, dth = default_tile_geometry(
        converged=(scene == "ply"), training=(mode == "train")
    )
    tile_w = int(os.environ.get("GS_BENCH_TILE_W", dtw))
    tile_h = int(os.environ.get("GS_BENCH_TILE_H", dth))

    rng = np.random.default_rng(0)
    shs = None
    if scene == "ply":
        # Benchmark a TRAINED model (the honest form of the reference's
        # ">= 30 fps at 1080p" claim, README.md:14, which is about real
        # converged scenes): load a point_cloud.ply saved by train.py
        # (GS_BENCH_PLY=<path>), apply the standard activations, and
        # auto-frame a novel-view camera on the scene's bounding sphere.
        from gaussian_splatting_tpu.scene.ply import load_gaussians_ply

        raw = load_gaussians_ply(os.environ.get("GS_BENCH_PLY", TRAINED_PLY))
        means_np = raw["xyz"]
        center = means_np.mean(axis=0)
        radius = float(np.quantile(np.linalg.norm(means_np - center, axis=1), 0.95))
        means = jnp.asarray(means_np - center, jnp.float32)
        scales = jnp.asarray(np.exp(raw["scaling"]), jnp.float32)
        quats = jnp.asarray(raw["rotation"], jnp.float32)
        opacities = jnp.asarray(
            1.0 / (1.0 + np.exp(-raw["opacity"][:, 0])), jnp.float32
        )
        shs = jnp.asarray(
            np.concatenate([raw["features_dc"], raw["features_rest"]], axis=1),
            jnp.float32,
        )
        P = means.shape[0]
        cam_dist = float(os.environ.get("GS_BENCH_CAM_DIST", 2.5 * radius))
    elif scene == "shell":
        # Trained-scene proxy: an opaque surface shell (splats on a sphere,
        # opacity ~0.9, small anisotropic footprints). Front-to-back
        # transmittance saturates after a handful of entries, exercising
        # the kernels' whole-chunk early-exit path the way a converged
        # real scene does; the default "cloud" (semi-transparent volume)
        # is the early-exit worst case and stays the headline metric.
        d = rng.normal(size=(P, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        means_np = (1.5 * d + rng.normal(0, 0.01, (P, 3))).astype(np.float32)
        means = jnp.asarray(means_np)
        scales = jnp.asarray(np.exp(rng.normal(-4.8, 0.3, (P, 3))), jnp.float32)
        quats = jnp.asarray(rng.normal(0, 1, (P, 4)), jnp.float32)
        opacities = jnp.asarray(
            1 / (1 + np.exp(-rng.normal(2.5, 0.8, (P,)))), jnp.float32
        )
    else:
        means = jnp.asarray(rng.normal(0, 1.0, (P, 3)), jnp.float32)
        scales = jnp.asarray(np.exp(rng.normal(-4.2, 0.5, (P, 3))), jnp.float32)
        quats = jnp.asarray(rng.normal(0, 1, (P, 4)), jnp.float32)
        opacities = jnp.asarray(
            1 / (1 + np.exp(-rng.normal(0.0, 1.0, (P,)))), jnp.float32
        )
    if shs is None:
        shs_np = rng.normal(0, 0.2, (P, 16, 3)).astype(np.float32)
        shs_np[:, 0, :] += 1.0
        shs = jnp.asarray(shs_np)
        cam_dist = 4.0

    cam = Camera(
        uid=0, colmap_id=0, R=np.eye(3), T=np.array([0.0, 0.0, cam_dist]),
        fovx=math.radians(70), fovy=math.radians(70 * H / W), image=None,
        image_name="bench", width=W, height=H,
    ).arrays()
    bg = jnp.zeros(3, jnp.float32)

    # Probe the true tile-list entry count (== sum of tiles_touched) with a
    # cheap preprocess-only jit, then size the capacity to hold ALL entries
    # (+2% headroom). An undersized static capacity silently drops
    # Gaussians from the image, which would make the timing dishonest.
    from gaussian_splatting_tpu.ops.projection import preprocess

    @jax.jit
    def count_entries():
        prep = preprocess(
            means, scales, quats, opacities, shs, 3, cam, W, H,
            tile_w, tile_h,
        )
        return jnp.sum(prep.tiles_touched)

    n_entries = int(count_entries())
    # Snap to a coarse bucket grid: compiled-binary quality is chaotically
    # shape-sensitive at fine granularity (measured: K=2962176 renders 36%
    # slower than K=2960640), and coarse buckets are also what training's
    # capacity growth uses. 2^16 is the round-5 winner (2^15 is a plateau,
    # 2^17/2^18 pad too much, MEASURE_r5.log / MEASURE_r3e.log) — less
    # padding means every K-sized stage (expand, sort, gather, kernel
    # grid) runs closer to the true entry count.
    bucket = 1 << int(os.environ.get("GS_BENCH_BUCKET_BITS", 16))
    # No 8*P floor: at large tiles the true entry count can sit well below
    # 8P, and every K-sized stage (expand, sort, gather, kernel grid) runs
    # at the CAPACITY shape, so an inflated floor taxes the whole frame.
    capacity = max(bucket, -(int(n_entries * 1.02) // -bucket) * bucket)
    if "GS_BENCH_CAPMULT" in os.environ:
        capacity = cap_mult * P
        if n_entries > capacity:
            print(
                f"# warning: tile list clipped ({n_entries} > {capacity})",
                file=sys.stderr,
            )
    cfg = RasterizerConfig(
        backend=backend, capacity_exact=capacity, chunk=chunk,
        tile_w=tile_w, tile_h=tile_h,
    )

    if mode == "train":
        _bench_train(jax, jnp, P, W, H, cfg, means, scales, quats,
                     opacities, shs)
        return

    # Timing methodology: per-dispatch host overhead through the remote-TPU
    # tunnel is ~100+ ms and execution is lazy until a value is pulled, so
    # per-call wall timing measures the tunnel, not the chip. Instead we
    # scan a chain of renders inside ONE jit (frame i's bg depends on frame
    # i-1's image, forcing sequential execution) and pull one scalar; the
    # single dispatch+sync is amortized over the chain.
    n_iters = int(os.environ.get("GS_BENCH_ITERS", 10))
    from functools import partial

    @jax.jit
    def chain(bg_in):
        def body(carry, _):
            img = rasterize(
                means, scales, quats, opacities, shs, 3, cam, W, H,
                carry, cfg, return_aux=False,
            )
            return img[0, 0] * 0.0 + carry, None
        out, _ = jax.lax.scan(body, bg_in, None, length=n_iters)
        return out.sum()

    float(chain(bg))  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(bg))
        times.append(time.perf_counter() - t0)
    dt = min(times) / n_iters
    fps = 1.0 / dt

    print(
        json.dumps(
            {
                "metric": f"render_fps_{W}x{H}_P{P}_{backend}"
                + ("" if scene == "cloud" else f"_{scene}"),
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / 30.0, 4),
            }
        )
    )


def _bench_train(jax, jnp, P, W, H, cfg, means, scales, quats, opacities, shs):
    """Full train step (render + L1/SSIM loss + backward + masked Adam)."""
    from functools import partial

    from gaussian_splatting_tpu.scene.cameras import Camera
    from gaussian_splatting_tpu.scene.gaussians import GaussianParams
    from gaussian_splatting_tpu.training import (
        OptimizationConfig, init_train_state, train_step,
    )

    rng = np.random.default_rng(1)
    params = GaussianParams(
        xyz=means,
        features_dc=shs[:, :1],
        features_rest=shs[:, 1:],
        scaling=jnp.log(scales),
        rotation=quats,
        opacity=jnp.log(opacities / (1.0 - opacities))[:, None],
    )
    state = init_train_state(params, np.ones((P,), bool))
    cam = jax.tree.map(jnp.asarray, Camera(
        uid=0, colmap_id=0, R=np.eye(3), T=np.array([0.0, 0.0, 4.0]),
        fovx=math.radians(70), fovy=math.radians(70 * H / W), image=None,
        image_name="bench", width=W, height=H,
    ).arrays())
    gt = jnp.asarray(rng.uniform(size=(H, W, 3)), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)
    step = partial(
        train_step, sh_degree=3, active_sh_degree=3, width=W, height=H,
        raster_cfg=cfg, opt=OptimizationConfig(), spatial_lr_scale=1.0,
    )

    n_iters = int(os.environ.get("GS_BENCH_ITERS", 10))

    @jax.jit
    def chain(s0):
        def body(s, i):
            s2, m = step(s, cam, gt, bg, i + 2)
            return s2, m["loss"]
        _, ls = jax.lax.scan(body, s0, jnp.arange(n_iters, dtype=jnp.int32))
        return ls[-1]

    float(chain(state))  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(state))
        times.append(time.perf_counter() - t0)
    dt = min(times) / n_iters
    print(json.dumps({
        "metric": f"train_its_{W}x{H}_P{P}_{cfg.backend}"
        + ("" if os.environ.get("GS_BENCH_SCENE", "cloud") == "cloud"
           else "_" + os.environ["GS_BENCH_SCENE"]),
        "value": round(1.0 / dt, 3),
        "unit": "iters/s",
        "vs_baseline": round((1.0 / dt) / 20.0, 4),
    }))


if __name__ == "__main__":
    main()
