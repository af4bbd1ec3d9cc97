"""Host-side training driver: the analog of train.py:31-180.

Owns the things that must stay off-device: camera sampling (random pop
from a shuffled stack, train.py:105-108), SH-degree warmup every 1000
iters (train.py:100-101), the densify/prune/reset cadence
(train.py:151-169, executed in numpy at 100-iter intervals), capacity
bucket growth (the static-shape answer to torch tensor resizing), and
checkpointing.
"""

from __future__ import annotations

import math
import pickle
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.ops.rasterize import RasterizerConfig
from gaussian_splatting_tpu.scene import densify as densify_mod
from gaussian_splatting_tpu.scene.cameras import Camera
from gaussian_splatting_tpu.scene.gaussians import (
    GaussianParams,
    capacity_bucket,
    create_from_pcd,
)
from gaussian_splatting_tpu.scene.optim import AdamState, init_adam
from gaussian_splatting_tpu.training import (
    OptimizationConfig,
    TrainState,
    init_train_state,
    train_step,
)

PARAM_NAMES = ("xyz", "features_dc", "features_rest", "scaling", "rotation", "opacity")


def _state_to_host(state: TrainState):
    """Pull live rows to host numpy dicts (params + adam moments)."""
    alive = np.asarray(state.alive)
    idx = np.nonzero(alive)[0]
    params = {k: np.asarray(getattr(state.params, k))[idx] for k in PARAM_NAMES}
    m = {k: np.asarray(getattr(state.adam.m, k))[idx] for k in PARAM_NAMES}
    v = {k: np.asarray(getattr(state.adam.v, k))[idx] for k in PARAM_NAMES}
    stats = dict(
        max_radii2d=np.asarray(state.max_radii2d)[idx],
        xyz_grad_accum=np.asarray(state.xyz_grad_accum)[idx],
        denom=np.asarray(state.denom)[idx],
    )
    return params, m, v, stats, int(np.asarray(state.adam.step))


def _state_from_host(params, m, v, step, capacity: int, min_capacity: int) -> TrainState:
    n = params["xyz"].shape[0]
    cap = max(capacity_bucket(n, min_capacity), capacity)

    def pad(x, fill=0.0):
        out = np.full((cap,) + x.shape[1:], fill, np.float32)
        out[:n] = x
        return out

    fills = dict(xyz=0.0, features_dc=0.0, features_rest=0.0, scaling=-10.0,
                 rotation=0.0, opacity=-10.0)
    gp = GaussianParams(**{k: jnp.asarray(pad(params[k], fills[k])) for k in PARAM_NAMES})
    gm = GaussianParams(**{k: jnp.asarray(pad(m[k])) for k in PARAM_NAMES})
    gv = GaussianParams(**{k: jnp.asarray(pad(v[k])) for k in PARAM_NAMES})
    alive = np.zeros((cap,), bool)
    alive[:n] = True
    N = cap
    return TrainState(
        params=gp,
        adam=AdamState(m=gm, v=gv, step=jnp.asarray(step, jnp.int32)),
        alive=jnp.asarray(alive),
        max_radii2d=jnp.zeros((N,), jnp.float32),
        xyz_grad_accum=jnp.zeros((N,), jnp.float32),
        denom=jnp.zeros((N,), jnp.float32),
    )


@dataclass
class Trainer:
    cameras: List[Camera]
    opt: OptimizationConfig = field(default_factory=OptimizationConfig)
    raster_cfg: RasterizerConfig = field(default_factory=RasterizerConfig)
    sh_degree: int = 3
    white_background: bool = False
    cameras_extent: float = 1.0
    spatial_lr_scale: float = 1.0
    min_capacity: int = 1024
    seed: int = 0
    # Entry-driven tile-list capacity (the analog of the reference's
    # dynamic arena, rasterize_points.cu:28-36): size the entry budget
    # from the MEASURED per-frame entry count instead of a multiple of P,
    # so training never pays 2x sort/gather/expand/kernel-grid padding
    # after a P-bucket doubling. The first step probes the count with a
    # cheap preprocess-only jit; thereafter the budget grows immediately
    # on overflow and is re-fit (grow or shrink) on the densify cadence
    # from the window max. Buckets are 2^entry_bucket_bits above that
    # size and power-of-two below it (2^16 is the round-5 measured
    # winner; see ops/rasterize.entry_bucket_capacity). Set False to
    # restore the fixed capacity_mult * P policy.
    auto_capacity: bool = True
    entry_bucket_bits: int = 16
    # Jitted in-place densification at fixed capacity (host fallback only
    # on capacity-bucket growth). Disable to force the numpy path.
    device_densify: bool = True
    # Optional jax.sharding.Mesh: parameters/optimizer rows sharded by
    # Gaussian, tile rows by device (parallel/sharding.py). The device
    # densify runs on the sharded state under jit; host fallbacks
    # re-place the rebuilt state on the mesh.
    mesh: object = None
    log_every: int = 50
    log_fn: Callable[[int, dict], None] = lambda it, m: None
    # On a non-finite loss, dump the full input snapshot for offline repro
    # (the analog of the reference's snapshot_fw.dump,
    # diff_gaussian_rasterization/__init__.py:87-94) and raise.
    debug_dump_path: str = "snapshot_step.dump"
    # With debug=True, ANY exception raised by the jitted step also dumps
    # the snapshot before re-raising — the analog of the reference's
    # pipe.debug dump-on-exception path (train.py:112-113 flips this on at
    # --debug_from via the CLI).
    debug: bool = False

    def __post_init__(self):
        self.rng = np.random.default_rng(self.seed)
        self.py_rng_stack: List[int] = []
        self.iteration = 0
        self.active_sh_degree = 0
        self.state: Optional[TrainState] = None
        bg = [1.0, 1.0, 1.0] if self.white_background else [0.0, 0.0, 0.0]
        self.background = jnp.asarray(bg, jnp.float32)
        self.history: List[dict] = []
        self._sharded_steps = {}
        # max entry count observed since the last capacity re-fit
        self._entry_window_max = 0

    def _place(self, state: TrainState) -> TrainState:
        """Put a (re)built state on the mesh, if any."""
        if self.mesh is None:
            return state
        from gaussian_splatting_tpu.parallel import sharding

        return sharding.shard_train_state(state, self.mesh)

    # ---- setup ----
    def init_from_pcd(self, points: np.ndarray, colors: np.ndarray):
        cap = capacity_bucket(points.shape[0], self.min_capacity)
        params, alive = create_from_pcd(points, colors, self.sh_degree, capacity=cap)
        self.state = self._place(init_train_state(params, alive))

    def _pop_camera(self) -> Camera:
        if not self.py_rng_stack:
            self.py_rng_stack = list(range(len(self.cameras)))
        i = self.py_rng_stack.pop(int(self.rng.integers(len(self.py_rng_stack))))
        return self.cameras[i]

    @property
    def num_live(self) -> int:
        return int(np.asarray(self.state.alive).sum())

    # ---- entry-driven capacity (see auto_capacity above) ----
    def _entry_capacity(self, n_entries: int) -> int:
        from gaussian_splatting_tpu.ops.rasterize import entry_bucket_capacity

        return entry_bucket_capacity(n_entries, self.entry_bucket_bits)

    def _set_capacity(self, cap: int):
        from dataclasses import replace as _dc_replace

        if self.raster_cfg.capacity_exact != cap:
            self.raster_cfg = _dc_replace(self.raster_cfg, capacity_exact=cap)

    def _probe_entries(self, cam_arrays, width: int, height: int) -> int:
        """True tile-list entry count for this view: a preprocess-only jit
        (no binning/compositing), the same probe bench.py uses. Costs one
        small compile per (P-capacity, resolution) pair."""
        from gaussian_splatting_tpu.ops.projection import preprocess
        from gaussian_splatting_tpu.scene.gaussians import activate

        cfg = self.raster_cfg

        @partial(jax.jit, static_argnames=("w", "h", "tw", "th", "sh"))
        def count(params, alive, cam, w, h, tw, th, sh):
            acts = activate(params)
            prep = preprocess(
                acts.xyz, acts.scales, acts.quats, acts.opacities, acts.shs,
                sh, cam, w, h, tw, th, alive=alive,
            )
            return jnp.sum(prep.tiles_touched)

        return int(count(
            self.state.params, self.state.alive, cam_arrays, width, height,
            cfg.tile_w, cfg.tile_h, self.active_sh_degree,
        ))

    # ---- the loop ----
    def train(self, iterations: Optional[int] = None, progress: bool = False):
        total = iterations if iterations is not None else self.opt.iterations
        end = self.iteration + total
        while self.iteration < end:
            self.step()
            if progress and self.iteration % self.log_every == 0:
                m = self.history[-1]
                print(
                    f"it {self.iteration}: loss {m['loss']:.4f} psnr {m['psnr']:.2f} "
                    f"P {self.num_live} entries {m['num_entries']}"
                )

    def step(self, defer_maintenance: bool = False):
        """One optimization step. With defer_maintenance=True the caller
        must invoke post_step() afterwards — evaluation/saving hooks run
        in between, BEFORE densification and opacity reset, matching the
        reference's in-iteration order (train.py:146-169: training_report
        and scene.save precede the densification block; evaluating after
        an opacity reset reads a deliberately near-transparent scene)."""
        self.iteration += 1
        it = self.iteration

        # SH warmup every 1000 iters (train.py:100-101)
        if it % 1000 == 0 and self.active_sh_degree < self.sh_degree:
            self.active_sh_degree += 1

        camera = self._pop_camera()
        bg = (
            jnp.asarray(self.rng.uniform(size=3), jnp.float32)
            if self.opt.random_background
            else self.background
        )
        gt = jnp.asarray(camera.image.transpose(1, 2, 0), jnp.float32)

        in_densify_window = it < self.opt.densify_until_iter
        cam_arrays = jax.tree.map(jnp.asarray, camera.arrays())
        if self.auto_capacity and self.raster_cfg.capacity_exact is None:
            n0 = self._probe_entries(cam_arrays, camera.width, camera.height)
            self._set_capacity(self._entry_capacity(n0))
        try:
            if self.mesh is None:
                self.state, metrics = train_step(
                    self.state,
                    cam_arrays,
                    gt,
                    bg,
                    jnp.asarray(it, jnp.int32),
                    sh_degree=self.sh_degree,
                    active_sh_degree=self.active_sh_degree,
                    width=camera.width,
                    height=camera.height,
                    raster_cfg=self.raster_cfg,
                    opt=self.opt,
                    spatial_lr_scale=self.spatial_lr_scale,
                    update_densify_stats=in_densify_window,
                )
            else:
                step_fn = self._sharded_step(
                    camera.width, camera.height, in_densify_window
                )
                self.state, metrics = step_fn(
                    self.state, cam_arrays, gt, bg, jnp.asarray(it, jnp.int32)
                )
        except Exception:
            if self.debug:
                # pipe.debug semantics: dump the step inputs for offline
                # repro before re-raising (diff_gaussian_rasterization/
                # __init__.py:87-94). The donated state may already be
                # invalid, so dump what is safely host-readable.
                self._dump_snapshot(it, camera, {"error": "step exception"})
                print(f"step raised; snapshot written to {self.debug_dump_path}")
            raise
        m = {k: float(v) if np.ndim(v) == 0 else v for k, v in jax.device_get(metrics).items()}
        m["iteration"] = it
        self.history.append(m)

        if not math.isfinite(m["loss"]):
            self._dump_snapshot(it, camera, {"metrics": m})
            raise FloatingPointError(
                f"non-finite loss {m['loss']} at iteration {it}; snapshot "
                f"written to {self.debug_dump_path}"
            )

        # Capacity overflow check: grow the entry budget if the tile list
        # clipped (reference reallocates its arena, rasterize_points.cu:28-36).
        # Sharded runs must also check the WORST strip against the
        # per-device share of the budget: a skewed strip (e.g. ground-plane
        # tile rows holding 2x the mean) clips silently while the summed
        # total stays under the global capacity.
        n_dev = self.mesh.devices.size if self.mesh is not None else 1
        strip_need = int(m.get("max_strip_entries", 0)) * n_dev
        need = max(int(m["num_entries"]), strip_need)
        self._entry_window_max = max(self._entry_window_max, need)
        cap = self.raster_cfg.capacity(self.state.params.xyz.shape[0])
        if need > cap:
            from dataclasses import replace as _dc_replace

            if self.auto_capacity or self.raster_cfg.capacity_exact is not None:
                self._set_capacity(self._entry_capacity(need))
            else:
                mult = self.raster_cfg.capacity_mult
                while mult * self.state.params.xyz.shape[0] < need:
                    mult *= 2
                self.raster_cfg = _dc_replace(self.raster_cfg, capacity_mult=mult)

        if not defer_maintenance:
            self.post_step()
        return m

    def _dump_snapshot(self, it: int, camera, extra: dict):
        """Write the step-input snapshot for offline repro (the analog of
        snapshot_fw.dump). Tolerates donated/deleted device buffers."""
        payload = dict(iteration=it, camera_uid=camera.uid, **extra)
        try:
            params, am, av, stats, _step = _state_to_host(self.state)
            payload.update(params=params, adam_m=am, adam_v=av, stats=stats)
        except Exception as e:  # state was donated into the failing step
            payload["state_unavailable"] = repr(e)
        with open(self.debug_dump_path, "wb") as f:
            pickle.dump(payload, f)

    def post_step(self):
        """Densification cadence (train.py:151-169); see step()."""
        it = self.iteration
        if it < self.opt.densify_until_iter:
            if (
                it > self.opt.densify_from_iter
                and it % self.opt.densification_interval == 0
            ):
                size_threshold = 20 if it > self.opt.opacity_reset_interval else None
                live_before = max(self.num_live, 1)
                self._densify_and_prune(size_threshold)
                if self.auto_capacity:
                    # Re-fit the entry budget on the densify cadence: scale
                    # the window max by the live-count growth (clone/split
                    # add entries roughly in proportion) so most densify
                    # steps avoid a clipped overflow frame; shrink when
                    # pruning dropped the count a bucket or more.
                    target = self._entry_window_max * self.num_live / live_before
                    self._set_capacity(self._entry_capacity(int(target)))
                    self._entry_window_max = 0
            if it % self.opt.opacity_reset_interval == 0 or (
                self.white_background and it == self.opt.densify_from_iter
            ):
                self._reset_opacity()

    def _sharded_step(self, width: int, height: int, densify_stats: bool):
        from gaussian_splatting_tpu.parallel import sharding

        key = (self.active_sh_degree, width, height, self.raster_cfg, densify_stats)
        fn = self._sharded_steps.get(key)
        if fn is None:
            fn = sharding.make_sharded_train_step(
                self.mesh, self.sh_degree, self.active_sh_degree,
                width, height, self.raster_cfg, self.opt,
                self.spatial_lr_scale, update_densify_stats=densify_stats,
            )
            self._sharded_steps[key] = fn
        return fn

    # ---- density control ----
    def _densify_and_prune(self, size_threshold):
        if self.device_densify and self._densify_device(size_threshold):
            return
        self._densify_host(size_threshold)

    def _densify_device(self, size_threshold) -> bool:
        """Jitted masked densify at fixed capacity (no host round-trip of
        the parameter arrays). Returns False on capacity overflow — the
        edit was skipped and the host path must grow the bucket."""
        key = jax.random.PRNGKey(self.seed * 1_000_003 + self.iteration)
        params, m, v, alive, counts = densify_mod.densify_and_prune_device(
            self.state.params,
            self.state.adam.m,
            self.state.adam.v,
            self.state.alive,
            self.state.xyz_grad_accum,
            self.state.denom,
            key,
            max_grad=self.opt.densify_grad_threshold,
            min_opacity=0.005,
            extent=self.cameras_extent,
            use_size_prune=size_threshold is not None,
            percent_dense=self.opt.percent_dense,
        )
        if int(counts["overflow"]):
            return False
        # three DISTINCT zero buffers: the jitted step donates its state,
        # and aliased leaves would be donated twice
        new_state = self.state._replace(
            params=params,
            adam=self.state.adam._replace(m=m, v=v),
            alive=alive,
            max_radii2d=jnp.zeros_like(self.state.max_radii2d),
            xyz_grad_accum=jnp.zeros_like(self.state.xyz_grad_accum),
            denom=jnp.zeros_like(self.state.denom),
        )
        # The densify jit is NOT a shard_map, so nothing CONSTRAINS its
        # output shardings to the mesh (GSPMD usually propagates the
        # input placement, but that is a heuristic, not a contract).
        # Re-place the rebuilt rows explicitly; a no-op when the
        # propagated placement already matches. The hardened
        # dryrun_multichip asserts the post-densify sharding.
        self.state = self._place(new_state)
        return True

    def _densify_host(self, size_threshold):
        params, m, v, stats, step = _state_to_host(self.state)
        res = densify_mod.densify_and_prune(
            params,
            m,
            v,
            stats["xyz_grad_accum"],
            stats["denom"],
            stats["max_radii2d"],
            max_grad=self.opt.densify_grad_threshold,
            min_opacity=0.005,
            extent=self.cameras_extent,
            max_screen_size=size_threshold,
            percent_dense=self.opt.percent_dense,
            rng=self.rng,
        )
        old_cap = self.state.params.xyz.shape[0]
        self.state = self._place(_state_from_host(
            res.params, res.adam_m, res.adam_v, step, old_cap, self.min_capacity
        ))

    def _reset_opacity(self):
        params, m, v, stats, step = _state_to_host(self.state)
        params, m, v = densify_mod.reset_opacity(params, m, v)
        old_cap = self.state.params.xyz.shape[0]
        new_state = self._place(
            _state_from_host(params, m, v, step, old_cap, self.min_capacity)
        )
        # opacity reset keeps densification stats (only densify resets them)
        n = params["xyz"].shape[0]
        self.state = new_state._replace(
            max_radii2d=new_state.max_radii2d.at[:n].set(stats["max_radii2d"]),
            xyz_grad_accum=new_state.xyz_grad_accum.at[:n].set(stats["xyz_grad_accum"]),
            denom=new_state.denom.at[:n].set(stats["denom"]),
        )

    # ---- checkpointing (train.py:178-180, gaussian_model.py:80-112) ----
    def save_checkpoint(self, path: str):
        params, m, v, stats, step = _state_to_host(self.state)
        payload = dict(
            iteration=self.iteration,
            active_sh_degree=self.active_sh_degree,
            sh_degree=self.sh_degree,
            spatial_lr_scale=self.spatial_lr_scale,
            cameras_extent=self.cameras_extent,
            params=params,
            adam_m=m,
            adam_v=v,
            adam_step=step,
            stats=stats,
        )
        with open(path, "wb") as f:
            pickle.dump(payload, f)

    def load_checkpoint(self, path: str):
        with open(path, "rb") as f:
            payload = pickle.load(f)
        self.iteration = payload["iteration"]
        self.active_sh_degree = payload["active_sh_degree"]
        self.sh_degree = payload["sh_degree"]
        self.spatial_lr_scale = payload["spatial_lr_scale"]
        self.cameras_extent = payload["cameras_extent"]
        self.state = self._place(_state_from_host(
            payload["params"],
            payload["adam_m"],
            payload["adam_v"],
            payload["adam_step"],
            0,
            self.min_capacity,
        ))
        n = payload["params"]["xyz"].shape[0]
        st = payload["stats"]
        self.state = self.state._replace(
            max_radii2d=self.state.max_radii2d.at[:n].set(st["max_radii2d"]),
            xyz_grad_accum=self.state.xyz_grad_accum.at[:n].set(st["xyz_grad_accum"]),
            denom=self.state.denom.at[:n].set(st["denom"]),
        )
