"""Worker for test_two_process_collectives: one of two real OS processes
forming a jax.distributed cluster over a localhost coordinator (the DCN
path of SURVEY.md section 2.3 item 3 — previously only num_processes=1 was
ever exercised).

Each process owns 2 virtual CPU devices (4 global). Both build the same
scene from the same seed, run ONE sharded train step across the 2x2 global
mesh, and check the replicated loss and their own addressable parameter
shards against an in-process single-device train_step.

Usage: two_process_worker.py <process_id> <coordinator_port>
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from gaussian_splatting_tpu.ops.rasterize import RasterizerConfig  # noqa: E402
from gaussian_splatting_tpu.parallel import sharding  # noqa: E402
from gaussian_splatting_tpu.scene.gaussians import create_from_pcd  # noqa: E402
from gaussian_splatting_tpu.training import (  # noqa: E402
    OptimizationConfig,
    init_train_state,
    train_step,
)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from helpers import make_camera  # noqa: E402

assert sharding.initialize_distributed(
    f"localhost:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()
assert len(jax.local_devices()) == 2

W, H = 64, 48
rng = np.random.default_rng(0)
pts = rng.normal(0, 0.8, (40, 3)).astype(np.float32)
colors = rng.uniform(0.2, 0.8, (40, 3)).astype(np.float32)
params, alive = create_from_pcd(pts, colors, 3, capacity=128)
cam_arrays = jax.tree.map(jnp.asarray, make_camera(W, H).arrays())
gt = jnp.asarray(rng.uniform(size=(H, W, 3)), jnp.float32)
bg = jnp.zeros(3)
opt = OptimizationConfig()
cfg = RasterizerConfig(backend="xla", capacity_mult=16, chunk=128)

mesh = sharding.make_mesh()  # 4 global devices, 2 per process
state4 = sharding.shard_train_state(init_train_state(params, alive), mesh)

# single-device reference (local jit, independent of the cluster)
state1 = init_train_state(params, alive)
new1, metrics1 = train_step(
    state1, cam_arrays, gt, bg, jnp.asarray(1, jnp.int32),
    sh_degree=3, active_sh_degree=2, width=W, height=H,
    raster_cfg=cfg, opt=opt, spatial_lr_scale=1.0,
)
loss1 = float(metrics1["loss"])

step4 = sharding.make_sharded_train_step(mesh, 3, 2, W, H, cfg, opt, 1.0)
new4, metrics4 = step4(state4, cam_arrays, gt, bg, jnp.asarray(1, jnp.int32))
loss4 = float(metrics4["loss"])  # replicated -> addressable everywhere

assert np.isfinite(loss4)
np.testing.assert_allclose(loss4, loss1, rtol=1e-5)
np.testing.assert_allclose(
    float(metrics4["l1"]), float(metrics1["l1"]), rtol=1e-5
)

# each process checks the parameter rows it actually owns
xyz1 = np.asarray(new1.params.xyz)
for shard in new4.params.xyz.addressable_shards:
    lo = shard.index[0].start or 0
    np.testing.assert_allclose(
        np.asarray(shard.data), xyz1[lo : lo + shard.data.shape[0]], atol=2e-5
    )

print(f"two-process-ok pid={pid} loss={loss4:.6f}", flush=True)
