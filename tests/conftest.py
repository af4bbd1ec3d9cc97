import os

# Force CPU with 8 virtual devices BEFORE jax initializes: multi-chip
# sharding tests run on a fake mesh (the TPU answer to "multi-node tests
# without a cluster"). NOTE: the axon TPU plugin ignores JAX_PLATFORMS,
# so we use JAX_PLATFORM_NAME + an explicit config update as well.
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

os.environ.setdefault("GS_TPU_BLENDER_INIT_POINTS", "2000")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Make the optional native extension importable in tests when built.
_nat = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
if os.path.isdir(_nat):
    import sys
    sys.path.append(_nat)
