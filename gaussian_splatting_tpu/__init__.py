"""TPU-native 3D Gaussian Splatting framework (JAX / XLA / Pallas).

A from-scratch reimplementation of the capabilities of the INRIA
"3D Gaussian Splatting for Real-Time Radiance Field Rendering" trainer
(reference: Cc19245/gaussian-splatting_CC-Comments), designed TPU-first:

- the CUDA tile rasterizer (forward.cu / backward.cu / rasterizer_impl.cu)
  becomes static-shape jnp pipelines + Pallas TPU kernels,
- the torch training loop becomes a jitted functional step over a
  padded-capacity Gaussian pytree with an alive mask,
- multi-device scaling uses jax.sharding.Mesh + shard_map (primitive and
  tile sharding) instead of the reference's single-GPU design.
"""

__version__ = "0.1.0"

from gaussian_splatting_tpu.ops.rasterize import rasterize, RasterizerConfig  # noqa: F401
from gaussian_splatting_tpu.scene.cameras import Camera  # noqa: F401
from gaussian_splatting_tpu.ops.rasterize import mark_visible  # noqa: F401
from gaussian_splatting_tpu.training import (  # noqa: F401
    OptimizationConfig,
    train_step,
    eval_render,
)
from gaussian_splatting_tpu.trainer import Trainer  # noqa: F401
