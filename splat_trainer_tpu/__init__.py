"""splat-trainer-tpu: a TPU-native 3D Gaussian Splatting training framework.

Built from scratch on JAX/XLA/Pallas/pjit with the capability surface of
uc-vision/splat-trainer (see SURVEY.md).  The compute path (projection,
tile rasterization fwd/bwd, SH evaluation, sparse optimizers, SSIM, kNN /
k-means) is implemented natively for TPU; the host path (dataset ingestion,
logging, checkpointing, CLI) is Python.
"""

import jax as _jax

# The reference asserts torch float32_matmul_precision == 'highest' because
# low-precision matmuls corrupt 4x4 pose chains (reference trainer.py:88-89).
# Same requirement on TPU: f32 matmuls (pose/projection math) must not be
# demoted to bf16 passes. Hot MLP/raster matmuls opt into bf16 explicitly.
_jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"

