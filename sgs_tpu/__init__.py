"""sgs_tpu — a TPU-native 3D Gaussian Splatting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
daohanlu/structured-gaussian-splatting (INRIA 3DGS fork): differentiable
tile rasterization, adaptive density control, latent/structured Gaussian
models, dataset loaders, training loops, and evaluation tooling — built
TPU-first (static shapes, capacity-padded pools, pjit/shard_map sharding,
Pallas kernels for the hot compositing loop).

Layering (bottom → top):
  core/      pure-jnp geometry + SH math (vmap-able, fp32)
  ops/       numerical building blocks (knn, ssim, sorting) + Pallas kernels
  render/    reference (oracle) and tiled production rasterizers
  models/    Gaussian parameter pool, densification, latent/structured models
  data/      COLMAP/Blender/Zero123/Mesh loaders, PLY I/O, Scene
  train/     jitted train step, optimizer, checkpointing, reporting
  parallel/  device mesh + shard_map distribution
  utils/     config dataclasses, general helpers
"""

__version__ = "0.1.0"
