"""manigaussian_tpu — a TPU-native (JAX/XLA/Pallas) framework with the capabilities of
GuanxingLu/ManiGaussian: a language-conditioned multi-task behavior-cloning agent whose
voxel Perceiver policy is regularized by a dynamic Gaussian-Splatting world model.

Layout (mirrors SURVEY.md §2 component inventory):
  ops/       — camera math, Gaussian projection, differentiable rasterizer (jax + Pallas),
               voxelizer, kNN, PCA
  models/    — Flax model zoo: 3D U-Net, Perceiver IO, ResnetFC, Gaussian regressor,
               deformation field, neural renderer, Q-function
  agents/    — behavior-cloning agents (ManiGaussian, PerAct) and the act/update logic
  parallel/  — device mesh, sharded train step (data parallel + tile-sharded rasterizer)
  data/      — stored-demo reader, keypoint discovery, replay buffer, SE(3) augmentation
  utils/     — losses, transforms, checkpointing, config tree
"""

__version__ = "0.1.0"
