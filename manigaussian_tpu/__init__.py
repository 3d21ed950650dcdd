"""manigaussian_tpu — a TPU-native (JAX/XLA/Pallas) framework with the capabilities of
GuanxingLu/ManiGaussian: a language-conditioned multi-task behavior-cloning agent whose
voxel Perceiver policy is regularized by a dynamic Gaussian-Splatting world model.

Layout (mirrors SURVEY.md §2 component inventory; see PARITY.md for the full map):
  ops/       — camera math, Gaussian projection, differentiable rasterizer
               (XLA pipeline + Pallas tile kernel with analytic VJP), oracle
               rasterizer, voxelizer, SE(3) augmentation, rotation codecs,
               losses, kNN
  models/    — Flax model zoo: 3D U-Net, Perceiver IO, ResnetFC, Gaussian
               regressor + deformation field, foundation-feature extractors
  rendering/ — NeuralRenderer orchestration (batched novel-view render + losses)
  agents/    — QFunction, BC agent (jitted update/act), method registry
  parallel/  — device mesh, DP train step, tile-sharded multi-chip rasterizer
  runners/   — offline train runner, eval runner, stat accumulator
  data/      — stored-demo episodes, keypoints, replay (native C++ store),
               batch pipeline, language/foundation providers, synthetic fixtures
  envs/      — env-client protocol, mock replay env, RLBench adapter
  utils/     — checkpointing (Orbax), config IO, logging, visualization,
               profiling, video
  analysis/  — success-rate aggregation (compute_results)
"""

__version__ = "0.1.0"

from manigaussian_tpu import config  # noqa: F401  (public config tree)


def create_agent(cfg):
    """Convenience re-export of agents.registry.create_agent."""
    from manigaussian_tpu.agents.registry import create_agent as _ca
    return _ca(cfg)
