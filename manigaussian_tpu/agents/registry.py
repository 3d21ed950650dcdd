"""Agent registry keyed by method name.

Parity target: the reference's method dispatch (`eval.py:46-58`,
`run_seed_fn.py` create_agent branches) over conf/method/*.yaml:
  * ManiGaussian_BC — the full agent (Gaussian-splat world model).
  * PERACT_BC — the same Q-attention policy WITHOUT the neural renderer
    (agents/peract_bc/qattention_peract_bc_agent.py:33-729 is the identical
    policy minus rendering) → mapped to ManiGaussianBCAgent with
    use_neural_rendering=False.
  * GNFACTOR_BC — the NeRF-volumetric baseline
    (agents/gnfactor_bc/qattention_gnfactor_bc_agent.py): the same Q-attention
    policy with a generalizable-NeRF aux renderer instead of the splat world
    model → mapped to ManiGaussianBCAgent with
    neural_renderer.renderer_type='nerf' (rendering/nerf_renderer.py) and the
    dynamic field off (GNFactor has no next-frame branch).
"""

from __future__ import annotations

import dataclasses

from manigaussian_tpu.agents.bc_agent import ManiGaussianBCAgent
from manigaussian_tpu.config import ManiGaussianConfig


def create_agent(cfg: ManiGaussianConfig,
                 tile_mesh=None) -> ManiGaussianBCAgent:
    name = cfg.method.name
    if name == "ManiGaussian_BC":
        return ManiGaussianBCAgent(cfg, tile_mesh=tile_mesh)
    if name == "PERACT_BC":
        cfg = dataclasses.replace(
            cfg, method=dataclasses.replace(cfg.method,
                                            use_neural_rendering=False))
        return ManiGaussianBCAgent(cfg, tile_mesh=tile_mesh)
    if name == "GNFACTOR_BC":
        nr = dataclasses.replace(cfg.method.neural_renderer,
                                 renderer_type="nerf",
                                 use_dynamic_field=False)
        cfg = dataclasses.replace(
            cfg, method=dataclasses.replace(cfg.method,
                                            use_neural_rendering=True,
                                            neural_renderer=nr))
        return ManiGaussianBCAgent(cfg, tile_mesh=tile_mesh)
    raise ValueError(f"Method {name} does not exist.")
