"""Agent registry keyed by method name.

Parity target: the reference's method dispatch (`eval.py:46-58`,
`run_seed_fn.py` create_agent branches) over conf/method/*.yaml:
  * ManiGaussian_BC — the full agent (Gaussian-splat world model).
  * PERACT_BC — the same Q-attention policy WITHOUT the neural renderer
    (agents/peract_bc/qattention_peract_bc_agent.py:33-729 is the identical
    policy minus rendering) → mapped to ManiGaussianBCAgent with
    use_neural_rendering=False.
  * GNFACTOR_BC — the NeRF-volumetric baseline. Deliberately NOT ported
    (SURVEY.md §7: capability superseded by Gaussian splatting); the registry
    slot raises with guidance, as planned.
"""

from __future__ import annotations

import dataclasses

from manigaussian_tpu.agents.bc_agent import ManiGaussianBCAgent
from manigaussian_tpu.config import ManiGaussianConfig


def create_agent(cfg: ManiGaussianConfig) -> ManiGaussianBCAgent:
    name = cfg.method.name
    if name == "ManiGaussian_BC":
        return ManiGaussianBCAgent(cfg)
    if name == "PERACT_BC":
        cfg = dataclasses.replace(
            cfg, method=dataclasses.replace(cfg.method,
                                            use_neural_rendering=False))
        return ManiGaussianBCAgent(cfg)
    if name == "GNFACTOR_BC":
        raise NotImplementedError(
            "GNFACTOR_BC (NeRF volumetric renderer) is superseded by the "
            "Gaussian-splat world model: use method.name=ManiGaussian_BC. "
            "(SURVEY.md §7: deliberately not ported.)")
    raise ValueError(f"Method {name} does not exist.")
