"""Checkpoint / resume with a rolling window.

Parity target: reference save/restore semantics
(`yarr/runners/offline_train_runner.py:93-102,166-180`,
`qattention_manigaussian_bc_agent.py:1204-1235`):
  * weights written to <logdir>/weights/<iteration>/ every save_freq steps,
  * rolling window keeps the newest `num_weights_to_keep` (default 60),
  * auto-resume from the max existing iteration,
  * checkpoint-iteration listing for eval's missing/best/last modes
    (eval.py:89-143).

Improvement over the reference (SURVEY.md §5): the FULL TrainState is saved —
params AND optimizer state AND step — via Orbax, so resume is exact (the
reference silently reinitializes LAMB moments on resume).
"""

from __future__ import annotations

import os
import shutil
from typing import List, Optional

import jax
import orbax.checkpoint as ocp


def _weights_dir(logdir: str) -> str:
    return os.path.join(logdir, "weights")


def list_checkpoints(logdir: str) -> List[int]:
    d = _weights_dir(logdir)
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        if name.isdigit() and os.path.isdir(os.path.join(d, name)):
            out.append(int(name))
    return sorted(out)


def save_checkpoint(logdir: str, step: int, state,
                    num_weights_to_keep: int = 60) -> str:
    """Multi-process: EVERY process must call this (Orbax synchronizes hosts
    internally and only the primary host writes); the rolling-window cleanup
    runs on process 0 alone."""
    path = os.path.join(_weights_dir(logdir), str(step))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()
    ckptr.close()
    # rolling window (offline_train_runner.py:98-102)
    if jax.process_index() == 0:
        existing = list_checkpoints(logdir)
        keep = existing[:-num_weights_to_keep] if num_weights_to_keep else []
        for old in keep:
            shutil.rmtree(os.path.join(_weights_dir(logdir), str(old)),
                          ignore_errors=True)
    return path


def restore_checkpoint(logdir: str, state_like, step: Optional[int] = None):
    """Restore into the structure of `state_like`. step=None → latest.

    Returns (state, step) or (None, None) when nothing to resume.
    """
    steps = list_checkpoints(logdir)
    if not steps:
        return None, None
    step = steps[-1] if step is None else step
    path = os.path.abspath(os.path.join(_weights_dir(logdir), str(step)))
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, state_like)
    state = ckptr.restore(path, abstract)
    ckptr.close()
    return state, step
