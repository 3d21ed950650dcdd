"""Task-uniform, optionally disk-backed replay buffer.

Parity target: YARR `uniform_replay_buffer.py` / `task_uniform_replay_buffer.py`:
  * transitions pickled one-file-per-index under save_dir/<task>/ (disk-backed,
    task_uniform_replay_buffer.py:54),
  * TASK-uniform sampling: pick a task uniformly, then a transition uniformly
    within it (task_uniform_replay_buffer.py:120-160),
  * per-replica sharding `task_idxs[rank::num_replicas]`
    (task_uniform_replay_buffer.py:113-118) → here `shard=(rank, n)` applied to
    each task's index list, so multi-host training sees disjoint data.

Simplifications vs YARR (documented):
  * offline BC only — no priorities, n-step returns, or timeout machinery
    (the reference trains with update_horizon=1 and never uses priorities),
  * batches are assembled as stacked numpy dicts ready for jnp.asarray.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np

Transition = Dict[str, np.ndarray]


class TaskUniformReplay:
    def __init__(self, save_dir: Optional[str] = None,
                 shard: tuple[int, int] = (0, 1),
                 storage: str = "native"):
        """storage: 'native' = C++ mmap record store (one log per task,
        native/replay_store.cpp — falls back to pickle if the toolchain is
        missing); 'pickle' = one file per transition (reference layout)."""
        self.save_dir = save_dir
        self.rank, self.num_replicas = shard
        self._mem: Dict[str, List[Transition]] = {}
        self._disk: Dict[str, List[str]] = {}
        self._stores: Dict[str, object] = {}
        self.storage = storage
        if storage == "native":
            from manigaussian_tpu.data.native_store import load_library
            if load_library() is None:
                self.storage = "pickle"
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)

    def _store(self, task: str):
        if task not in self._stores:
            from manigaussian_tpu.data.native_store import NativeRecordStore
            self._stores[task] = NativeRecordStore(
                os.path.join(self.save_dir, task, "records"))
        return self._stores[task]

    # ------------------------------------------------------------------ add
    def add(self, task: str, transition: Transition) -> None:
        if self.save_dir and self.storage == "native":
            from manigaussian_tpu.data.native_store import encode_transition
            os.makedirs(os.path.join(self.save_dir, task), exist_ok=True)
            self._store(task).append(encode_transition(transition))
        elif self.save_dir:
            d = os.path.join(self.save_dir, task)
            os.makedirs(d, exist_ok=True)
            idx = len(self._disk.setdefault(task, []))
            path = os.path.join(d, f"{idx}.replay")
            with open(path, "wb") as f:
                pickle.dump(transition, f, protocol=4)
            self._disk[task].append(path)
        else:
            self._mem.setdefault(task, []).append(transition)

    # ---------------------------------------------------------------- state
    @property
    def tasks(self) -> List[str]:
        return sorted(set(self._mem) | set(self._disk) | set(self._stores))

    def size(self, task: Optional[str] = None) -> int:
        def one(t):
            n = len(self._mem.get(t, [])) + len(self._disk.get(t, []))
            if t in self._stores:
                n += len(self._stores[t])
            return n
        if task is not None:
            return one(task)
        return sum(one(t) for t in self.tasks)

    def flush(self) -> None:
        for s in self._stores.values():
            s.flush()

    def reload_from_disk(self) -> None:
        """Re-index an existing save_dir (resume semantics, run_seed_fn.py:82-91:
        corrupt/unreadable files are skipped, not fatal)."""
        if not self.save_dir:
            return
        self._disk.clear()
        self._stores.clear()
        for task in sorted(os.listdir(self.save_dir)):
            d = os.path.join(self.save_dir, task)
            if not os.path.isdir(d):
                continue
            if (self.storage == "native"
                    and os.path.exists(os.path.join(d, "records.idx"))):
                self._store(task)  # opens the existing log
                continue
            files = [f for f in os.listdir(d) if f.endswith(".replay")]
            files.sort(key=lambda s: int(s.split(".")[0]))
            self._disk[task] = [os.path.join(d, f) for f in files]

    # --------------------------------------------------------------- sample
    def _indices(self, task: str) -> List[int]:
        n = self.size(task)
        idxs = list(range(n))
        # per-replica sharding (task_uniform_replay_buffer.py:113-118)
        return idxs[self.rank::self.num_replicas] or idxs

    def _get(self, task: str, idx: int) -> Transition:
        mem = self._mem.get(task, [])
        if idx < len(mem):
            return mem[idx]
        idx -= len(mem)
        if task in self._stores:
            from manigaussian_tpu.data.native_store import decode_transition
            return decode_transition(self._stores[task].get(idx))
        path = self._disk[task][idx]
        with open(path, "rb") as f:
            return pickle.load(f)

    def sample(self, batch_size: int, rng: np.random.Generator) -> List[Transition]:
        tasks = self.tasks
        assert tasks, "replay is empty"
        out = []
        for _ in range(batch_size):
            task = tasks[rng.integers(len(tasks))]
            idxs = self._indices(task)
            out.append(self._get(task, idxs[rng.integers(len(idxs))]))
        return out


def stack_transitions(transitions: Sequence[Transition]) -> Dict[str, np.ndarray]:
    """List of per-sample dicts → dict of stacked arrays (object arrays kept as
    lists for the host-side nerf loader)."""
    keys = transitions[0].keys()
    out = {}
    for k in keys:
        vals = [t[k] for t in transitions]
        if isinstance(vals[0], np.ndarray) and vals[0].dtype == object:
            out[k] = vals  # path arrays — host-side only
        elif isinstance(vals[0], (str, type(None))):
            out[k] = vals
        else:
            out[k] = np.stack([np.asarray(v) for v in vals])
    return out
