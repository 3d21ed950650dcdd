"""CSV / console metric logging.

Parity target: YARR `utils/log_writer.py` (LogWriter: csv rows keyed by step,
lazily-extended field set) and the console loss breakdown printed every 10 steps
(`qattention_manigaussian_bc_agent.py:878-889`). Host-side only — metrics are
device_get'd by the caller at log_freq (SURVEY.md §5 observability row).

Optional wandb: if the package is importable and enabled, scalars mirror the
reference's wandb.log keys (train/BC_loss, train/psnr, ...).
"""

from __future__ import annotations

import csv
import os
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, logdir: str, csv_name: str = "train_data.csv",
                 use_wandb: bool = False):
        os.makedirs(logdir, exist_ok=True)
        self.csv_path = os.path.join(logdir, csv_name)
        self._fieldnames = ["step"]
        self._rows = []
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb
            except ImportError:
                pass

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        row = {"step": step}
        row.update({k: float(v) for k, v in metrics.items()})
        for k in row:
            if k not in self._fieldnames:
                self._fieldnames.append(k)
        self._rows.append(row)
        if self._wandb is not None and getattr(self._wandb, "run", None):
            self._wandb.log(metrics, step=step)

    def flush(self) -> None:
        with open(self.csv_path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._fieldnames, restval="")
            w.writeheader()
            w.writerows(self._rows)

    @staticmethod
    def format_console(step: int, metrics: Dict[str, float]) -> str:
        """The reference's green loss line (qattention:878-889), sans termcolor."""
        parts = [f"step {step}"]
        for k in ("total_loss", "bc_loss", "trans_loss", "rot_loss",
                  "grip_loss", "collision_loss", "rgb_loss", "embed_loss",
                  "dyna_loss", "psnr"):
            if k in metrics:
                parts.append(f"{k}: {float(metrics[k]):.4f}")
        return " | ".join(parts)
