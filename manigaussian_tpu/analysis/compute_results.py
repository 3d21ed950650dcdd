"""Success-rate aggregation across seeds/tasks/checkpoints.

Parity target: `scripts/compute_results.py:20-122` — per-checkpoint average over
the 'return' columns of eval_data.csv, checkpoint selection best/last/<index>,
mean ± std across seeds, plus the category grouping table. Works on the CSVs
written by runners/eval_runner.py (same column names as the reference).

Usage:
    python -m manigaussian_tpu.analysis.compute_results \
        --file_paths seed0.csv seed1.csv seed2.csv --method last
"""

from __future__ import annotations

import argparse
from collections import OrderedDict
from typing import Dict, List, Tuple

import numpy as np
import pandas as pd

TASKS = ['close_jar', 'open_drawer', 'sweep_to_dustpan_of_size',
         'meat_off_grill', 'turn_tap', 'slide_block_to_color_target',
         'put_item_in_drawer', 'reach_and_drag', 'push_buttons', 'stack_blocks']

CAT_GROUP_TO_TASK = OrderedDict({
    'Planning': ['push_buttons', 'meat_off_grill'],
    'Long': ['stack_blocks', 'put_item_in_drawer'],
    'Tools': ['slide_block_to_color_target', 'reach_and_drag',
              'sweep_to_dustpan_of_size'],
    'Motion': ['turn_tap'],
    'Screw': ['close_jar'],
    'Occulusion': ['open_drawer'],
})


def calculate_average_return(df: pd.DataFrame) -> pd.Series:
    return_columns = [c for c in df.columns
                      if 'return' in c and 'mean_return' not in c]
    df_returns = df[return_columns].copy()
    df_returns.columns = [c.split('/')[-1] for c in df_returns.columns]
    return df_returns.mean(axis=1)


def category_table(df: pd.DataFrame) -> pd.DataFrame:
    return_columns = [c for c in df.columns
                      if 'return' in c and 'mean_return' not in c]
    dfr = df[return_columns].copy()
    dfr.columns = [c.split('/')[-1] for c in dfr.columns]
    out = pd.DataFrame({'step': df['step']})
    for cat, tasks in CAT_GROUP_TO_TASK.items():
        cols = [t for t in tasks if t in dfr.columns]
        if cols:
            out[cat] = dfr[cols].mean(axis=1)
    return out


def aggregate(file_paths: List[str], method: str = 'last'
              ) -> Tuple[float, float, Dict[str, float]]:
    """Returns (mean over seeds, std over seeds, per-seed selected returns)."""
    selected: Dict[str, float] = {}
    for path in file_paths:
        df = pd.read_csv(path)
        avg = calculate_average_return(df)
        if method == 'best':
            val = float(avg.max())
        elif method == 'last':
            val = float(avg.iloc[int(df['step'].idxmax())])
        elif str(method).isdigit():
            val = float(avg.iloc[int(method)])
        else:
            raise ValueError(f'unknown method {method}')
        selected[path] = val
    vals = list(selected.values())
    return float(np.mean(vals)), float(np.std(vals)), selected


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--file_paths', nargs='+', required=True)
    parser.add_argument('--method', default='last')
    args = parser.parse_args()
    mean, std, per_seed = aggregate(args.file_paths, args.method)
    for path, v in per_seed.items():
        print(f'{path}: {v:.2f}')
    print(f'Average return over all seeds: {mean:.2f}')
    print(f'Standard deviation over all seeds: {std:.2f}')


if __name__ == '__main__':
    main()
