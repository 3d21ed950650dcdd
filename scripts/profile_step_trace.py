"""Device-trace the full w_geo train step and dump top ops (hardware
durations — immune to the axon block_until_ready quirk, STATUS.md)."""
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import __graft_entry__ as ge
from manigaussian_tpu import config as C
from manigaussian_tpu.agents.bc_agent import ManiGaussianBCAgent

ITERS = 5

cfg = C.w_geo()
agent = ManiGaussianBCAgent(cfg)
batch = ge._make_batch(jax.random.PRNGKey(0), b=1, ncam=1, h=128, w=128,
                       img=128)
state = agent.init_state(jax.random.PRNGKey(1), batch, training=True,
                         lazy=True)
step = agent.jit_update(donate=False)
out = step(state, batch, jax.random.PRNGKey(2))
jax.block_until_ready(out)

trace_dir = "/tmp/jax_step_trace"
os.system(f"rm -rf {trace_dir}")
jax.profiler.start_trace(trace_dir)
for i in range(ITERS):
    out = step(state, batch, jax.random.PRNGKey(3 + i))
jax.block_until_ready(out)
jax.profiler.stop_trace()

pftrace = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
print("perfetto:", pftrace, flush=True)
durs = collections.Counter()
total = 0.0
for pf in pftrace:
    with gzip.open(pf, "rt") as fh:
        tr = json.load(fh)
    # keep only TPU-device lanes (pid names containing 'TPU'/'device')
    dev_pids = set()
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            nm = ev.get("args", {}).get("name", "")
            if "TPU" in nm or "Device" in nm or "device" in nm:
                dev_pids.add(ev.get("pid"))
    if not dev_pids:
        # summing every pid would double-count host threads on top of device
        # lanes and make 'total traced' fiction — refuse instead of guessing
        raise SystemExit(f"no TPU/device pid metadata in {pf}; cannot "
                         "attribute durations to a device lane")
    # one device lane only; 'X' events still nest (fusion parents wrap
    # children) so this total is an upper bound on busy time per lane
    lane = min(dev_pids)
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev and ev.get("pid") == lane:
            durs[ev.get("name", "?")] += ev["dur"]
            total += ev["dur"]

print(f"total traced (one device lane, nesting-inclusive upper bound): "
      f"{total/1000/ITERS:.1f} ms/step over {ITERS} steps")
for name, d in durs.most_common(60):
    print(f"{d/1000/ITERS:9.2f} ms  {name[:140]}", flush=True)
