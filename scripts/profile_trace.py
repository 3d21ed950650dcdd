"""Capture a device trace of the full rasterizer fwd+bwd and dump top ops."""
import os, sys, glob, gzip, time, collections
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from manigaussian_tpu.ops.rasterizer import RasterizeConfig, rasterize
import bench as B

n, size = 65536, 128
camera = B.make_camera(size)
cfg = RasterizeConfig(width=size, height=size, tile=16,
                      max_tiles_per_gaussian=16, tile_capacity=8192,
                      chunk=256, sh_degree=1)
means, scales, rotations, opacities, shs, lang = B.make_scene(jax.random.PRNGKey(0), n)
tgt = jax.random.uniform(jax.random.PRNGKey(1), (size, size, 3))

def loss(*args):
    out, _ = rasterize(args[0], args[3], camera, cfg, (0., 0., 0.),
                       scales=args[1], rotations=args[2], shs=args[4],
                       language_features=args[5])
    return jnp.sum((out.color - tgt) ** 2) + jnp.sum(out.language_feature ** 2)

step = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5)))
args = (means, scales, rotations, opacities, shs, lang)
jax.block_until_ready(step(*args))

trace_dir = "/tmp/jax_trace"
os.system(f"rm -rf {trace_dir}")
jax.profiler.start_trace(trace_dir)
for _ in range(3):
    out = step(*args)
jax.block_until_ready(out)
jax.profiler.stop_trace()

# parse the xplane proto for op durations
from tensorflow.python.profiler.internal import _pywrap_profiler  # noqa
files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
print("xplane files:", files)
try:
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    for f in files:
        data, _ = rtd.xspace_to_tool_data([f], "op_profile", {})
        print(str(data)[:2000])
except Exception as e:
    print("plugin parse failed:", e)
    # fallback: crude scan of trace events via perfetto trace
    pftrace = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    print("perfetto:", pftrace)
    if pftrace:
        import json
        with gzip.open(pftrace[0], "rt") as fh:
            tr = json.load(fh)
        durs = collections.Counter()
        for ev in tr.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                name = ev.get("name", "?")
                durs[name] += ev["dur"]
        for name, d in durs.most_common(40):
            print(f"{d/1000/3:9.2f} ms  {name[:110]}")
