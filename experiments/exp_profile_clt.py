"""Capture a device trace of the CLT chunk and dump per-op durations."""
import glob
import gzip
import json
import os

import jax
import stock_market_monte_carlo_tpu as smmc
from stock_market_monte_carlo_tpu.config import EngineOptions

assert jax.default_backend() == "tpu"
opts = EngineOptions(chunk_paths=2**24, gaussian_sampler="clt")
g = smmc.GaussianReturns()
smmc.simulate_stats(g, 2**24, 360, seed=1, options=opts)  # warm

logdir = "/tmp/smmc_trace_clt"
with jax.profiler.trace(logdir):
    r = smmc.simulate_stats(g, 2**24, 360, seed=2, options=opts)
    _ = r.mean

files = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                  recursive=True)
print("trace files:", files)
for f in files:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    events = [e for e in data.get("traceEvents", [])
              if e.get("ph") == "X" and e.get("dur", 0) > 0]
    # find TPU device track pids
    by_name = {}
    for e in events:
        name = e.get("name", "?")
        by_name.setdefault(name, [0, 0.0])
        by_name[name][0] += 1
        by_name[name][1] += e["dur"]
    top = sorted(by_name.items(), key=lambda kv: -kv[1][1])[:25]
    for name, (cnt, dur) in top:
        print(f"{dur/1e3:10.2f} ms  x{cnt:<6d} {name[:90]}")
