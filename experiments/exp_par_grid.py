"""Parallel grid semantics: bit-identity + speed vs the default."""
import os
import subprocess
import sys
import time

import numpy as np


def run(par):
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:/root/.axon_site"
    if par:
        env["SMMC_PAR_GRID"] = "1"
    code = """
import time, numpy as np, jax
import stock_market_monte_carlo_tpu as smmc
from stock_market_monte_carlo_tpu.config import EngineOptions
assert jax.default_backend() == "tpu"
g = smmc.GaussianReturns()
h = smmc.HistoricalBootstrap.from_csv()
f = smmc.simulate_final_values(g, 2**18, 24, seed=9,
                               options=EngineOptions(chunk_paths=2**18))
np.save("/tmp/parngrid_finals.npy" if %d else "/tmp/basegrid_finals.npy", f)
for name, model, opts in (
    ("clt", g, EngineOptions(chunk_paths=2**24, gaussian_sampler="clt")),
    ("hist", h, EngineOptions(chunk_paths=2**24)),
):
    smmc.simulate_stats(model, 2**24, 360, seed=1, options=opts)
    t0 = time.perf_counter()
    r = smmc.simulate_stats(model, 100_000_000, 360, seed=7, options=opts)
    _ = r.mean
    print(f"{name}: {time.perf_counter()-t0:.3f} s")
""" % (1 if par else 0)
    subprocess.run([sys.executable, "-c", code], env=env, check=True)


run(False)
run(True)
a = np.load("/tmp/basegrid_finals.npy")
b = np.load("/tmp/parngrid_finals.npy")
print("finals bit-identical:", (a == b).all())
