"""Gather-cost slope: time the historical Pallas kernel with table sizes
128/640/1127 (1/5/9 chunked vreg gathers per path-month) to see how much
of the month cost is gathers vs fixed overhead (PRNG, compound, stats).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import stock_market_monte_carlo_tpu as smmc
from stock_market_monte_carlo_tpu.config import EngineOptions

assert jax.default_backend() == "tpu"

T = 360
N = 2**24
rng = np.random.default_rng(0)
for n_table in (128, 640, 1127):
    table = jnp.asarray(rng.normal(0.5, 1.0, n_table).astype(np.float32))
    m = smmc.HistoricalBootstrap(table)
    opts = EngineOptions(chunk_paths=N)
    r = smmc.simulate_stats(m, N, T, seed=1, options=opts)  # compile+warm
    t0 = time.perf_counter()
    r = smmc.simulate_stats(m, N, T, seed=2, options=opts)
    _ = r.mean  # absorbed on host already (simulate_stats fetches)
    dt = time.perf_counter() - t0
    rate = N * T / dt / 1e9
    print(f"n_table={n_table:5d} ({-(-n_table//128)} chunks): "
          f"{dt*1000:7.1f} ms -> {rate:6.1f} G steps/s "
          f"(100Mx360 ~ {36.0/rate:.3f} s)")
