"""End-to-end historical 100M x 360 with the sliced-rotation kernel."""
import time

import jax
import jax.numpy as jnp
import numpy as np

import stock_market_monte_carlo_tpu as smmc
from stock_market_monte_carlo_tpu.config import EngineOptions

assert jax.default_backend() == "tpu"
h = smmc.HistoricalBootstrap.from_csv()
print("table rows:", h.returns_pct.shape)

for chunk in (2**23, 2**24):  # 2^24 is the exact-count cap (config.py)
    opts = EngineOptions(chunk_paths=chunk)
    r = smmc.simulate_stats(h, 100_000_000, 360, seed=1, options=opts)  # warm
    t0 = time.perf_counter()
    r = smmc.simulate_stats(h, 100_000_000, 360, seed=2, options=opts)
    _ = r.mean
    dt = time.perf_counter() - t0
    print(f"chunk=2^{chunk.bit_length()-1}: {dt:.3f} s "
          f"({1e8/dt/1e6:.0f}M paths/s) mean={r.mean:.2f} std={r.std:.2f}")
