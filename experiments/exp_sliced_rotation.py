"""Validate + time the sliced-rotation bootstrap kernel on the real chip."""
import time

import jax
import jax.numpy as jnp
import numpy as np

import stock_market_monte_carlo_tpu as smmc
from stock_market_monte_carlo_tpu.config import EngineOptions

assert jax.default_backend() == "tpu"

# --- correctness: T=1 probe table exposes the sampled entry exactly ---
n_table = 1127
probe = np.arange(n_table, dtype=np.float32)
m = smmc.HistoricalBootstrap(jnp.asarray(probe))
n = 2**21
res = smmc.simulate_stats(m, n, 1, 1000.0, seed=5,
                          options=EngineOptions(chunk_paths=n),
                          keep_final_values=True)
idx = np.rint((res.final_values - 1000.0) / 10.0).astype(np.int64)
assert idx.min() >= 0 and idx.max() == n_table - 1, (idx.min(), idx.max())
counts = np.bincount(idx, minlength=n_table)
expected = n / n_table
chi2 = ((counts - expected) ** 2 / expected).sum()
dof = n_table - 1
print(f"T=1 chi2={chi2:.1f} dof={dof} bound={dof + 6*np.sqrt(2*dof):.1f}")
assert chi2 < dof + 6 * np.sqrt(2 * dof), chi2

# --- moments at T=360 vs table analytics ---
rng = np.random.default_rng(0)
table = rng.normal(0.5, 2.0, n_table).astype(np.float32)
m2 = smmc.HistoricalBootstrap(jnp.asarray(table))
T = 360
N = 2**24
r = smmc.simulate_stats(m2, N, T, seed=1,
                        options=EngineOptions(chunk_paths=N))
g = (100 + table.astype(np.float64)) / 100
mean_a = 1000.0 * g.mean() ** T
var_a = 1000.0**2 * ((g**2).mean() ** T - g.mean() ** (2 * T))
se = np.sqrt(var_a / N)
print(f"mean={r.mean:.4f} analytic={mean_a:.4f} dev={abs(r.mean-mean_a)/se:.2f} SE")
assert abs(r.mean - mean_a) < 5 * se
std_a = np.sqrt(var_a)
print(f"std={r.std:.2f} analytic={std_a:.2f} rel={(r.std-std_a)/std_a:.2e}")
assert abs(r.std - std_a) / std_a < 5e-3

# --- speed ---
t0 = time.perf_counter()
r = smmc.simulate_stats(m2, N, T, seed=2, options=EngineOptions(chunk_paths=N))
_ = r.mean
dt = time.perf_counter() - t0
print(f"2^24 x 360: {dt*1000:.1f} ms -> {N*T/dt/1e9:.1f} G steps/s "
      f"(100Mx360 ~ {36.0/(N*T/dt/1e9):.3f} s); was 311 ms / 19.4 G")
