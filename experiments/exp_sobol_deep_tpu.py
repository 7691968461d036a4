"""Compile/run the 64-bit-depth Sobol Pallas kernel on the real chip."""
import jax
import numpy as np
import stock_market_monte_carlo_tpu as smmc

assert jax.default_backend() == "tpu"
m = smmc.SobolGaussianReturns.create(12, index_offset=(1 << 33) + 777)
res = smmc.simulate_stats(m, 8192, 12, seed=0)
m32 = smmc.SobolGaussianReturns.create(12)
res32 = smmc.simulate_stats(m32, 8192, 12, seed=0)
print("deep mean:", res.mean, "shallow mean:", res32.mean)
assert np.isfinite(res.mean) and res.mean > 0
print("OK")
