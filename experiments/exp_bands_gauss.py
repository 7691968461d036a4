import time
import jax
import stock_market_monte_carlo_tpu as smmc

assert jax.default_backend() == "tpu"
g = smmc.GaussianReturns()
smmc.simulate_bands(g, 10**6, 360, seed=6)  # warm
t0 = time.perf_counter()
b = smmc.simulate_bands(g, 10**7, 360, seed=6)
dt = time.perf_counter() - t0
print(f"gaussian bands 1e7x360: {dt:.2f} s ({1e7/dt/1e6:.1f}M paths/s)")
t0 = time.perf_counter()
b = smmc.simulate_bands(g, 10**8, 360, seed=6)
dt = time.perf_counter() - t0
print(f"gaussian bands 1e8x360: {dt:.2f} s ({1e8/dt/1e6:.1f}M paths/s) "
      f"median={b.band(0.5)[-1]:.1f}")
