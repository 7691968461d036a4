import time
import jax
import stock_market_monte_carlo_tpu as smmc

assert jax.default_backend() == "tpu"
h = smmc.HistoricalBootstrap.from_csv()
b = smmc.simulate_bands(h, 10**6, 360, seed=6)  # warm
t0 = time.perf_counter()
b = smmc.simulate_bands(h, 10**7, 360, seed=6)
dt = time.perf_counter() - t0
print(f"bands 1e7x360: {dt:.2f} s ({1e7/dt/1e3:.0f}k paths/s) "
      f"median_final={b.band(0.5)[-1]:.1f}  (was 78.5 s)")
