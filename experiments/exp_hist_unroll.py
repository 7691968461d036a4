import time
import jax
import stock_market_monte_carlo_tpu as smmc
from stock_market_monte_carlo_tpu.config import EngineOptions

assert jax.default_backend() == "tpu"
h = smmc.HistoricalBootstrap.from_csv()
opts = EngineOptions(chunk_paths=2**24)
smmc.simulate_stats(h, 2**24, 360, seed=1, options=opts)
for rep in range(3):
    t0 = time.perf_counter()
    r = smmc.simulate_stats(h, 100_000_000, 360, seed=2, options=opts)
    _ = r.mean
    print(f"rep{rep}: {time.perf_counter()-t0:.3f} s (was 0.542-0.551)")
print("mean:", r.mean)
