import time
import jax
import stock_market_monte_carlo_tpu as smmc
from stock_market_monte_carlo_tpu.config import EngineOptions

assert jax.default_backend() == "tpu"
opts = EngineOptions(chunk_paths=2**24, gaussian_sampler="clt")
g = smmc.GaussianReturns()
smmc.simulate_stats(g, 2**24, 360, seed=1, options=opts)
for rep in range(3):
    t0 = time.perf_counter()
    r = smmc.simulate_stats(g, 100_000_000, 360, seed=7, options=opts)
    _ = r.mean
    print(f"rep{rep}: {time.perf_counter()-t0:.3f} s")
mean_a = 1000 * 1.005**360
assert abs(r.mean - mean_a) / mean_a < 1e-3, (r.mean, mean_a)
print("moments ok:", r.mean, r.std)
