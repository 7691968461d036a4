"""v8 CLT: signed full-word counts (no shift, no centering constant)."""
import time
import jax
import numpy as np
import stock_market_monte_carlo_tpu as smmc
from stock_market_monte_carlo_tpu.config import EngineOptions
from stock_market_monte_carlo_tpu.ops import analytic as an

assert jax.default_backend() == "tpu"
opts = EngineOptions(chunk_paths=2**24, gaussian_sampler="clt")
g = smmc.GaussianReturns()
smmc.simulate_stats(g, 2**24, 360, seed=1, options=opts)
times = []
for rep in range(3):
    t0 = time.perf_counter()
    r = smmc.simulate_stats(g, 100_000_000, 360, seed=7, options=opts,
                            target_amount=2000.0)
    _ = r.mean
    times.append(time.perf_counter() - t0)
print("times:", [f"{t:.3f}" for t in times])
mean_a, std_a = an.final_value_moments(0.5, 10 / 12, 360, 1000.0)
qs = [0.05, 0.5, 0.95]
want = an.final_value_quantiles(0.5, 10 / 12, 360, 1000.0, qs)
got = r.quantiles(qs)
print(f"mean rel {abs(r.mean-mean_a)/mean_a:.2e} std rel {abs(r.std-std_a)/std_a:.2e}")
for q, w in zip(qs, want):
    rel = abs(got[q] - w) / w
    print(f"q{q}: rel {rel:.2e}")
    assert rel < 1e-3
assert abs(r.mean - mean_a) / mean_a < 1e-3
assert abs(r.std - std_a) / std_a < 1e-3
