"""Stats-only (histogram=False) timings — reference reduceBlock parity.

The reference's 0.13 s reduceBlock number computes ONLY mean/variance
(src/simulations.cu:185-247). EngineOptions(histogram=False) is that
contract; this measures it at 100M x 360 for all three engines.
"""

import time

import jax

import stock_market_monte_carlo_tpu as smmc
from stock_market_monte_carlo_tpu.config import EngineOptions

assert jax.default_backend() == "tpu"

h = smmc.HistoricalBootstrap.from_csv()
g = smmc.GaussianReturns()
for name, model, sampler in (
    ("historical", h, "icdf"),
    ("gauss-icdf", g, "icdf"),
    ("gauss-clt", g, "clt"),
):
    opts = EngineOptions(chunk_paths=2**24, gaussian_sampler=sampler,
                         histogram=False)
    smmc.simulate_stats(model, 2**24, 360, seed=1, target_amount=2000.0,
                        options=opts)
    best = None
    for _rep in range(3):
        t0 = time.perf_counter()
        r = smmc.simulate_stats(model, 100_000_000, 360, seed=7,
                                target_amount=2000.0, options=opts)
        _ = r.mean
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name:11s}: {best:.3f} s stats-only "
          f"(with-hist era numbers: hist 0.547 / icdf 0.52 / clt 0.357; "
          f"3070 reduceBlock: 0.13)")
    print(f"  mean {r.mean:.2f} std {r.std:.2f}")
