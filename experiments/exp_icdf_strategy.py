import time
import jax
import stock_market_monte_carlo_tpu as smmc
from stock_market_monte_carlo_tpu.config import EngineOptions
from stock_market_monte_carlo_tpu.models.strategies import (
    FixedPercentWithdrawal, FixedAmountWithdrawal,
)

assert jax.default_backend() == "tpu"
g = smmc.GaussianReturns()
opts = EngineOptions(chunk_paths=2**24)
for name, st in (("icdf fixed_pct", FixedPercentWithdrawal(0.25)),
                 ("icdf fixed_amt", FixedAmountWithdrawal(2.0))):
    smmc.simulate_stats(g, 2**24, 360, seed=1, strategy=st, options=opts)
    t0 = time.perf_counter()
    r = smmc.simulate_stats(g, 100_000_000, 360, seed=7, strategy=st,
                            options=opts)
    _ = r.mean
    print(f"{name}: {time.perf_counter()-t0:.3f} s (mean {r.mean:.2f})")
