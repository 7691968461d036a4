"""Withdrawal strategies at plain-CLT speed (track_withdrawn=False).

For multiplicative strategies the keep fractions fold into the CLT
kernel's per-block affine constants, so strategy FINALS are exact and
cost nothing extra; only the per-path withdrawn total needs the lane
prefix that makes 'clt-prefix' slower than exact-ICDF. This times the
fixed-percent 100M x 360 run: exact-ICDF (tracks withdrawn, the default)
vs CLT with track_withdrawn=False.
"""

import time

import jax

import stock_market_monte_carlo_tpu as smmc
from stock_market_monte_carlo_tpu.config import EngineOptions
from stock_market_monte_carlo_tpu.models.strategies import (
    FixedPercentWithdrawal,
)

assert jax.default_backend() == "tpu"
T = 360
g = smmc.GaussianReturns()
strat = FixedPercentWithdrawal(0.25)
k, m1 = 1 - 0.25 / 100, 1.005
mean_a = 1000.0 * (m1 * k) ** T

for name, o in (
    ("icdf + withdrawn (default)", EngineOptions(chunk_paths=2**24)),
    ("clt, track_withdrawn=False",
     EngineOptions(chunk_paths=2**24, gaussian_sampler="clt",
                   track_withdrawn=False)),
):
    smmc.simulate_stats(g, 2**24, T, seed=1, strategy=strat,
                        target_amount=2000.0, options=o)
    best = None
    for _rep in range(3):
        t0 = time.perf_counter()
        r = smmc.simulate_stats(g, 100_000_000, T, seed=7, strategy=strat,
                                target_amount=2000.0, options=o)
        _ = r.mean
        best = min(best or 99, time.perf_counter() - t0)
    rel = abs(r.mean - mean_a) / mean_a
    print(f"{name:28s}: {best:.3f} s  mean rel err {rel:.2e} "
          f"(icdf-strategy era: 0.563 s; clt-prefix: 1.007 s)")
