"""Validate + time the CLT withdrawal-strategy kernel on the real chip."""
import time

import jax
import numpy as np

import stock_market_monte_carlo_tpu as smmc
from stock_market_monte_carlo_tpu.config import EngineOptions
from stock_market_monte_carlo_tpu.models.strategies import (
    FixedPercentWithdrawal,
)

assert jax.default_backend() == "tpu"
g = smmc.GaussianReturns()
strat = FixedPercentWithdrawal(0.25)
opts_clt = EngineOptions(chunk_paths=2**22, gaussian_sampler="clt")
opts_icdf = EngineOptions(chunk_paths=2**22)

n, t = 2**22, 360
a = smmc.simulate_stats(g, n, t, seed=3, strategy=strat, options=opts_icdf)
b = smmc.simulate_stats(g, n, t, seed=3, strategy=strat, options=opts_clt)
print(f"icdf: mean={a.mean:.3f} std={a.std:.3f} wd={a.moments.total_withdrawn:.5e}")
print(f"clt : mean={b.mean:.3f} std={b.std:.3f} wd={b.moments.total_withdrawn:.5e}")
se = a.std / np.sqrt(n)
assert abs(a.mean - b.mean) < 5 * se, (a.mean, b.mean, se)
assert abs(a.std - b.std) / a.std < 3e-3
assert abs(a.moments.total_withdrawn - b.moments.total_withdrawn) \
    / a.moments.total_withdrawn < 2e-3

# analytic check of withdrawn: E[wd] = v0*(1-k)*sum_t m^t ... with
# m = k*(1+mu/100): E[grown_t] = v0*m^(t-1)*(1+mu/100)
k = 1 - 0.25 / 100
m1 = 1.005
mm = k * m1
ewd = 1000.0 * (1 - k) * m1 * (mm**360 - 1) / (mm - 1) / k / m1 * k
# E[wd] = sum_{t=1..360} v0 * (mm)^{t-1} * m1 * (1-k)
ewd = 1000.0 * m1 * (1 - k) * (mm**360 - 1) / (mm - 1)
print(f"wd/path analytic={ewd:.3f} clt={b.moments.total_withdrawn/n:.3f}")
assert abs(b.moments.total_withdrawn / n - ewd) / ewd < 5e-3

# speed: plain vs strategy at 100M
opts_clt_big = EngineOptions(chunk_paths=2**24, gaussian_sampler="clt")
for name, st in (("plain", smmc.NoWithdrawal()), ("fixed_pct", strat)):
    smmc.simulate_stats(g, 2**24, 360, seed=1, strategy=st, options=opts_clt_big)
    t0 = time.perf_counter()
    r = smmc.simulate_stats(g, 100_000_000, 360, seed=7, strategy=st,
                            options=opts_clt_big)
    _ = r.mean
    print(f"CLT {name}: {time.perf_counter()-t0:.3f} s")
