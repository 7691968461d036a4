"""v9 CLT sampler experiment: one PRNG draw feeds four month blocks.

MEASURED DEAD END — kept for provenance; the package stays on the v5/v8
per-block 16-bit draw. The idea: use all four bytes of each
prng_random_bits word as four independent 8-bit uniforms (exactly
representable in bf16), cutting PRNG draws 3x at T=360. Statistically it
is clean (hardware byte planes uncorrelated, exp_prng_bytes.py; host
remix of hardware bytes gives Var(S)=361.8 vs 360, exp_prng_crossword.py;
on-chip std rel err 2.1e-4 vs closed form). But it measures SLOWER:
100M x 360 in 0.422-0.445 s vs 0.357 s — the per-block draws were already
fully hidden behind the MXU mixing, so removing them saved nothing while
the byte extraction (shift+mask per block) added pure VPU cost and the
single up-front draw removed the draw/matmul overlap the Mosaic list
scheduler was exploiting.

To re-test: re-apply the byte-draw patch to _build_clt_kernel /
_clt_qmatrix (git log for 'v9'), then run this script.

NOTE (cost of a wrong assumption, kept as a warning): GaussianReturns()
defaults to the REFERENCE's parameters — mean 6%/12, std 10%/12 ≈ 0.8333 —
not std 1.0. An earlier version of this script hardcoded b=0.01 in the
closed form and "found" a 17% variance deficit that was entirely the
wrong expected value (0.8333^2 = 0.694).
"""

import time

import jax

import stock_market_monte_carlo_tpu as smmc
from stock_market_monte_carlo_tpu.config import EngineOptions
from stock_market_monte_carlo_tpu.models.strategies import (
    FixedPercentWithdrawal,
)

assert jax.default_backend() == "tpu"

g = smmc.GaussianReturns()  # reference defaults: 6%/12 mean, 10%/12 std
opts = EngineOptions(chunk_paths=2**24, gaussian_sampler="clt")
T = 360
a, b, v0 = 1.0 + g.mean_pct / 100.0, g.std_pct / 100.0, 1000.0
mean_a = v0 * a**T
std_a = (v0**2 * ((a * a + b * b) ** T - a ** (2 * T))) ** 0.5

t0 = time.perf_counter()
r = smmc.simulate_stats(g, 2**24, T, seed=1, target_amount=2000.0,
                        options=opts)
_ = r.mean
print(f"compile+first chunk: {time.perf_counter() - t0:.1f} s")
print(f"mean {r.mean:.2f} vs {mean_a:.2f} "
      f"rel {abs(r.mean - mean_a) / mean_a:.2e}")
print(f"std  {r.std:.2f} vs {std_a:.2f} "
      f"rel {abs(r.std - std_a) / std_a:.2e}")
assert abs(r.mean - mean_a) / mean_a < 1e-3
assert abs(r.std - std_a) / std_a < 3e-3

for rep in range(3):
    t0 = time.perf_counter()
    r2 = smmc.simulate_stats(g, 100_000_000, T, seed=7,
                             target_amount=2000.0, options=opts)
    _ = r2.mean
    print(f"100Mx360 rep{rep}: {time.perf_counter() - t0:.3f} s "
          f"(v8 16-bit recipe: 0.357 s)")
assert abs(r2.mean - mean_a) / mean_a < 1e-3
assert abs(r2.std - std_a) / std_a < 3e-3
print(f"100M mean {r2.mean:.2f} std {r2.std:.2f}")

# clt-prefix strategy kernel: mean and withdrawn vs closed form
pct = 0.25
keep = 1.0 - pct / 100.0
optss = EngineOptions(chunk_paths=2**22, gaussian_sampler="clt-prefix")
t0 = time.perf_counter()
rs = smmc.simulate_stats(g, 2**22, T, seed=3,
                         strategy=FixedPercentWithdrawal(pct),
                         options=optss)
_ = rs.mean
print(f"strategy compile+run: {time.perf_counter() - t0:.1f} s")
mean_s = v0 * (a * keep) ** T
# E[withdrawn_t] = v0 (a*keep)^(t-1) * a * (1-keep), summed over t=1..T
wd_a = sum(v0 * (a * keep) ** (t - 1) * a * (1.0 - keep)
           for t in range(1, T + 1))
wd = rs.total_withdrawn / 2**22
print(f"strategy mean {rs.mean:.2f} vs {mean_s:.2f} "
      f"rel {abs(rs.mean - mean_s) / mean_s:.2e}")
print(f"withdrawn/path {wd:.3f} vs {wd_a:.3f} "
      f"rel {abs(wd - wd_a) / wd_a:.2e}")
assert abs(rs.mean - mean_s) / mean_s < 2e-3
assert abs(wd - wd_a) / wd_a < 2e-3
print("v9 OK")
