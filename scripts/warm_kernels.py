"""Warm the remote Mosaic compile cache for the standard kernel matrix.

Fresh kernel compiles through this environment's remote compile service
cost minutes (observed 2-17 min within one day) and inflate any timing
taken in the same process by 30-40% (docs/optimization_log.md). Run this
once after changing kernel code so benchmarks and tests hit the cache.

Each entry runs ONE standard-chunk-shaped dispatch (2^24 paths for the
big engines, one tile for the small variants) — enough to compile and
cache every kernel the bench harness and the TPU test suite use.

Usage: python scripts/warm_kernels.py  (on the TPU; ~1 min warm,
longer on a cold cache)
"""

import os
import sys
import time

import jax

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import stock_market_monte_carlo_tpu as smmc  # noqa: E402
from stock_market_monte_carlo_tpu.config import EngineOptions  # noqa: E402
from stock_market_monte_carlo_tpu.models.strategies import (  # noqa: E402
    FixedAmountWithdrawal,
    FixedPercentWithdrawal,
)

T = 360
CHUNK = 2**24


def main():
    print(f"backend: {jax.default_backend()}")
    gauss = smmc.GaussianReturns()
    hist = smmc.HistoricalBootstrap.from_csv()
    sobol = smmc.SobolGaussianReturns.create(n_periods=T)
    sobol120 = smmc.SobolGaussianReturns.create(n_periods=120)

    def opts(**kw):
        kw.setdefault("chunk_paths", CHUNK)
        return EngineOptions(**kw)

    jobs = [
        ("historical", hist, {}, opts()),
        ("historical stats-only", hist, {}, opts(histogram=False)),
        ("gauss icdf", gauss, {}, opts()),
        ("gauss clt", gauss, {}, opts(gaussian_sampler="clt")),
        ("gauss clt stats-only", gauss, {},
         opts(gaussian_sampler="clt", histogram=False)),
        ("icdf + fixed-percent", gauss,
         {"strategy": FixedPercentWithdrawal(0.25)}, opts()),
        ("icdf + fixed-amount", gauss,
         {"strategy": FixedAmountWithdrawal(2.0)}, opts()),
        ("clt-prefix strategy", gauss,
         {"strategy": FixedPercentWithdrawal(0.25)},
         opts(gaussian_sampler="clt-prefix", chunk_paths=2**22)),
        ("clt-nw keep-fold strategy", gauss,
         {"strategy": FixedPercentWithdrawal(0.25)},
         opts(gaussian_sampler="clt", track_withdrawn=False)),
        ("sobol gaussian", sobol, {}, opts(chunk_paths=2**18)),
        ("sobol gaussian 120mo (bench_all)", sobol120, {},
         opts(chunk_paths=2**17)),
        ("keep-finals clt", gauss, {"keep_final_values": True},
         opts(gaussian_sampler="clt", chunk_paths=2**18)),
        # the terminal-law kernels are model/horizon-independent (runtime
        # coefficient operand): the grouped finals-free kernel (hist +
        # no-hist) plus the finals-writing kernel cover every
        # market/T/v0/keep config
        ("terminal-law", gauss, {}, opts(terminal_law=True)),
        ("terminal-law no-hist", gauss, {},
         opts(terminal_law=True, histogram=False)),
        ("terminal-law keep-finals", gauss, {"keep_final_values": True},
         opts(terminal_law=True, chunk_paths=2**18)),
    ]
    for name, model, kw, o in jobs:
        periods = 120 if "120mo" in name else T
        t0 = time.perf_counter()
        r = smmc.simulate_stats(model, o.chunk_paths, periods, seed=1,
                                target_amount=2000.0, options=o, **kw)
        _ = r.mean
        print(f"  {name:24s} {time.perf_counter() - t0:7.1f} s")

    # finals-free CLT variants (SMMC_CLT_FINALSFREE=1; same streams, no
    # finals output — the env knob is read at trace time and keys every
    # build cache, so warming both variants from one process is safe)
    os.environ["SMMC_CLT_FINALSFREE"] = "1"
    try:
        for name, o in [
            ("clt finals-free", opts(gaussian_sampler="clt")),
            ("clt finals-free stats-only",
             opts(gaussian_sampler="clt", histogram=False)),
        ]:
            t0 = time.perf_counter()
            r = smmc.simulate_stats(gauss, o.chunk_paths, T, seed=1,
                                    target_amount=2000.0, options=o)
            _ = r.mean
            print(f"  {name:24s} {time.perf_counter() - t0:7.1f} s")
    finally:
        del os.environ["SMMC_CLT_FINALSFREE"]

    # fused multi-chunk dispatch (EngineOptions.fuse_chunks): 100M-class
    # runs binary-decompose 6 chunks into scan blocks of 4 + 2 — one XLA
    # program per (kernel config, block size). The Mosaic kernel inside
    # the scan is the already-warmed body (cache hit); this warms the
    # surrounding XLA scan programs bench.py dispatches.
    fused_jobs = [
        ("fused law historical", hist, opts(terminal_law=True)),
        ("fused law hist. no-hist", hist,
         opts(terminal_law=True, histogram=False)),
        ("fused law gauss", gauss, opts(terminal_law=True)),
        ("fused historical", hist, opts()),
        ("fused historical no-hist", hist, opts(histogram=False)),
        ("fused gauss icdf", gauss, opts()),
        ("fused gauss clt", gauss, opts(gaussian_sampler="clt")),
        ("fused gauss clt no-hist", gauss,
         opts(gaussian_sampler="clt", histogram=False)),
    ]
    for name, model, o in fused_jobs:
        t0 = time.perf_counter()
        r = smmc.simulate_stats(model, 6 * CHUNK, T, seed=1,
                                target_amount=2000.0, options=o)
        _ = r.mean
        print(f"  {name:24s} {time.perf_counter() - t0:7.1f} s")

    # billion-path-class fused blocks: the 1e10 law run (seed segments
    # of 2^31 = 128 chunks) dispatches scan lengths 64/16, the 1e9
    # month-loop 32/16/8/4 (scripts/scale_fault_drill_tpu.py). 124
    # chunks = 64+32+16+8+4 warms every power of two >= 4 in one call.
    big_jobs = [
        ("fused law historical x124", hist, opts(terminal_law=True)),
        ("fused historical x124", hist, opts()),
    ]
    for name, model, o in big_jobs:
        t0 = time.perf_counter()
        r = smmc.simulate_stats(model, 124 * CHUNK, T, seed=1,
                                target_amount=2000.0, options=o)
        _ = r.mean
        print(f"  {name:24s} {time.perf_counter() - t0:7.1f} s")

    # the do-nothing grid toy bench.py uses as its dispatch floor
    t0 = time.perf_counter()
    from experiments.exp_grid_overhead import _make

    import jax.numpy as jnp

    toy = jax.jit(_make("const", 16))
    _ = float(jnp.sum(toy(jnp.array([12345, 0, 0, 0, 0, 0, 0, 0],
                                    jnp.int32))[1][:8]))
    print(f"  {'dispatch-floor toy':24s} {time.perf_counter() - t0:7.1f} s")

    # fused band kernels (ops/pallas_bands.py): one full-chunk grid each
    band_jobs = [
        ("bands gauss", gauss, {}),
        ("bands historical", hist, {}),
        ("bands fixed-percent", gauss,
         {"strategy": FixedPercentWithdrawal(0.25)}),
        ("cdf-bands gauss", gauss, {"band_mode": "cdf"}),
        ("cdf-bands historical", hist, {"band_mode": "cdf"}),
        ("cdf-bands fixed-percent", gauss,
         {"strategy": FixedPercentWithdrawal(0.25), "band_mode": "cdf"}),
    ]
    for name, model, kw in band_jobs:
        t0 = time.perf_counter()
        smmc.simulate_bands(model, CHUNK, T, seed=1, sample_paths=0,
                            options=opts(), **kw)
        print(f"  {name:24s} {time.perf_counter() - t0:7.1f} s")
    print("warm done")


if __name__ == "__main__":
    main()
