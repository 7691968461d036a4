"""Headline benchmark: 100M Gaussian paths x 360 months, simulated and
reduced to moments + a 4096-bin final-value histogram on device.

Reference baseline (BASELINE.md): the RTX 3070 reduceBlock kernel runs the
same workload size (historical mode, mean/var only — no histogram) in
0.13 s => 769.2M paths/s. ``vs_baseline`` is our paths/s/chip over that.

Prints ONE JSON line. Usage: python bench.py [n_paths] [n_periods]
"""

import json
import sys
import time

import jax

import stock_market_monte_carlo_tpu as smmc
from stock_market_monte_carlo_tpu.config import EngineOptions

BASELINE_PATHS_PER_S = 100_000_000 / 0.13  # RTX 3070 reduceBlock


def main():
    n_paths = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    n_periods = int(sys.argv[2]) if len(sys.argv) > 2 else 360

    model = smmc.GaussianReturns()

    def timed(sampler):
        opts = EngineOptions(chunk_paths=2**24, gaussian_sampler=sampler)
        # warmup compiles the single chunk shape (the engine pads the
        # ragged tail rather than switching shapes)
        smmc.simulate_stats(model, 2**24, n_periods, seed=1,
                            target_amount=2000.0, options=opts)
        t0 = time.perf_counter()
        res = smmc.simulate_stats(
            model, n_paths, n_periods, seed=7, target_amount=2000.0,
            options=opts,
        )
        return time.perf_counter() - t0, res

    t_icdf, res = timed("icdf")
    t_clt, res_clt = timed("clt")

    n_chips = max(1, len(jax.devices()))
    best = min(t_icdf, t_clt)
    paths_per_sec_chip = n_paths / best / n_chips

    analytic_mean = 1000.0 * (1 + 0.5 / 100) ** n_periods
    rel_err = abs(res.mean - analytic_mean) / analytic_mean
    rel_err_clt = abs(res_clt.mean - analytic_mean) / analytic_mean

    print(json.dumps({
        "metric": "paths_per_sec_per_chip_360mo_gaussian_fused_hist",
        "value": round(paths_per_sec_chip, 1),
        "unit": "paths/s/chip",
        "vs_baseline": round(paths_per_sec_chip / BASELINE_PATHS_PER_S, 4),
        "extra": {
            "n_paths": n_paths,
            "n_periods": n_periods,
            "elapsed_s_icdf": round(t_icdf, 4),
            "elapsed_s_clt": round(t_clt, 4),
            "n_chips": n_chips,
            "backend": jax.default_backend(),
            "mean": round(res.mean, 2),
            "std": round(res.std, 2),
            "mean_rel_err_vs_analytic_icdf": float(f"{rel_err:.2e}"),
            "mean_rel_err_vs_analytic_clt": float(f"{rel_err_clt:.2e}"),
        },
    }))


if __name__ == "__main__":
    main()
