"""A/B: fused multi-chunk dispatch (fuse_chunks=64) vs per-chunk (0).

Methodology (docs/profiling.md + optimization_log v24): run each arm in
THIS process after scripts/warm_kernels.py has cached every program;
100M x 360, min of 5 reps after one throwaway, arms interleaved per
kernel so machine drift hits both. The law kernel is the headline
(device ~4 ms/chunk vs a ~5-8 ms per-dispatch floor — the fusion
target); historical month-loop is the compute-bound control whose
device time should dominate either way.

Usage: python experiments/exp_fuse_ab.py  (on the TPU)
"""

import dataclasses
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import stock_market_monte_carlo_tpu as smmc  # noqa: E402
from stock_market_monte_carlo_tpu.config import EngineOptions  # noqa: E402

N = 100_000_000
T = 360
REPS = 5


def time_arm(model, opts, reps=REPS):
    smmc.simulate_stats(model, N, T, seed=7, target_amount=2000.0,
                        options=opts)  # throwaway (compile + cache touch)
    best = None
    times = []
    res = None
    for _ in range(reps):
        t0 = time.perf_counter()
        res = smmc.simulate_stats(model, N, T, seed=7,
                                  target_amount=2000.0, options=opts)
        dt = time.perf_counter() - t0
        times.append(round(dt, 4))
        best = dt if best is None else min(best, dt)
    return best, times, res


def main():
    hist = smmc.HistoricalBootstrap.from_csv()
    gauss = smmc.GaussianReturns()
    configs = [
        ("law historical hist", hist, EngineOptions(terminal_law=True)),
        ("law historical statsonly", hist,
         EngineOptions(terminal_law=True, histogram=False)),
        ("clt gauss hist", gauss, EngineOptions(gaussian_sampler="clt")),
        ("clt gauss statsonly", gauss,
         EngineOptions(gaussian_sampler="clt", histogram=False)),
        ("historical month-loop", hist, EngineOptions()),
    ]
    for name, model, opts in configs:
        b_f, t_f, r_f = time_arm(model, opts)
        b_u, t_u, r_u = time_arm(
            model, dataclasses.replace(opts, fuse_chunks=0))
        import numpy as np

        ident = (r_f.moments == r_u.moments and (
            r_f.histogram_counts is None
            or np.array_equal(r_f.histogram_counts, r_u.histogram_counts)))
        print(f"{name:26s} fused {b_f:.4f}s {t_f}  unfused {b_u:.4f}s "
              f"{t_u}  speedup {b_u / b_f:.2f}x identical={ident}",
              flush=True)


if __name__ == "__main__":
    main()
