"""clt-prefix withdrawn-total prefix: Hillis-Steele rolls vs MXU matmul.

The clt-prefix strategy kernel spends its overhead (1.007 s vs the
0.401 s keep-fold run at 100M x 360) on a 7-step roll-multiply-select
lane prefix per 128-month block (~24 serially-dependent VPU ops on the
(P, K) tile). Candidate: compute the exclusive prefix product in log
space as ONE strictly-lower-triangular (128, 128) MXU matmul —
excl = exp(log(gk) @ L) — trading the roll chain for log+exp (two
VPU transcendentals) plus an f32 matmul that can overlap the VPU work.
Numpy cross-check: ~1e-6 relative agreement; interpret-mode identity
verified on CPU.

Methodology (docs/profiling.md): each variant runs in its own pair of
processes — warm-up (compiles; ignore timing) then timed on the warm
cache — with the roll variant re-timed as the in-batch control.

Usage: python experiments/exp_clt_prefix_mxu.py [report|run roll|run mxu]
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PATHS = 100_000_000
T = 360


def run(impl: str):
    os.environ["SMMC_CLT_PREFIX"] = impl
    import stock_market_monte_carlo_tpu as smmc
    from stock_market_monte_carlo_tpu.config import EngineOptions
    from stock_market_monte_carlo_tpu.models.strategies import (
        FixedPercentWithdrawal,
    )

    opts = EngineOptions(gaussian_sampler="clt-prefix",
                         chunk_paths=1 << 24)
    strat = FixedPercentWithdrawal(0.25)
    g = smmc.GaussianReturns()
    smmc.simulate_stats(g, 1 << 24, T, seed=1, strategy=strat,
                        options=opts)  # warm
    best = float("inf")
    r = None
    for _ in range(3):
        t0 = time.perf_counter()
        r = smmc.simulate_stats(g, N_PATHS, T, seed=1, strategy=strat,
                                options=opts)
        _ = r.mean
        best = min(best, time.perf_counter() - t0)
    # exactness: constant-keep closed form for the withdrawn total
    k = 1 - 0.25 / 100
    a = 1.005
    mean_final = 1000 * (a * k) ** T
    # E[withdrawn] = v0*(1-k)*a * sum_{t=0}^{T-1} (a*k)^t
    wd_exact = 1000 * (1 - k) * a * ((a * k) ** T - 1) / (a * k - 1)
    wd = r.moments.total_withdrawn / N_PATHS
    print(f"PREFIX {impl}: best {best:.4f}s | mean rel err "
          f"{abs(r.mean / mean_final - 1):.2e} | withdrawn rel err "
          f"{abs(wd / wd_exact - 1):.2e}")


def report():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    for impl in ("roll", "mxu"):
        for phase in ("warm-up (compile; IGNORE timing)", "timed"):
            print(f"--- {impl}: {phase} ---", flush=True)
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "run", impl],
                env=env, check=False, cwd=REPO,
            )


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "run":
        run(sys.argv[2])
    else:
        report()
