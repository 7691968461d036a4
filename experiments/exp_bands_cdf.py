"""CDF band mode vs the hist band kernel, paired-process methodology.

The hist band kernel's per-month indicator build is relayout-bound —
~70% of the kernel (optimization_log v11); int8 indicators bought 16%.
The CDF mode (band_mode="cdf") replaces the n_bins histogram with counts
below 32 analytically-placed thresholds per month: no concatenation
relayout, no gemm, no per-month log — the structural ~2x candidate.
This measures both modes (same streams, same sample) with a warm-up
process and a fresh timed process per variant.

Usage: python experiments/exp_bands_cdf.py [report|run <hist|cdf>]
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
N_PATHS = 1 << 25   # 2 chunks of 2^24
T = 360


def run(mode: str):
    import stock_market_monte_carlo_tpu as smmc
    from stock_market_monte_carlo_tpu.config import EngineOptions

    g = smmc.GaussianReturns()
    opts = EngineOptions(backend="pallas", chunk_paths=1 << 24)
    kw = dict(seed=1, sample_paths=0, options=opts, band_mode=mode)
    if mode == "hist":
        kw["n_bins"] = 1024
    smmc.simulate_bands(g, 1 << 24, T, **kw)   # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        b = smmc.simulate_bands(g, N_PATHS, T, **kw)
        _ = float(b.values[0, -1])
        best = min(best, time.perf_counter() - t0)
    per_chunk_ms = best / (N_PATHS / (1 << 24)) * 1e3
    print(f"BANDS mode={mode}: best {best:.4f}s "
          f"({per_chunk_ms:.1f} ms / 2^24 chunk) "
          f"p50 final {b.band(0.5)[-1]:,.2f}")


def report():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    for mode in ("hist", "cdf"):
        for phase in ("warm-up (compile; IGNORE timing)", "timed"):
            print(f"--- bands mode={mode}: {phase} ---", flush=True)
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "run", mode],
                env=env, check=False, cwd=REPO,
            )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "run":
        if len(sys.argv) < 3:
            sys.exit("usage: exp_bands_cdf.py run <hist|cdf>")
        run(sys.argv[2])
    elif len(sys.argv) > 1 and sys.argv[1] != "report":
        sys.exit("usage: exp_bands_cdf.py [report|run <hist|cdf>]")
    else:
        report()
