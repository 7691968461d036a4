"""Law stats kernel one-hot indicator dtype A/B: i8 vs bf16 control.

ROADMAP item 4 noted the factorized one-hot build + MXU gemm is the
finals-free law kernel's largest arithmetic term (~3 ms of 9.1 ms/chunk
at 2^25; proportionally at the capped 2^24). ops/pallas_bands.py
measured int8 indicators + int32 accumulation at 482 vs 574 ms/chunk
for its per-month histogram; this experiment measures the same trade on
_build_law_stats_kernel via SMMC_LAW_OH={i8,bf16}.

Methodology (docs/profiling.md): each variant runs a warm-up process
(compile; timing ignored) then a fresh timed process, interleaved
i8/bf16 within the same batch so machine drift hits both. The bf16
trace is byte-identical to the pre-change kernel (its Mosaic cache
stays valid), making it a true control.

Usage: python experiments/exp_law_oh.py [report|run]
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
N_PATHS = 100_000_000
T = 360


def run():
    import stock_market_monte_carlo_tpu as smmc
    from stock_market_monte_carlo_tpu.config import EngineOptions

    g = smmc.GaussianReturns()
    h = smmc.HistoricalBootstrap.from_csv()
    opts = EngineOptions(terminal_law=True)
    # compile + first-touch outside the timed loop
    smmc.simulate_stats(g, opts.chunk_paths, T, seed=1, options=opts)
    smmc.simulate_stats(h, opts.chunk_paths, T, seed=1, options=opts)
    for name, model in (("gauss", g), ("hist", h)):
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            r = smmc.simulate_stats(model, N_PATHS, T, seed=2,
                                    options=opts)
            _ = float(r.mean)  # forced scalar fetch in the timed region
            best = min(best, time.perf_counter() - t0)
        print(f"LAWOH {os.environ.get('SMMC_LAW_OH', 'i8')} {name}: "
              f"best {best:.4f}s ({N_PATHS / best / 1e6:.0f}M paths/s) "
              f"mean {r.mean:.2f} std {r.std:.2f} "
              f"hist_mass {float(r.histogram_counts.sum()):.0f}",
              flush=True)


def report():
    env0 = dict(os.environ)
    env0["PYTHONPATH"] = REPO + os.pathsep + env0.get("PYTHONPATH", "")

    def one(variant, phase):
        env = dict(env0)
        env["SMMC_LAW_OH"] = variant
        print(f"--- law one-hot {variant}: {phase} ---", flush=True)
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "run"],
            env=env, check=True,
        )

    # warm both variants first, then interleave timed rounds so machine
    # drift (up to ~40% same-day, RESULTS.md) hits both equally
    for v in ("i8", "bf16"):
        one(v, "warm-up (compile; IGNORE timing)")
    for rnd in (1, 2):
        for v in ("i8", "bf16"):
            one(v, f"timed round {rnd}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "run":
        run()
    else:
        report()
