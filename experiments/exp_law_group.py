"""Law stats kernel grid-group sweep: tiles per grid step in {16,32,64}.

optimization_log v15 measured a 5.6 ms/chunk do-nothing dispatch floor
on the group=16 grid (128 steps at 2^24-path chunks, ~44 us/step).
Doubling SMMC_LAW_GROUP halves the step count, trading per-step
overhead against a longer unrolled kernel body (group x LAW_D Clenshaw
unroll). Streams are seeded per global 8192-path tile, so every group
size samples the IDENTICAL paths; only f32 association of the moment
rows can differ (histogram/min/max/count-below stay exact).

Methodology (docs/profiling.md): warm every variant first (fresh Mosaic
compiles), then interleave timed fresh processes so machine drift hits
all variants equally.

Usage: python experiments/exp_law_group.py [report|run]
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
N_PATHS = 100_000_000
T = 360
GROUPS = ("16", "32", "64")


def run():
    import stock_market_monte_carlo_tpu as smmc
    from stock_market_monte_carlo_tpu.config import EngineOptions

    h = smmc.HistoricalBootstrap.from_csv()
    opts = EngineOptions(terminal_law=True)
    smmc.simulate_stats(h, opts.chunk_paths, T, seed=1, options=opts)
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        r = smmc.simulate_stats(h, N_PATHS, T, seed=2, options=opts)
        _ = float(r.mean)  # forced scalar fetch in the timed region
        best = min(best, time.perf_counter() - t0)
    print(f"LAWGROUP {os.environ.get('SMMC_LAW_GROUP', '16')}: "
          f"best {best:.4f}s ({N_PATHS / best / 1e6:.0f}M paths/s) "
          f"mean {r.mean:.2f} std {r.std:.2f} "
          f"hist_mass {float(r.histogram_counts.sum()):.0f}", flush=True)


def report():
    env0 = dict(os.environ)
    env0["PYTHONPATH"] = REPO + os.pathsep + env0.get("PYTHONPATH", "")

    def one(g, phase):
        env = dict(env0)
        env["SMMC_LAW_GROUP"] = g
        print(f"--- law group {g}: {phase} ---", flush=True)
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "run"],
            env=env, check=True,
        )

    for g in GROUPS:
        one(g, "warm-up (compile; IGNORE timing)")
    for rnd in (1, 2):
        for g in GROUPS:
            one(g, f"timed round {rnd}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "run":
        run()
    else:
        report()
