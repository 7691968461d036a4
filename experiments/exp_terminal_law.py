"""Terminal-law sampler vs the month-loop kernels, paired processes.

The terminal-law kernel (ops/terminal_law.py) replaces T in-register
months with ONE draw per path through a 48-term Clenshaw recurrence —
~150 VPU el-ops/path vs ~10k (exact ICDF at T=360). This measures it at
100M x 360 against the production month-loop kernels in both the
stats+histogram and the stats-only (reduceBlock-contract) modes, with a
warm-up process and a fresh timed process per variant, plus an
unchanged month-loop control in the same batch to anchor machine drift.

Usage: python experiments/exp_terminal_law.py [report|run <variant>]
Variants: law, law-statsonly, hist-control (sliced-rotation historical),
          clt-control (CLT stats-only), law-historical
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
N_PATHS = 100_000_000
T = 360

VARIANTS = ("law", "law-statsonly", "law-historical", "hist-control",
            "clt-control")


def run(variant: str):
    import stock_market_monte_carlo_tpu as smmc
    from stock_market_monte_carlo_tpu.config import EngineOptions

    g = smmc.GaussianReturns()
    h = smmc.HistoricalBootstrap.from_csv()
    model, kw = g, {}
    if variant == "law":
        kw = dict(options=EngineOptions(terminal_law=True))
    elif variant == "law-statsonly":
        kw = dict(options=EngineOptions(terminal_law=True,
                                        histogram=False))
    elif variant == "law-historical":
        model = h
        kw = dict(options=EngineOptions(terminal_law=True))
    elif variant == "hist-control":
        model = h
        kw = dict(options=EngineOptions(histogram=False))
    elif variant == "clt-control":
        kw = dict(options=EngineOptions(gaussian_sampler="clt",
                                        histogram=False))
    else:
        sys.exit(f"unknown variant {variant!r}")

    opts = kw["options"]
    smmc.simulate_stats(model, opts.chunk_paths, T, seed=1, **kw)  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = smmc.simulate_stats(model, N_PATHS, T, seed=2, **kw)
        _ = float(r.mean)  # forced scalar fetch inside the timed region
        best = min(best, time.perf_counter() - t0)
    print(f"TLAW {variant}: best {best:.4f}s "
          f"({N_PATHS / best / 1e6:.0f}M paths/s) mean {r.mean:.2f} "
          f"std {r.std:.2f}")


def report():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    for variant in VARIANTS:
        for phase in ("warm-up (compile; IGNORE timing)", "timed"):
            print(f"--- terminal-law {variant}: {phase} ---", flush=True)
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "run",
                 variant],
                env=env, check=False, cwd=REPO,
            )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "run":
        if len(sys.argv) < 3:
            sys.exit("usage: exp_terminal_law.py run <variant>")
        run(sys.argv[2])
    elif len(sys.argv) > 1 and sys.argv[1] != "report":
        sys.exit("usage: exp_terminal_law.py [report|run <variant>]")
    else:
        report()
