"""Band-kernel stage attribution with the paired-process methodology.

The fused band kernel runs 100M x 360 gaussian in ~3.1 s while the
stats kernel's identical ICDF sim loop runs 0.52 s. The v8a ablation
concluded "binning rides under the month loop's latency" from
SMMC_BANDS_ABLATE=nocount matching the full kernel — but those processes
had just compiled their variants, the condition documented to read
30-40% high. This experiment re-measures full vs nocount (sim-only) vs
nogemm (one-hots built, gemm skipped) with a warm-up process and a
fresh timed process per variant.

Usage: python experiments/exp_bands_attr.py [report|run <ablate>]
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
N_PATHS = 1 << 25   # 2 chunks of 2^24
T = 360


def run(ablate: str):
    if ablate and ablate != "full":
        os.environ["SMMC_BANDS_ABLATE"] = ablate
    import stock_market_monte_carlo_tpu as smmc
    from stock_market_monte_carlo_tpu.config import EngineOptions

    g = smmc.GaussianReturns()
    opts = EngineOptions(backend="pallas", chunk_paths=1 << 24)
    kw = dict(seed=1, n_bins=1024, sample_paths=0, options=opts)
    smmc.simulate_bands(g, 1 << 24, T, **kw)   # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        b = smmc.simulate_bands(g, N_PATHS, T, **kw)
        _ = float(b.values[0, -1])
        best = min(best, time.perf_counter() - t0)
    per_chunk_ms = best / (N_PATHS / (1 << 24)) * 1e3
    print(f"BANDS {ablate or 'full'}: best {best:.4f}s "
          f"({per_chunk_ms:.1f} ms / 2^24 chunk)")


def report():
    env = {k: v for k, v in os.environ.items()
           if k != "SMMC_BANDS_ABLATE"}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    for ablate in ("full", "nocount", "nogemm"):
        for phase in ("warm-up (compile; IGNORE timing)", "timed"):
            print(f"--- bands {ablate}: {phase} ---", flush=True)
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "run",
                 ablate],
                env=env, check=False, cwd=REPO,
            )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "run":
        if len(sys.argv) < 3:
            sys.exit("usage: exp_bands_attr.py run <full|nocount|nogemm>")
        run(sys.argv[2])
    elif len(sys.argv) > 1 and sys.argv[1] != "report":
        sys.exit("usage: exp_bands_attr.py [report|run <ablate>]")
    else:
        report()
