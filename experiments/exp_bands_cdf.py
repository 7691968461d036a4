"""CDF band mode vs the hist band kernel, paired-process methodology.

The hist band kernel's per-month indicator build is relayout-bound —
~70% of the kernel (optimization_log v11); int8 indicators bought 16%.
The CDF mode (band_mode="cdf") replaces the n_bins histogram with counts
below 32 analytically-placed thresholds per month: no concatenation
relayout, no gemm, no per-month log — the structural ~2x candidate.
This measures both modes (same streams, same sample) with a warm-up
process and a fresh timed process per variant.

Counting-impl A/B (optimization_log v18): `run cdf-roll` / `cdf-rows` /
`cdf-bcast3d` pin SMMC_BANDS_CDF_IMPL for the subprocess; `report impl`
sweeps the three against each other (bit-identical counts, so the only
signal is time).

Usage: python experiments/exp_bands_cdf.py [report [impl]|run <variant>]
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
N_PATHS = 1 << 25   # 2 chunks of 2^24
T = 360

VARIANTS = ("hist", "cdf", "cdf-roll", "cdf-rows", "cdf-bcast3d")


def run(variant: str):
    mode = "hist" if variant == "hist" else "cdf"
    # pin the counting impl BEFORE the import reads it, so direct
    # `run cdf-roll` invocations measure what their label says (report()
    # also pins it for the subprocess; plain "cdf" measures the default)
    if variant.startswith("cdf-"):
        os.environ["SMMC_BANDS_CDF_IMPL"] = variant[len("cdf-"):]
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
    print(f"BANDS variant={variant}: best {best:.4f}s "
          f"({per_chunk_ms:.1f} ms / 2^24 chunk) "
          f"p50 final {b.band(0.5)[-1]:,.2f}")


def report(variants):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    for variant in variants:
        venv = dict(env)
        # a stray exported knob must not silently change the baseline
        venv.pop("SMMC_BANDS_CDF_IMPL", None)
        if variant.startswith("cdf-"):
            venv["SMMC_BANDS_CDF_IMPL"] = variant[len("cdf-"):]
        for phase in ("warm-up (compile; IGNORE timing)", "timed"):
            print(f"--- bands variant={variant}: {phase} ---", flush=True)
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "run",
                 variant],
                env=venv, check=False, cwd=REPO,
            )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "run":
        if len(sys.argv) < 3 or sys.argv[2] not in VARIANTS:
            sys.exit(f"usage: exp_bands_cdf.py run <{'|'.join(VARIANTS)}>")
        run(sys.argv[2])
    elif len(sys.argv) > 1 and sys.argv[1] == "report":
        if len(sys.argv) == 2:
            report(("hist", "cdf"))
        elif sys.argv[2:] == ["impl"]:
            report(("cdf-roll", "cdf-rows", "cdf-bcast3d"))
        else:
            # unknown modifiers must not silently burn a 4-phase TPU
            # sweep measuring the wrong thing
            sys.exit("usage: exp_bands_cdf.py report [impl]")
    elif len(sys.argv) > 1:
        sys.exit("usage: exp_bands_cdf.py [report [impl]|run <variant>]")
    else:
        report(("hist", "cdf"))
