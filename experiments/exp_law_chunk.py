"""Terminal-law chunk-size scaling: dispatch count vs per-dispatch cost.

The finals-free law kernel (ops/pallas_engine._build_law_stats_kernel)
holds no per-path state in HBM, so the chunk size is no longer bounded
by the finals buffer — one 2^27-path dispatch can cover a 100M-path run
(the engine pads the last chunk; the ragged mask keeps stats exact).
This measures 100M x 360 Gaussian law stats+hist at chunk_paths in
{2^23, 2^24 (default)} with the paired warm-up/timed process pattern
(docs/profiling.md).

HISTORY: this experiment originally swept up to 2^27 and found 2^25 the
sweet spot (0.078 s vs 0.085-0.095 s at 2^24; 2^26/2^27 pad 100M->134M
and give it back). chunk_paths is now CAPPED at 2^24 (config.py): counts
accumulate in f32 on device, which is exact only to 2^24 per chunk —
the ~3% tunnel-dispatch saving did not justify breaking the exact-count
contract. The sweep keeps the sub-cap points for regression tracking.

Usage: python experiments/exp_law_chunk.py [report|run <log2_chunk>]
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
N_PATHS = 100_000_000
T = 360

CHUNKS = (23, 24)  # capped at 2^24 — see HISTORY above


def run(log2_chunk: int):
    import stock_market_monte_carlo_tpu as smmc
    from stock_market_monte_carlo_tpu.config import EngineOptions

    g = smmc.GaussianReturns()
    opts = EngineOptions(terminal_law=True, chunk_paths=2**log2_chunk)
    smmc.simulate_stats(g, opts.chunk_paths, T, seed=1, options=opts)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = smmc.simulate_stats(g, N_PATHS, T, seed=2, options=opts)
        _ = float(r.mean)  # forced scalar fetch inside the timed region
        best = min(best, time.perf_counter() - t0)
    print(f"LAWCHUNK 2^{log2_chunk}: best {best:.4f}s "
          f"({N_PATHS / best / 1e6:.0f}M paths/s) mean {r.mean:.2f} "
          f"std {r.std:.2f}")


def report():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    for c in CHUNKS:
        for phase in ("warm-up (compile; IGNORE timing)", "timed"):
            print(f"--- law chunk 2^{c}: {phase} ---", flush=True)
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "run",
                 str(c)],
                env=env, check=False, cwd=REPO,
            )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "run":
        run(int(sys.argv[2]))
    elif len(sys.argv) > 1 and sys.argv[1] != "report":
        sys.exit("usage: exp_law_chunk.py [report|run <log2_chunk>]")
    else:
        report()
