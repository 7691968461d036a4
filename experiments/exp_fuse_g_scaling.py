"""Why is the g=64 fused law scan slow? Time fused blocks per g.

The 1e10 one-call drill measured 38.9 s (~65 ms/chunk) where unfused
dispatch had measured 5.12 s (~8.5 ms/chunk incl. floor) — yet g=4+2
fusion at 100M was neutral (optimization_log v25). This sweeps the law
kernel (and a month-loop control) over fuse_chunks in one warm process:
128 chunks (2^31 paths = exactly one seed segment) per arm, one
throwaway then min of 3.

Usage: python experiments/exp_fuse_g_scaling.py  (on the TPU, warm)
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import stock_market_monte_carlo_tpu as smmc  # noqa: E402
from stock_market_monte_carlo_tpu.config import EngineOptions  # noqa: E402

N = 128 * 2**24  # one full seed segment, 128 chunks
T = 360


def arm(model, fuse, terminal_law, reps=3):
    o = EngineOptions(terminal_law=terminal_law, fuse_chunks=fuse)
    best = None
    smmc.simulate_stats(model, N, T, seed=7, target_amount=2000.0,
                        options=o)  # throwaway
    for _ in range(reps):
        t0 = time.perf_counter()
        smmc.simulate_stats(model, N, T, seed=7, target_amount=2000.0,
                            options=o)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    hist = smmc.HistoricalBootstrap.from_csv()
    for fuse in (0, 4, 16, 64):
        b = arm(hist, fuse, True)
        print(f"law      fuse={fuse:3d}: {b:7.3f} s "
              f"({b / 128 * 1000:6.2f} ms/chunk)", flush=True)
    # month-loop control at 1/4 the chunks (compute-bound, ~80 ms/chunk)
    global N
    N = 32 * 2**24
    for fuse in (0, 64):
        b = arm(hist, fuse, False, reps=1)
        print(f"monthloop fuse={fuse:3d}: {b:7.3f} s "
              f"({b / 32 * 1000:6.2f} ms/chunk)", flush=True)


if __name__ == "__main__":
    main()
