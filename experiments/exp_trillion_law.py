"""One trillion exact terminal-law paths on one chip, one call.

The composition that makes this a ~4-minute single-call run instead of
an impossible one:

- terminal-law sampler (ops/terminal_law.py): ~150 el-ops/path instead
  of ~10k for the 360-month loop;
- seed segmentation (EngineOptions.seed_segment_paths): 1e12 paths =
  466 seed segments of 2^31, merged exactly in float64 — no manual
  seed splitting, no uint32 offset limit;
- fused dispatch (fuse_chunks=64): 59,605 chunks ride ~935 device
  dispatches, amortizing the ~5-8 ms per-dispatch tunnel floor that
  would otherwise add ~5 minutes by itself;
- deferred absorb: statistics fetched in 256-chunk stacked blocks, so
  host round-trips total ~230 instead of ~60k.

Every count stays exact (f32 on-device counts <= 2^24 per chunk, f64
host accumulation exact to 2^53 >> 1e12). The reference's flagship
claim is 1e9 paths "in a few seconds" on an RTX 3070 (README.md:45-49,
mean/var only); this is 1000x that workload with a full 4096-bin
histogram, count-below, extrema, and skew/kurtosis.

Usage: python experiments/exp_trillion_law.py [n_paths]
(on the TPU; run scripts/warm_kernels.py first)
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402

import stock_market_monte_carlo_tpu as smmc  # noqa: E402
from stock_market_monte_carlo_tpu.config import EngineOptions  # noqa: E402


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 10**12
    hist = smmc.HistoricalBootstrap.from_csv()
    opts = EngineOptions(chunk_paths=2**24, terminal_law=True)
    # warm the single-chunk + fused-scan programs (cache hits after
    # scripts/warm_kernels.py; pays the per-process first-compile stall
    # here rather than inside the timed run)
    smmc.simulate_stats(hist, 124 * 2**24, 360, seed=1,
                        target_amount=2000.0, options=opts)
    t0 = time.perf_counter()
    r = smmc.simulate_stats(hist, n, 360, seed=7, target_amount=2000.0,
                            options=opts)
    dt = time.perf_counter() - t0
    counts = np.asarray(r.histogram_counts)
    out = {
        "n_paths": n,
        "n_periods": 360,
        "wall_s": round(dt, 2),
        "paths_per_s": round(n / dt, 1),
        "chunks": -(-n // 2**24),
        "seed_segments": -(-n // (1 << 31)),
        "mean": round(r.mean, 2),
        "std": round(r.std, 2),
        "skew": round(r.moments.skew, 4),
        "kurtosis": round(r.moments.kurtosis, 4),
        "count_below_2000": int(r.count_below),
        "p_below_2000": r.count_below / n,
        "hist_sum_exact": float(counts.sum()) == float(n),
        "min": round(r.moments.min, 2),
        "max": round(r.moments.max, 2),
    }
    print(json.dumps(out, indent=1), flush=True)
    assert out["hist_sum_exact"]


if __name__ == "__main__":
    main()
