"""In-process interleaved A/B of the law stats kernel at group 32 vs 64.

optimization_log v24 flipped the default to 32 (+17% over 16, clean
fresh-process min-of-5) and left group 64 untried on hardware (its body
took 6m41 to compile on XLA CPU; the remote Mosaic service may be
faster). This experiment answers it with ONE process (each fresh
process risks the v23 per-process first-compile stall, 250-710 s):

- warm both kernels (group is an lru_cache key of
  pallas_engine._build_law_stats_call, so both coexist; the engine's
  jitted-chunk-fn cache now ALSO keys on LAW_GROUP — ADVICE r4 #1
  found the round-4 run of this experiment cache-hit the group-32 fn
  for both arms, so its "64 is ~8% slower" verdict was same-kernel
  drift, not a measurement);
- interleave timed 100M x 360 historical terminal-law stats+hist runs
  with the arm order REVERSED on odd reps (ABBA...), so monotone
  same-session drift cancels instead of biasing the second arm;
- assert identical statistics and exit nonzero on mismatch (seeding is
  per global 8192-path tile — test_law_group_size_invariance — so only
  f32 association of the moment rows may differ: mean/std to 1e-5 rel;
  histogram/count/extrema must be exactly equal).

In-process interleaved deltas are the decision signal per
docs/profiling.md (absolute walls in a post-compile process read
30-40% high). A default flip additionally wants a fresh-process
confirmation (v24 methodology).

Usage (TPU): python experiments/exp_law_group64.py [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PATHS = 100_000_000
T = 360
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def main():
    import numpy as np

    import stock_market_monte_carlo_tpu as smmc
    from stock_market_monte_carlo_tpu.config import EngineOptions
    from stock_market_monte_carlo_tpu.ops import pallas_engine as pe

    h = smmc.HistoricalBootstrap.from_csv()
    opts = EngineOptions(terminal_law=True)

    def with_group(g, fn):
        # LAW_GROUP is a trace-time knob: engine._get_chunk_fn keys its
        # jitted-fn cache on it (ablate_key), so each arm traces and runs
        # its OWN kernel. Belt and braces: verify the cache key really
        # differs, so a future cache-key regression fails loudly here
        # instead of silently re-measuring one kernel (ADVICE r4 #1).
        old = pe.LAW_GROUP
        pe.LAW_GROUP = g
        try:
            return fn()
        finally:
            pe.LAW_GROUP = old

    def run_once():
        t0 = time.perf_counter()
        r = smmc.simulate_stats(h, N_PATHS, T, seed=2, options=opts)
        _ = float(r.mean)  # forced scalar fetch inside the timed region
        return time.perf_counter() - t0, r

    # the arms must resolve to distinct jitted chunk fns (ADVICE r4 #1)
    from stock_market_monte_carlo_tpu.engine import engine as eng

    def probe_cache_size():
        return len(eng._CHUNK_FN_CACHE)

    results = {}
    for g in (32, 64):
        print(f"--- warming group {g} (fresh Mosaic compile for 64) ---",
              flush=True)
        before = probe_cache_size()
        t0 = time.perf_counter()
        _, r = with_group(g, lambda: run_once())
        grew = probe_cache_size() - before
        print(f"group {g}: warm run {time.perf_counter() - t0:.1f}s "
              f"mean {r.mean:.4f} (+{grew} jitted fns)", flush=True)
        if g == 64 and grew == 0:
            print("FATAL: group 64 cache-hit group 32's jitted fn — the "
                  "ADVICE r4 #1 cache-key regression is back", flush=True)
            raise SystemExit(1)
        results[g] = {"res": r, "times": []}

    for rep in range(REPS):
        # reverse the arm order on odd reps so monotone same-session
        # drift biases neither arm (ADVICE r4 #3)
        order = (32, 64) if rep % 2 == 0 else (64, 32)
        for g in order:
            dt, r = with_group(g, run_once)
            results[g]["times"].append(dt)
            print(f"rep {rep} group {g}: {dt:.4f}s", flush=True)

    r32, r64 = results[32]["res"], results[64]["res"]
    m32, m64 = r32.moments, r64.moments
    hist_eq = bool(np.array_equal(np.asarray(r32.histogram_counts),
                                  np.asarray(r64.histogram_counts)))
    print(f"identity: hist_equal={hist_eq} "
          f"mean diff {abs(r32.mean - r64.mean):.3e} "
          f"std diff {abs(r32.std - r64.std):.3e} "
          f"min/max eq {m32.min == m64.min}/{m32.max == m64.max} "
          f"count_below {r32.count_below} vs {r64.count_below}", flush=True)
    for g in (32, 64):
        ts = results[g]["times"]
        print(f"group {g}: min {min(ts):.4f}s median "
              f"{sorted(ts)[len(ts) // 2]:.4f}s reps "
              f"{[round(t, 4) for t in ts]}", flush=True)
    print(f"delta (min32/min64): "
          f"{min(results[32]['times']) / min(results[64]['times']):.3f}x",
          flush=True)

    # hard identity gate (ADVICE r4 #4): a silent mismatch must not pass
    ok = (hist_eq and m32.min == m64.min and m32.max == m64.max
          and r32.count_below == r64.count_below
          and abs(r32.mean - r64.mean) <= 1e-5 * abs(r32.mean)
          and abs(r32.std - r64.std) <= 1e-4 * abs(r32.std))
    if not ok:
        print("FATAL: group 32 vs 64 statistics mismatch (beyond f32 "
              "moment-row association tolerance)", flush=True)
        raise SystemExit(1)
    print("identity: OK", flush=True)


if __name__ == "__main__":
    main()
