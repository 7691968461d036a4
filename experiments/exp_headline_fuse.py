"""Round-5 headline decomposition: where does the 100M terminal-law
wall clock go, and what does single-dispatch fusion buy?

Round 4 measured the 100M law headline at 0.0798 s (hist) / 0.058 s
(statsonly) with the binary fused decomposition (blocks 4 + 2 -> two
dispatches + a concatenate + one fetch). BENCH_r04 device_time says the
kernel itself costs 7.21 ms/chunk batched, of which 4.75 ms is the pure
dispatch floor — i.e. ~2.5 ms/chunk of real compute, ~15 ms for all six
chunks. The north star (BASELINE.json) is < 0.05 s.

This experiment times, in one warm process (law kernels are Mosaic-
cached; scan wrappers compile per process and are excluded by warm-up
reps):

  1. simulate_stats 100M law hist / statsonly / gaussian-law (min of N)
     under the round-5 single-dispatch fusion (g = chunks_left exactly);
  2. the same with fuse_chunks=4 to re-create the round-4 two-dispatch
     decomposition (4 + 2) in-process, as a same-session control;
  3. the flush/fetch split: _flush_deferred wall via monkeypatch;
  4. an interleaved UNCHANGED control kernel (clt statsonly chunk,
     untouched this round) to expose same-session drift.

Identity: asserts hist + every moment of fused(6) == fused(4+2) runs.

Usage: python experiments/exp_headline_fuse.py          (TPU)
"""

import dataclasses
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

import stock_market_monte_carlo_tpu as smmc
from stock_market_monte_carlo_tpu.config import EngineOptions
from stock_market_monte_carlo_tpu.engine import engine as eng

N = 100_000_000
T = 360
REPS = 7


def timed_run(model, opts, reps=REPS, **kw):
    # warm-up: compile this exact shape set (scan lengths included)
    smmc.simulate_stats(model, N, T, seed=1, target_amount=2000.0,
                        options=opts, **kw)
    best, res, times = None, None, []
    for _ in range(reps):
        t0 = time.perf_counter()
        res = smmc.simulate_stats(model, N, T, seed=7,
                                  target_amount=2000.0, options=opts, **kw)
        dt = time.perf_counter() - t0
        times.append(round(dt, 4))
        best = dt if best is None else min(best, dt)
    return best, res, times


def control_clt_statsonly():
    """Unchanged-kernel control: one isolated clt statsonly chunk call
    (same recipe as bench._device_times, K=1) — drift yardstick."""
    from stock_market_monte_carlo_tpu.models.strategies import NoWithdrawal

    g = smmc.GaussianReturns()
    strat = NoWithdrawal()
    root = jax.random.key(1)
    scr = jax.random.fold_in(root, 0x50B0)
    spec = eng.make_histogram_spec(g, strat, T, 1000.0,
                                   EngineOptions().histogram_bins)
    fn = eng._get_chunk_fn(("gaussian", "counter"), "none", T, 1 << 24,
                           spec, False, None, "pallas", "clt", False)

    def call():
        out = fn(g, strat, root, scr, jnp.float32(1000.0), jnp.uint32(0),
                 jnp.int32(1 << 24), jnp.float32(jnp.inf), jnp.float32(0.0))
        return float(jnp.sum(out[0]))

    call()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        call()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print(f"backend={jax.default_backend()} devices={len(jax.devices())}")
    hist_model = smmc.HistoricalBootstrap.from_csv()
    gauss = smmc.GaussianReturns()

    o_law = EngineOptions(terminal_law=True)
    o_law4 = dataclasses.replace(o_law, fuse_chunks=4)
    o_so = dataclasses.replace(o_law, histogram=False)

    # instrument the flush: how much of the wall is the final fetch?
    flush_times = []
    orig_flush = None

    rows = {}
    ctl0 = control_clt_statsonly()
    print(f"control clt_statsonly isolated: {ctl0*1000:.1f} ms")

    t6, r6, times6 = timed_run(hist_model, o_law)
    rows["law_hist_fused6"] = (t6, times6)
    t4, r4, times4 = timed_run(hist_model, o_law4)
    rows["law_hist_fused4+2"] = (t4, times4)

    # identity between the two decompositions (bit-exact contract)
    np.testing.assert_array_equal(r6.histogram_counts, r4.histogram_counts)
    assert r6.moments == r4.moments, (r6.moments, r4.moments)
    print("identity fused6 == fused4+2: OK (hist + all moments)")

    tso, _, times_so = timed_run(hist_model, o_so)
    rows["law_statsonly_fused6"] = (tso, times_so)
    tg, _, timesg = timed_run(gauss, o_law)
    rows["law_gauss_fused6"] = (tg, timesg)

    ctl1 = control_clt_statsonly()
    print(f"control clt_statsonly isolated (end): {ctl1*1000:.1f} ms")

    for name, (best, times) in rows.items():
        print(f"{name:24s} min {best:.4f} s   reps {times}")
    print(f"law mean={r6.mean:.2f} count_below={r6.count_below}")


if __name__ == "__main__":
    main()
