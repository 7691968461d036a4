"""Re-test CLT tile grouping (CLT_TS) under the deferred-absorb dispatch.

History: TS=2 measured a 15% win on raw repeated pallas calls but was
NEUTRAL-TO-WORSE through the engine's OLD one-deep-overlap dispatch
(0.413 s vs 0.383-0.393 s; comment at ops/pallas_engine.py:551), so the
default stayed TS=1. v14's deferred absorb changed the dispatch regime
to exactly "raw repeated calls" (all chunks queued, one combined fetch)
— the configuration where grouping WON. This re-measures TS in {1,2,4}
with the exp_dispatch_overhead methodology: isolated (1 call + fetch)
and K=6 batched (one combined forcing fetch; the honest device time),
plus an end-to-end 100M simulate_stats wall.

Streams are per-logical-tile, so every TS yields bit-identical results
(asserted here against the TS=1 run via the packed stats + histogram).

Each TS runs in its own subprocess (the kernel-builder caches key on
shapes, not TS). TS != 1 kernels compile fresh the first time (minutes).

Usage: python experiments/exp_clt_ts.py          # all three, subprocesses
       python experiments/exp_clt_ts.py child 2  # one TS, in-process
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

CHUNK = 1 << 24
T = 360
K = 6
REPS = 3
N_E2E = 100_000_000


def child(ts: int):
    import jax
    import jax.numpy as jnp

    import stock_market_monte_carlo_tpu as smmc
    from stock_market_monte_carlo_tpu.config import EngineOptions
    from stock_market_monte_carlo_tpu.engine import engine as eng
    from stock_market_monte_carlo_tpu.models.strategies import NoWithdrawal
    from stock_market_monte_carlo_tpu.ops import pallas_engine as pe

    pe.CLT_TS = ts  # before any kernel build (caches key on shapes only)

    if ts > 1:
        # TS>1 blows the DEFAULT 16MB scoped-VMEM stack (measured:
        # 16.03M at TS=4's first failure shape, 18.26M at TS=2 — the
        # unrolled group keeps both tiles' (P,K) chain buffers live).
        # v5e VMEM is 128MB physical; raise the scoped limit for this
        # experiment only, via a pallas_call wrapper (the library build
        # path takes no compiler_params).
        from jax.experimental.pallas import tpu as pltpu

        orig_call = pe.pl.pallas_call

        def patched(kernel, **kw):
            kw.setdefault("compiler_params", pltpu.CompilerParams(
                vmem_limit_bytes=28 * 1024 * 1024))
            return orig_call(kernel, **kw)

        pe.pl.pallas_call = patched

    g = smmc.GaussianReturns()
    strat = NoWithdrawal()
    root = jax.random.key(1)
    scr = jax.random.fold_in(root, 0x50B0)
    spec = eng.make_histogram_spec(g, strat, T, 1000.0,
                                   EngineOptions().histogram_bins)

    fn = eng._get_chunk_fn(
        (g.kind, getattr(g, "rng", "counter")), strat.kind,
        T, CHUNK, spec, False, None, "pallas", "clt", True,
    )

    def call(offset):
        return fn(g, strat, root, scr, jnp.float32(1000.0),
                  jnp.uint32(offset), jnp.int32(CHUNK),
                  jnp.float32(jnp.inf), jnp.float32(0.0))

    def force(outs):
        return float(sum(jnp.sum(jnp.asarray(o[0]).ravel()[:8])
                         for o in outs))

    t0 = time.perf_counter()
    stats0, hist0 = call(0)
    stats0 = [float(x) for x in jnp.asarray(stats0).ravel()]
    hsum = float(jnp.sum(hist0))
    warm_s = time.perf_counter() - t0

    iso = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        force([call(0)])
        iso = min(iso, time.perf_counter() - t0)
    bat = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        force([call(i * CHUNK) for i in range(K)])
        bat = min(bat, time.perf_counter() - t0)

    # end-to-end through the engine (deferred absorb path)
    opts = EngineOptions(chunk_paths=CHUNK, gaussian_sampler="clt")
    smmc.simulate_stats(g, CHUNK, T, seed=1, options=opts)  # warm shape
    e2e = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        res = smmc.simulate_stats(g, N_E2E, T, seed=7,
                                  target_amount=2000.0, options=opts)
        e2e = min(e2e, time.perf_counter() - t0)

    print("RESULT " + json.dumps({
        "ts": ts, "warm_s": round(warm_s, 1),
        "iso_ms": round(iso * 1000, 2),
        "batched_ms_per_chunk": round(bat * 1000 / K, 2),
        "e2e_100m_s": round(e2e, 4),
        "mean": round(res.mean, 4),
        "stats0": stats0, "hist_sum": hsum,
    }), flush=True)


def main(ts_list):
    here = os.path.abspath(__file__)
    results = []
    for ts in ts_list:
        p = subprocess.run(
            [sys.executable, here, "child", str(ts)],
            capture_output=True, text=True,
        )
        line = [ln for ln in p.stdout.splitlines()
                if ln.startswith("RESULT ")]
        if not line:
            print(f"TS={ts} FAILED rc={p.returncode}\n{p.stderr[-2000:]}")
            continue
        r = json.loads(line[0][7:])
        results.append(r)
        print(f"TS={r['ts']}: warm {r['warm_s']}s, isolated {r['iso_ms']} "
              f"ms, batched {r['batched_ms_per_chunk']} ms/chunk, "
              f"100M e2e {r['e2e_100m_s']} s, mean={r['mean']}")
    if len(results) > 1:
        base = results[0]
        for r in results[1:]:
            same = (r["stats0"] == base["stats0"]
                    and r["hist_sum"] == base["hist_sum"])
            print(f"TS={r['ts']} chunk results identical to TS=1: {same}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child(int(sys.argv[2]))
    else:
        # TS=4 measured: VMEM stack OOM at P=4096 (16.03M vs the 16M
        # scoped limit) — 2 is the largest grouping that fits
        main([int(a) for a in sys.argv[1:]] or [1, 2])
