"""Separate true device time from tunnel/dispatch overhead per chunk.

Follow-up to exp_grid_overhead.py (which ruled OUT per-grid-step fixed
cost: const1 == const16 at ~32-35 ms isolated). The remaining suspects
for the shared ~60-67 ms/chunk floor of the stats kernels:
  (a) per-invocation tunnel overhead (~15-25 ms, docs/profiling.md) —
      paid once per isolated timing but amortized when K chunks are
      dispatched back-to-back before one forcing fetch;
  (b) genuine kernel device time.
This times each production chunk fn (warm, cached) both ISOLATED
(1 call + fetch) and BATCHED (K=6 calls queued, one combined scalar
fetch), plus the const/prng toy kernels from exp_grid_overhead. The
batched per-chunk number is the honest device cost; the isolated-minus-
batched delta is the tunnel/dispatch tax the engine's one-deep absorb
overlap must hide.

Usage: python experiments/exp_dispatch_overhead.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

import stock_market_monte_carlo_tpu as smmc
from stock_market_monte_carlo_tpu.config import EngineOptions
from stock_market_monte_carlo_tpu.engine import engine as eng
from stock_market_monte_carlo_tpu.models.strategies import NoWithdrawal
from stock_market_monte_carlo_tpu.ops import terminal_law as tlaw

CHUNK = 1 << 24
T = 360
K = 6
REPS = 3


def variants():
    g = smmc.GaussianReturns()
    h = smmc.HistoricalBootstrap.from_csv()
    strat = NoWithdrawal()
    root = jax.random.key(1)
    scr = jax.random.fold_in(root, 0x50B0)
    law_op = jnp.asarray(
        tlaw.fit_terminal_law(g, strat, T, 1000.0).operand())
    law_op_h = jnp.asarray(
        tlaw.fit_terminal_law(h, strat, T, 1000.0).operand())
    spec = eng.make_histogram_spec(g, strat, T, 1000.0,
                                   EngineOptions().histogram_bins)
    spec_h = eng.make_histogram_spec(h, strat, T, 1000.0,
                                     EngineOptions().histogram_bins)

    def mk(model, sampler, with_hist, key2):
        fn = eng._get_chunk_fn(
            (model.kind, getattr(model, "rng", "counter")), strat.kind,
            T, CHUNK, spec_h if model.kind == "historical" else spec,
            False, None, "pallas", sampler, with_hist,
        )

        def call(offset):
            return fn(model, strat, root, key2, jnp.float32(1000.0),
                      jnp.uint32(offset), jnp.int32(CHUNK),
                      jnp.float32(jnp.inf), jnp.float32(0.0))
        return call

    return {
        "law": mk(g, "law", True, law_op),
        "law-nohist": mk(g, "law", False, law_op),
        "law-historical": mk(h, "law", True, law_op_h),
        "clt": mk(g, "clt", True, scr),
        "clt-nohist": mk(g, "clt", False, scr),
        "historical": mk(h, "icdf", True, scr),
    }


def toy_calls():
    from experiments.exp_grid_overhead import _make
    iscal = jnp.array([12345, 0, 0, 0, 0, 0, 0, 0], jnp.int32)
    out = {}
    for variant in ("const", "prng"):
        c = jax.jit(_make(variant, 1))
        out[f"toy-{variant}"] = lambda offset, c=c: c(iscal)
    return out


def force(outs):
    # one combined scalar fetch that depends on every queued chunk
    return float(sum(jnp.sum(jnp.asarray(o[0] if isinstance(o, tuple)
                                         else o).ravel()[:8])
                     for o in outs))


def main():
    print(f"backend: {jax.default_backend()}  chunk=2^24  K={K}")
    calls = {}
    calls.update(variants())
    calls.update(toy_calls())
    for name, call in calls.items():
        force([call(0)])  # warm
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
        print(f"  {name:16s} isolated {iso*1000:7.2f} ms | "
              f"batched {bat*1000/K:7.2f} ms/chunk | "
              f"tax {(iso - bat/K)*1000:6.2f} ms")


if __name__ == "__main__":
    main()
