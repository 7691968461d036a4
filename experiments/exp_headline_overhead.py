"""Attribute the ~50 ms fixed cost of the 100M law headline call.

exp_headline_fuse (round 5) showed single-dispatch fusion does NOT move
the wall (fused6 72.8 ms vs fused4+2 68.5 ms; statsonly 57 ms) although
the modeled device time is ~20-25 ms — so the wall is a fixed per-CALL
cost, not per-dispatch. Suspects, probed separately here:

  A. host->device upload of call arguments: every simulate_stats call
     creates fresh jnp scalars (v0, target, shift) + the (g,) offsets/
     valids arrays — each a tunnel transfer;
  B. the final jax.device_get of the stacked (g,9)+(g,4098) rows
     (~100 KB) vs a scalar forcing fetch;
  C. Python-side per-call work (fit cache hit, spec build, validation).

Usage (TPU): python experiments/exp_headline_overhead.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

import stock_market_monte_carlo_tpu as smmc
from stock_market_monte_carlo_tpu.config import EngineOptions
from stock_market_monte_carlo_tpu.engine import engine as eng


def t(fn, reps=20, warm=2):
    for _ in range(warm):
        fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best * 1000


def main():
    print(f"backend={jax.default_backend()}")

    # --- A: argument-upload cost -----------------------------------------
    def make_scalars():
        a = jnp.float32(1.23)
        b = jnp.float32(2000.0)
        c = jnp.uint32(7)
        d = jnp.asarray(np.arange(6, dtype=np.uint32))
        e = jnp.asarray(np.full(6, 1 << 24, np.int32))
        return a, b, c, d, e

    print(f"A: create 5 fresh device args: {t(make_scalars):.2f} ms")
    arrs = make_scalars()

    def block_scalars():
        objs = make_scalars()
        for o in objs:
            o.block_until_ready()

    print(f"A: create + block 5 device args: {t(block_scalars):.2f} ms")

    # --- B: fetch cost ----------------------------------------------------
    big = jnp.zeros((6, 4098), jnp.float32) + 1
    small = jnp.zeros((9,), jnp.float32) + 1
    big.block_until_ready(); small.block_until_ready()
    print(f"B: device_get (6,4098) f32: "
          f"{t(lambda: jax.device_get(big)):.2f} ms")
    print(f"B: device_get (9,) f32:     "
          f"{t(lambda: jax.device_get(small)):.2f} ms")
    print(f"B: device_get both (tuple): "
          f"{t(lambda: jax.device_get((small, big))):.2f} ms")
    print(f"B: scalar float(jnp.sum):   "
          f"{t(lambda: float(jnp.sum(small))):.2f} ms")

    # --- C: python-side per-call work up to (not including) dispatch -----
    h = smmc.HistoricalBootstrap.from_csv()
    from stock_market_monte_carlo_tpu.models.strategies import NoWithdrawal
    from stock_market_monte_carlo_tpu.ops import terminal_law as tlaw

    strat = NoWithdrawal()
    fit_first = time.perf_counter()
    tlaw.fit_terminal_law(h, strat, 360, 1000.0)
    print(f"C: fit_terminal_law FIRST: "
          f"{(time.perf_counter() - fit_first) * 1000:.1f} ms")
    print(f"C: fit_terminal_law cached: "
          f"{t(lambda: tlaw.fit_terminal_law(h, strat, 360, 1000.0)):.2f}"
          " ms")
    print(f"C: make_histogram_spec: "
          f"{t(lambda: eng.make_histogram_spec(h, strat, 360, 1000.0, 4096)):.2f}"
          " ms")
    print(f"C: _validate_run: "
          f"{t(lambda: eng._validate_run(h, 100_000_000, 1 << 24, 360, draws_bootstrap=False, seg_paths=1 << 31)):.2f}"
          " ms")
    print(f"C: analytic_moment_shift: "
          f"{t(lambda: eng.analytic_moment_shift(h, strat, 360)):.2f} ms")

    # --- end-to-end sanity: the full call again in this process ----------
    opts = EngineOptions(terminal_law=True)
    smmc.simulate_stats(h, 100_000_000, 360, seed=1, target_amount=2000.0,
                        options=opts)  # warm/compile

    def full():
        smmc.simulate_stats(h, 100_000_000, 360, seed=7,
                            target_amount=2000.0, options=opts)

    print(f"full simulate_stats 100M law hist: {t(full, reps=7):.1f} ms")

    # statsonly with histogram rows skipped: how much is the hist fetch?
    opts2 = EngineOptions(terminal_law=True, histogram=False)
    smmc.simulate_stats(h, 100_000_000, 360, seed=1, target_amount=2000.0,
                        options=opts2)

    def full_so():
        smmc.simulate_stats(h, 100_000_000, 360, seed=7,
                            target_amount=2000.0, options=opts2)

    print(f"full simulate_stats 100M law statsonly: {t(full_so, reps=7):.1f} ms")


if __name__ == "__main__":
    main()
