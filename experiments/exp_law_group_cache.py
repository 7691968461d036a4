"""Diagnose the SMMC_LAW_GROUP=32 fresh-process compile stall (v20).

Observed (optimization_log v20): the group-32 law kernel compiled and ran
fine IN-PROCESS (0.0773 s at 100M x 360, bit-identical stats), but every
FRESH process stalled >10 min at ~0% CPU re-waiting on the remote Mosaic
compile service — the 2x kernel body appears not to be served by the
remote cache across processes. This experiment separates the hypotheses:

  (H1) body-size limit: artifacts beyond some size are never stored /
       served by the remote cache — the synthetic prng-group toy
       (experiments/exp_grid_overhead._make) should reproduce the stall
       at some group size with no law-kernel specifics involved.
  (H2) law-kernel specific (SMEM operand count, VMEM accumulator...):
       the toy caches fine at group 32 but the law kernel does not.
  (H3) not a cache problem at all: the first in-process compile ALSO
       takes >10 min and v20 simply never timed it — then "stall" is
       just "compile", and the fix is a longer one-time warm.

Method: for each config, run TWO sequential fresh subprocesses compiling
the same kernel (bounded by --timeout seconds each). Process 1's wall =
cold compile; process 2's wall = cache-hit probe (seconds if served,
~process-1 wall if recompiled, timeout if stalled). One TPU process at a
time throughout.

Usage (TPU):
  python experiments/exp_law_group_cache.py           # toy sweep + law32
  python experiments/exp_law_group_cache.py --skip-law
  python experiments/exp_law_group_cache.py --timeout 1200
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

TOY_CODE = r"""
import sys, time
sys.path.insert(0, {repo!r})
import jax, jax.numpy as jnp
from experiments.exp_grid_overhead import _make
t0 = time.perf_counter()
call = jax.jit(_make("prng", {group}))
iscal = jnp.array([12345, 0, 0, 0, 0, 0, 0, 0], jnp.int32)
f, p = call(iscal)
print("FIRST", round(time.perf_counter() - t0, 1), flush=True)
t0 = time.perf_counter()
f, p = call(iscal)
print("WARM", round(float(jnp.sum(p[:8])) * 0 + time.perf_counter() - t0, 3))
"""

LAW_CODE = r"""
import os, sys, time
os.environ["SMMC_LAW_GROUP"] = "{group}"
sys.path.insert(0, {repo!r})
import stock_market_monte_carlo_tpu as smmc
from stock_market_monte_carlo_tpu.config import EngineOptions
t0 = time.perf_counter()
hist = smmc.HistoricalBootstrap.from_csv()
opts = EngineOptions(chunk_paths=2**24, terminal_law=True)
r = smmc.simulate_stats(hist, 2**24, 360, seed=1, target_amount=2000.0,
                        options=opts)
print("FIRST", round(time.perf_counter() - t0, 1), flush=True)
t0 = time.perf_counter()
r = smmc.simulate_stats(hist, 100_000_000, 360, seed=7,
                        target_amount=2000.0, options=opts)
print("RUN100M", round(time.perf_counter() - t0, 4), "mean",
      round(r.mean, 2))
"""


def run_fresh(code: str, timeout_s: int):
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout_s,
        )
        out = proc.stdout.strip().replace("\n", " | ")
        return {"wall_s": round(time.perf_counter() - t0, 1),
                "rc": proc.returncode, "out": out,
                "err": proc.stderr[-300:] if proc.returncode else ""}
    except subprocess.TimeoutExpired:
        return {"wall_s": round(time.perf_counter() - t0, 1),
                "rc": "TIMEOUT", "out": f"stalled > {timeout_s}s"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=int, default=1500)
    ap.add_argument("--skip-law", action="store_true")
    ap.add_argument("--toy-groups", default="16,32")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    results = {}
    for g in [int(x) for x in args.toy_groups.split(",") if x]:
        for attempt in (1, 2):
            key = f"toy-prng{g}-proc{attempt}"
            print(f"== {key} ==", flush=True)
            results[key] = run_fresh(
                TOY_CODE.format(repo=repo, group=g), args.timeout)
            print(json.dumps(results[key]), flush=True)

    if not args.skip_law:
        for attempt in (1, 2):
            key = f"law-group32-proc{attempt}"
            print(f"== {key} ==", flush=True)
            results[key] = run_fresh(
                LAW_CODE.format(repo=repo, group=32), args.timeout)
            print(json.dumps(results[key]), flush=True)

    with open("/tmp/law_group_cache.json", "w") as f:
        json.dump(results, f, indent=1)
    print("\nverdict hints:")
    print("- proc2 wall << proc1 wall  -> cache serves this body size")
    print("- proc2 wall ~= proc1 wall  -> compiled fine both times, no "
          "cross-process cache for it (H1/H2 by whether the toy shows it)")
    print("- TIMEOUT on either        -> the v20 stall reproduced; "
          "compare toy vs law to pick H1 vs H2, and proc1 vs proc2 for H3")


if __name__ == "__main__":
    main()
