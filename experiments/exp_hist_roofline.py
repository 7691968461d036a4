"""Roofline attribution for the sliced-rotation historical kernel.

VERDICT r2 item 2: the 'structural floor' claim for historical
single-chip throughput needs a measurement, not an assertion. This
experiment does three things, each in its OWN process (one TPU process
at a time; fresh Mosaic compiles per variant):

1. ``calib N``  — a Pallas kernel with the exact loop structure of the
   historical kernel (same tile, fori+UNROLL=8, 360 months) whose month
   body is N chained int32 VPU ops + one f32 multiply. Timing two N
   values gives the SUSTAINED int-op issue rate in this kernel shape
   (slope) and the fixed per-month overhead (intercept) — an empirical
   machine peak that needs no guesses about ALU counts.
2. ``ablate M`` — the production kernel with stage M removed
   (SMMC_HIST_ABLATE: nodraw / drawonly / nosource / nogather / '').
   Deltas attribute the measured time to PRNG draw, index maps, the
   source select chain, and the gather.
3. ``report``  — runs everything sequentially and prints the roofline:
   modeled op count / calibrated rate vs measured, i.e. utilization.

Methodology per docs/profiling.md: stats-only mode (histogram=False),
2^24-path chunks, 360 months, warm pass then min-of-3 timed passes in
the same process (variant deltas, not absolutes).
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PATHS = 1 << 25   # 2 chunks of 2^24
T = 360


def _time_stats_only():
    import stock_market_monte_carlo_tpu as smmc
    from stock_market_monte_carlo_tpu.config import EngineOptions

    h = smmc.HistoricalBootstrap.from_csv()
    opts = EngineOptions(histogram=False, chunk_paths=1 << 24)
    smmc.simulate_stats(h, 1 << 24, T, seed=1, options=opts)  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = smmc.simulate_stats(h, N_PATHS, T, seed=1, options=opts)
        _ = r.mean
        best = min(best, time.perf_counter() - t0)
    return best


def run_ablate(mode: str):
    os.environ["SMMC_HIST_ABLATE"] = mode
    best = _time_stats_only()
    per_chunk_ms = best / (N_PATHS / (1 << 24)) * 1e3
    print(f"ABLATE {mode or 'full'}: best {best:.4f}s "
          f"({per_chunk_ms:.1f} ms / 2^24 chunk)")


def make_calib_call(n_ops: int, n_periods: int = T, chunk: int = 1 << 24):
    """The calibration Pallas kernel: production loop shape (64x128 tile,
    fori+UNROLL=8, hardware-PRNG draw per month) with ``n_ops`` chained
    int32 VPU ops per month. Timing two n_ops values gives the machine's
    sustained serial-chain el-op rate (slope) in this exact kernel shape.
    Shared by the ablation report below and bench.py's per-round roofline
    fields (the two fixed kernels are Mosaic-cached after their first
    compile, so the per-round cost is one batched timing)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    UNROLL = 8
    n_iters = n_periods // UNROLL
    ntiles = chunk // 8192

    def kernel(iscal, o_ref):
        pid = pl.program_id(0)
        pltpu.prng_seed(iscal[0] + pid)
        x = pltpu.prng_random_bits((64, 128))
        total = jnp.full((64, 128), 1.0, jnp.float32)

        def body(i, carry):
            x, total = carry
            for _ in range(UNROLL):
                y = x
                # n_ops chained int32 VPU ops (the historical kernel's
                # mix: shifts, masks, mults, adds, compares/selects)
                for k in range(n_ops // 4):
                    y = y ^ (y << jnp.int32(5))
                    y = jax.lax.shift_right_logical(y, jnp.int32(7)) ^ y
                    y = y * jnp.int32(-1640531535)  # 2654435761 as i32
                    y = y + jnp.int32(k + 1)
                g = 1.0 + y.astype(jnp.float32) * 1e-12
                total = total * g
                x = y
            return x, total

        _, total = jax.lax.fori_loop(0, n_iters, body, (x, total))
        o_ref[:] = total

    return pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((64, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ntiles * 64, 128), jnp.float32),
    )


def run_calib(n_ops: int):
    import jax.numpy as jnp

    call = make_calib_call(n_ops)
    iscal = jnp.asarray([123], jnp.int32)
    float(jnp.sum(call(iscal)))  # warm/compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s = float(jnp.sum(call(iscal)))
        best = min(best, time.perf_counter() - t0)
    el_ops = (1 << 24) * T * (n_ops + 2)  # +astype+fma approx
    print(f"CALIB n_ops={n_ops}: best {best * 1e3:.1f} ms "
          f"-> {el_ops / best / 1e12:.2f} T el-ops/s  (checksum {s:.3g})")


def report():
    env = {k: v for k, v in os.environ.items() if k != "SMMC_HIST_ABLATE"}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    for args in (["calib", "16"], ["calib", "48"],
                 ["ablate", "nodraw"], ["ablate", "drawonly"],
                 ["ablate", "nosource"], ["ablate", "nogather"],
                 ["ablate", ""]):
        # Two processes per variant: the first compiles (a process that
        # has just done remote Mosaic compiles times 30-40% HIGH —
        # docs/profiling.md), the second hits the warm cache and is the
        # number to read. The calib slope is consumed as an ABSOLUTE
        # machine rate, so it must come from the clean process.
        print(f"--- {' '.join(args) or 'full'}: warm-up process "
              "(compile; IGNORE its timing) ---")
        subprocess.run([sys.executable, os.path.abspath(__file__), *args],
                       env=env, check=False, cwd=REPO)
        print(f"--- {' '.join(args) or 'full'}: timed process ---")
        subprocess.run([sys.executable, os.path.abspath(__file__), *args],
                       env=env, check=False, cwd=REPO)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "report"
    if cmd == "calib":
        run_calib(int(sys.argv[2]))
    elif cmd == "ablate":
        run_ablate(sys.argv[2] if len(sys.argv) > 2 else "")
    else:
        report()
