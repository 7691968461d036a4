"""Measure Pallas per-grid-step fixed overhead on the TPU.

Motivation (2026-08-18): the terminal-law kernel does ~60x less math
than the CLT month loop yet lands within ~10% of its wall-clock
(optimization_log v13) — evidence that BOTH kernels are dominated by a
shared per-grid-step fixed cost, not arithmetic. Every stats kernel
runs grid=(ntiles,) with one 8192-path logical tile per step → a 2^24
chunk is 2048 steps; ~28 us/step would fully explain the unattributed
~45 ms/chunk in the v7 ablation.

This times four standalone kernels per 2^24-path chunk shape:
  const1  — grid=2048, write constant finals + partial rows (no math)
  const16 — grid=128, SAME outputs, 16 logical tiles per step
  prng1   — grid=2048, per-tile hw-PRNG draw + u23 + rowsum partials
  prng16  — grid=128, 16x per-step inner unroll, per-logical-tile
            seeding (the stream-preserving fat-step shape)
If const1 >> const16 the fixed per-step cost dominates and fat-stepping
the production kernels is the next structural win.

Usage: python experiments/exp_grid_overhead.py
(new kernels -> fresh remote Mosaic compiles; minutes on first run)
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stock_market_monte_carlo_tpu.ops.pallas_engine import (
    TILE_ROWS, TILE_PATHS, _tile_seed_i32, _u23_from_bits,
)

CHUNK = 1 << 24
NTILES = CHUNK // TILE_PATHS          # 2048
REPS = 5


def _make(variant: str, group: int):
    rows = TILE_ROWS * group

    def kernel(iscal, finals_ref, partials_ref):
        pid = pl.program_id(0)
        for g in range(group):
            sl = slice(g * TILE_ROWS, (g + 1) * TILE_ROWS)
            psl = slice(g * 8, (g + 1) * 8)
            if variant == "const":
                finals_ref[sl, :] = jnp.full(
                    (TILE_ROWS, 128), 1.0, jnp.float32)
                partials_ref[psl, :] = jnp.full((8, 128), 2.0, jnp.float32)
            else:
                tile = iscal[1] + pid * group + g
                pltpu.prng_seed(_tile_seed_i32(iscal[0], tile))
                u = _u23_from_bits(
                    pltpu.prng_random_bits((TILE_ROWS, 128)))
                finals_ref[sl, :] = u
                s = jnp.sum(u, axis=0, keepdims=True)
                partials_ref[psl, :] = jnp.concatenate(
                    [s, s, s, s, s, s, s, s], axis=0)

    grid = NTILES // group
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec((rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * group, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NTILES * TILE_ROWS, 128), jnp.float32),
            jax.ShapeDtypeStruct((NTILES * 8, 128), jnp.float32),
        ),
    )


def main():
    print(f"backend: {jax.default_backend()}  chunk=2^24  ntiles={NTILES}")
    iscal = jnp.array([12345, 0, 0, 0, 0, 0, 0, 0], jnp.int32)
    results = {}
    for variant in ("const", "prng"):
        for group in (1, 16):
            name = f"{variant}{group}"
            call = jax.jit(_make(variant, group))
            t0 = time.perf_counter()
            f, p = call(iscal)
            _ = float(jnp.sum(p[:8]))
            print(f"  {name}: compile+first {time.perf_counter()-t0:.1f}s")
            best = float("inf")
            for _ in range(REPS):
                t0 = time.perf_counter()
                f, p = call(iscal)
                _ = float(jnp.sum(p[:8]))   # forced scalar fetch
                best = min(best, time.perf_counter() - t0)
            results[name] = best
            steps = NTILES // group
            print(f"  {name}: best {best*1000:.2f} ms/chunk "
                  f"({best/steps*1e6:.2f} us/step, {steps} steps)")
    if results.get("const1") and results.get("const16"):
        d = results["const1"] - results["const16"]
        print(f"fixed per-step overhead estimate: "
              f"{d / (NTILES - NTILES // 16) * 1e6:.2f} us/step "
              f"(const1-const16 delta {d*1000:.2f} ms)")
    # parity: prng16 must reproduce prng1's bits exactly (stream keying
    # is per logical tile, independent of grouping)
    f1, _ = jax.jit(_make("prng", 1))(iscal)
    f16, _ = jax.jit(_make("prng", 16))(iscal)
    same = bool(jnp.all(f1 == f16))
    print(f"prng bits identical across grouping: {same}")


if __name__ == "__main__":
    main()
