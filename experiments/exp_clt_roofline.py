"""Calibrated roofline for the CLT kernel's elementwise block chain.

The v7 ablation attributed the CLT kernel's device time (40.5 ms per
2^24-path chunk in the round-3 session) as: MXU matmul fully hidden,
histogram ~9.2 ms, log/exp epilogue ~2.1 ms, PRNG draws ~3.3 ms, and the
REST (~26 ms) "the elementwise VMEM passes of the block chain (shift,
convert, affine, product)". That attribution subtracted ablations; it
never MODELED the chain against calibrated per-op-class rates, so
"bound by the chain" was a diagnosis, not a floor (VERDICT r3 weak #1).

This experiment calibrates the sustained per-element rate of each op
class the chain uses, on the chain's exact (4096,128) tile shape and
grid (4096 steps per 2^24-path chunk equivalent), via carried-dependency
toy kernels (no DCE, runtime scalars from SMEM prevent constant
folding):

  mul    x = x * c                 1 f32 op/elem
  fma    x = a + x * c             2 f32 ops/elem
  iadd   xi = xi + ci              1 i32 op/elem   (control for shf/cvt)
  shf    xi = (xi >> 1) + ci       2 i32 ops/elem  (shift = shf - iadd)
  cvt    bacc += bf16(xi); xi+=ci  cvt + bf16add + iadd (cvt = this - 2)
  mm     y = bf16(x) @ Q; x=a+y*c  the real block's matmul+affine pair

Model of one CLT block per element: shift(1) + cvt(1) + fma(affine,
folded with the matmul pass in `mm`) + mul(prod). 3 blocks per path
(T=360, K=128). The chain floor is the sum of class times at calibrated
rates; fraction = floor / measured-chain. If >= 0.8 the chain is at its
measured-class floor and further CLT throughput comes from chips; if
well below, the gap names the overweight pass.

Usage (TPU): python experiments/exp_clt_roofline.py
Each toy is a fresh kernel -> remote Mosaic compile on first run.
Timing: batched K dispatches + one forcing fetch (exp_dispatch_overhead
method) so the 15-25 ms tunnel tax is amortized out.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stock_market_monte_carlo_tpu.ops.pallas_engine import _clt_qmatrix

P = 4096          # CLT_P
GRID = 4096       # CLT tiles per 2^24-path chunk
REPS_IN_KERNEL = 12
KDISP = 4         # batched dispatches per timing
TREPS = 3


def _make_toy(op: str):
    use_q = op == "mm"
    q = _clt_qmatrix(128)[0] if use_q else None

    def kernel(*refs):
        it = iter(refs)
        fscal = next(it)
        q_ref = next(it) if use_q else None
        out_ref = next(it)

        c = fscal[0]          # runtime ~1.0000001: no const folding
        a = fscal[1]
        ci = jnp.int32(1)
        x = jnp.full((P, 128), 1.0, jnp.float32) * c
        xi = jnp.full((P, 128), 3, jnp.int32)
        bacc = jnp.zeros((P, 128), jnp.bfloat16)
        for _ in range(REPS_IN_KERNEL):
            if op == "mul":
                x = x * c
            elif op == "fma":
                x = a + x * c
            elif op == "iadd":
                xi = xi + ci
            elif op == "shf":
                xi = jax.lax.shift_right_logical(xi, 1) + ci
            elif op == "cvt":
                bacc = bacc + xi.astype(jnp.bfloat16)
                xi = xi + ci
            elif op == "mm":
                y = jax.lax.dot_general(
                    x.astype(jnp.bfloat16), q_ref[:],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                x = a + y * c
            else:
                raise AssertionError(op)
        if op in ("iadd", "shf"):
            out_ref[:] = xi.astype(jnp.float32)[:8, :]
        elif op == "cvt":
            out_ref[:] = (bacc.astype(jnp.float32)[:8, :]
                          + xi.astype(jnp.float32)[:8, :])
        else:
            out_ref[:] = x[:8, :]

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    if use_q:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel,
        grid=(GRID,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((GRID * 8, 128), jnp.float32),
    )


def main():
    print(f"backend: {jax.default_backend()}  P={P} grid={GRID} "
          f"reps={REPS_IN_KERNEL}")
    fscal = jnp.array([1.0000001, 0.0000002, 0, 0, 0, 0, 0, 0],
                      jnp.float32)
    q = _clt_qmatrix(128)[0]
    times = {}
    for op in ("mul", "fma", "iadd", "shf", "cvt", "mm"):
        call = jax.jit(_make_toy(op))
        args = (fscal, q) if op == "mm" else (fscal,)
        t0 = time.perf_counter()
        out = call(*args)
        _ = float(jnp.sum(out[:4]))
        print(f"  {op}: compile+first {time.perf_counter() - t0:.1f} s",
              flush=True)
        best = float("inf")
        for _ in range(TREPS):
            t0 = time.perf_counter()
            _ = float(sum(jnp.sum(call(*args)[:4]) for _ in range(KDISP)))
            best = min(best, time.perf_counter() - t0)
        ms = best * 1000 / KDISP
        times[op] = ms
        per_pass = ms / REPS_IN_KERNEL
        elems = P * 128 * GRID * REPS_IN_KERNEL
        print(f"  {op}: {ms:7.2f} ms/chunk-equiv "
              f"({per_pass:6.3f} ms/pass, "
              f"{elems / best * KDISP / 1e12:.2f} T elem/s)")

    # derived single-op costs (ms per one pass over the chunk's elems)
    mul1 = times["mul"] / REPS_IN_KERNEL
    fma1 = times["fma"] / REPS_IN_KERNEL
    iadd1 = times["iadd"] / REPS_IN_KERNEL
    shift1 = max(times["shf"] / REPS_IN_KERNEL - iadd1, 0.0)
    cvt1 = max(times["cvt"] / REPS_IN_KERNEL - iadd1 - mul1, 0.0)
    mm1 = times["mm"] / REPS_IN_KERNEL  # matmul + affine pair

    # one CLT block = shift + cvt + (matmul+affine) + prod-mul; 3 blocks
    per_block = shift1 + cvt1 + mm1 + mul1
    chain_floor = 3 * per_block
    print("\nderived per-pass (ms over 2^24x{128-lane} elems):")
    print(f"  mul {mul1:.3f}  fma {fma1:.3f}  shift {shift1:.3f}  "
          f"cvt {cvt1:.3f}  mm+affine {mm1:.3f}")
    print(f"modeled chain floor (3 blocks): {chain_floor:.1f} ms/chunk")
    print("compare: measured chain = CLT total - hist - log/exp - draws "
          "(v7 attribution; re-measure the total in the same session "
          "with experiments/exp_dispatch_overhead.py)")


if __name__ == "__main__":
    main()
