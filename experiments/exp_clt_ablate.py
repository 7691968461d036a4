"""Ablate the v8 CLT kernel to attribute its 0.357 s (100M x 360).

Variants of the production kernel (fresh names force fresh compiles), each
timed per 2^24-path chunk on hardware with a forced scalar fetch:

  base     exact copy of the production kernel
  nohist   histogram section removed
  nologexp final reduction = lane sum instead of exp(sum(log))
  nodraw   one PRNG draw reused for all 3 blocks (same shift/convert)
  nomm     matmul removed (cnt used directly as z)

base - nohist   = in-kernel MXU histogram cost
base - nologexp = log/exp final-reduction cost
base - nodraw   = marginal cost of 2 of the 3 PRNG draws
base - nomm     = MXU mixing cost (overlap included)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stock_market_monte_carlo_tpu.engine.engine import make_histogram_spec
from stock_market_monte_carlo_tpu.models.market import GaussianReturns
from stock_market_monte_carlo_tpu.models.strategies import NoWithdrawal
from stock_market_monte_carlo_tpu.ops.pallas_engine import (
    N_PARTIAL_ROWS,
    _clt_qmatrix,
    _tile_seed_i32,
)

assert jax.default_backend() == "tpu"
P, K, T = 4096, 128, 360
NT = 4096  # 2^24 paths
nblocks = 3
HB = 4096
q_np, cs_np, sh_np = _clt_qmatrix(K)
spec = make_histogram_spec(GaussianReturns(), NoWithdrawal(), T, 1000.0,
                           4094)


def make_kernel(variant):
    def body(iscal, fscal, q_ref, cs_ref, sh_ref,
             finals_ref, partials_ref, hist_ref):
        pid = pl.program_id(0)
        tile = iscal[1] + pid
        pltpu.prng_seed(_tile_seed_i32(iscal[0], tile))
        a, b, target = fscal[1], fscal[2], fscal[4]
        v0 = fscal[0]
        log_lo, inv_w = fscal[5], fscal[6]
        q = q_ref[:]
        col1 = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)

        def block_consts(j):
            live = col1 < (T - j * K)
            return (jnp.where(live, a - sh_ref[:] * b, 1.0),
                    jnp.where(live, cs_ref[:] * b, 0.0))

        def draw_mix(j, bits):
            cnt = jax.lax.shift_right_logical(bits, 16)
            if variant == "nomm":
                zraw = cnt.astype(jnp.float32) * jnp.float32(2.0**-9)
            else:
                zraw = jax.lax.dot_general(
                    cnt.astype(jnp.bfloat16), q, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            arow_j, cs_j = block_consts(j)
            return arow_j + zraw * cs_j

        prod = jnp.ones((P, K), jnp.float32)
        if variant == "nodraw":
            bits0 = pltpu.prng_random_bits((P, K))
            for j in range(nblocks):
                prod = prod * draw_mix(j, bits0)
        else:
            for j in range(nblocks):
                prod = prod * draw_mix(j, pltpu.prng_random_bits((P, K)))

        if variant == "nologexp":
            finals = v0 * jnp.sum(prod, axis=1, keepdims=True) * (1.0 / K)
        else:
            finals = v0 * jnp.exp(
                jnp.sum(jnp.log(prod), axis=1, keepdims=True)
            )
        finals_ref[:] = finals

        rows = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
        mask = (pid * P + rows) < iscal[2]
        f = jnp.where(mask, finals, 0.0)
        f2 = f * f
        s1 = jnp.sum(f)
        s2 = jnp.sum(f2)
        s3 = jnp.sum(f2 * f)
        s4 = jnp.sum(f2 * f2)
        mn = jnp.min(jnp.where(mask, finals, jnp.inf))
        mx = jnp.max(jnp.where(mask, finals, -jnp.inf))
        cb = jnp.sum(jnp.where(mask & (finals < target), 1.0, 0.0))
        wd = jnp.float32(0.0)
        r_io = jax.lax.broadcasted_iota(jnp.int32, (N_PARTIAL_ROWS, 128), 0)
        l_io = jax.lax.broadcasted_iota(jnp.int32, (N_PARTIAL_ROWS, 128), 1)
        out = jnp.where(r_io == 4, jnp.inf,
                        jnp.where(r_io == 5, -jnp.inf, 0.0))
        lane0 = l_io == 0
        for r_idx, val in ((0, s1), (1, s2), (2, s3), (3, s4),
                           (4, mn), (5, mx), (6, cb), (7, wd)):
            out = jnp.where(lane0 & (r_io == r_idx), val, out)
        partials_ref[:] = out

        if variant == "nohist":
            hist_ref[:] = jnp.zeros((64, 64), jnp.float32)
        else:
            logv = jnp.log(jnp.maximum(finals, 1e-37))
            raw = jnp.floor((logv - log_lo) * inv_w).astype(jnp.int32) + 1
            bins = jnp.clip(raw, 1, HB - 1)
            bins = jnp.where(logv < log_lo, 0, bins)
            bins = jnp.where(mask, bins, HB)
            bins_t = jax.lax.transpose(bins, (1, 0))
            k_col = jax.lax.broadcasted_iota(jnp.int32, (64, P), 0)
            k_io = jax.lax.broadcasted_iota(jnp.int32, (P, 64), 1)
            oh_hi_t = ((bins_t >> 6) == k_col).astype(jnp.bfloat16)
            oh_lo = ((bins & 63) == k_io).astype(jnp.bfloat16)
            hist_ref[:] = jax.lax.dot_general(
                oh_hi_t, oh_lo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    body.__name__ = f"kernel_ablate_{variant}"
    return body


iscal = jnp.stack([jnp.int32(99), jnp.int32(0), jnp.int32(NT * P)]
                  + [jnp.int32(0)] * 5)
fscal = jnp.stack([jnp.float32(1000.0), jnp.float32(1.005),
                   jnp.float32(1.0 / 120.0), jnp.float32(0),
                   jnp.float32(2000.0), jnp.float32(spec.log_lo),
                   jnp.float32(1.0 / spec.width), jnp.float32(0)])
ops = (iscal, fscal, jnp.asarray(q_np), jnp.asarray(cs_np),
       jnp.asarray(sh_np))

results = {}
for variant in ("base", "nohist", "nologexp", "nodraw", "nomm"):
    call = pl.pallas_call(
        make_kernel(variant),
        grid=(NT,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((P, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((N_PARTIAL_ROWS, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((64, 64), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((NT * P, 1), jnp.float32),
                   jax.ShapeDtypeStruct((NT * N_PARTIAL_ROWS, 128),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((NT * 64, 64), jnp.float32)),
    )
    jcall = jax.jit(lambda *o, c=call: c(*o)[1])
    p = jcall(*ops)
    _ = float(jnp.sum(p))  # compile + run
    best = None
    for _rep in range(4):
        t0 = time.perf_counter()
        p = jcall(*ops)
        _ = float(jnp.sum(p))  # forced scalar fetch
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    results[variant] = best
    print(f"{variant:9s}: {best * 1e3:7.1f} ms / 2^24 chunk")

b = results["base"]
for v in ("nohist", "nologexp", "nodraw", "nomm"):
    print(f"{v:9s} delta: {(b - results[v]) * 1e3:+7.1f} ms")
