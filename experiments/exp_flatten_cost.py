"""Can Mosaic flatten a (64,128) tile to (8192,1) cheaply in-kernel?

Needed to give the exact/historical kernel a CLT-style in-kernel MXU
histogram (bins must be one column for the one-hot matmuls). Tries
reshape and transpose+reshape, then times a full in-kernel histogram
built on it at the 2^24 scale.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

assert jax.default_backend() == "tpu"
R, L = 64, 128
P = R * L
NT = 2048  # 2^24 paths


def k_reshape(x_ref, o_ref):
    o_ref[:] = x_ref[:].reshape(P, 1)


def try_variant(name, kern):
    try:
        out = pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=[pl.BlockSpec((R, L), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((P, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((P, 1), jnp.float32),
        )(jnp.arange(P, dtype=jnp.float32).reshape(R, L))
        ok = np.array_equal(np.asarray(out).ravel(), np.arange(P))
        print(f"{name}: compiles, row-major order preserved: {ok}")
        return True
    except Exception as e:
        print(f"{name}: FAILED: {type(e).__name__}: {str(e)[:200]}")
        return False


try_variant("reshape(P,1)", k_reshape)


# full in-kernel hist at scale: bins (64,128) -> flatten -> one-hot matmul
def k_hist(x_ref, h_ref):
    bins = jnp.clip(x_ref[:].astype(jnp.int32), 0, 4095)
    flat = bins.reshape(P, 1)
    flat_t = jax.lax.transpose(flat, (1, 0))
    k_col = jax.lax.broadcasted_iota(jnp.int32, (64, P), 0)
    k_io = jax.lax.broadcasted_iota(jnp.int32, (P, 64), 1)
    oh_hi_t = ((flat_t >> 6) == k_col).astype(jnp.bfloat16)
    oh_lo = ((flat & 63).reshape(P, 1) == k_io).astype(jnp.bfloat16)
    h_ref[:] = jax.lax.dot_general(
        oh_hi_t, oh_lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


try:
    call = pl.pallas_call(
        k_hist,
        grid=(NT,),
        in_specs=[pl.BlockSpec((R, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((64, 64), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NT * 64, 64), jnp.float32),
    )
    x = jax.random.uniform(jax.random.key(0), (NT * R, L),
                           jnp.float32) * 4096.0
    x = jax.block_until_ready(x)
    f = jax.jit(lambda v: jnp.sum(call(v).reshape(NT, 64, 64), axis=0))
    h = f(x)
    _ = float(jnp.sum(h))
    best = None
    for _rep in range(4):
        t0 = time.perf_counter()
        h = f(x)
        _ = float(jnp.sum(h))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"pallas in-kernel hist on (64,128) tiles: {best * 1e3:.1f} ms "
          f"/ 2^24 (XLA epilogue: 37.2 ms)")
    print("mass:", float(jnp.sum(h)), "expect", NT * P)
except Exception as e:
    print(f"hist kernel FAILED: {type(e).__name__}: {str(e)[:300]}")
