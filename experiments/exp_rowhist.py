"""Row-unrolled in-layout histogram for (64,128) tiles.

counts[h,k] = sum_r (A_r @ B_r^T)[h,k] with A_r[h,l] = [hi(r,l)==h],
B_r[k,l] = [lo(r,l)==k] — both built by broadcasting row r against a
row-index iota; the dim1-x-dim1 contraction is a native NT gemm, so no
relayout anywhere. 64 small gemms per tile ride the MXU.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

assert jax.default_backend() == "tpu"
R, L = 64, 128
B = 2**24
NT = B // (R * L)  # 2048
HB = 4096


def hist_kernel(idx_ref, h_ref):
    bins = idx_ref[:]  # (64,128) i32 in [0, HB] (HB = discard)
    hi = bins >> 6
    lo = bins & 63
    rio = jax.lax.broadcasted_iota(jnp.int32, (64, L), 0)
    acc = jnp.zeros((64, 64), jnp.float32)
    for r in range(R):
        a = (hi[r:r + 1, :] == rio).astype(jnp.bfloat16)
        b = (lo[r:r + 1, :] == rio).astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    h_ref[:] = acc


call = pl.pallas_call(
    hist_kernel,
    grid=(NT,),
    in_specs=[pl.BlockSpec((R, L), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((64, 64), lambda i: (i, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((NT * 64, 64), jnp.float32),
)


@jax.jit
def hist_pallas(idx):
    tiles = call(idx.reshape(NT * R, L))
    return jnp.sum(tiles.reshape(NT, 64, 64), axis=0).reshape(-1)


idx = jax.random.randint(jax.random.key(0), (B,), 0, HB, jnp.int32)
idx = jax.block_until_ready(idx)

h = hist_pallas(idx)
_ = float(jnp.sum(h))
best = None
for _rep in range(5):
    t0 = time.perf_counter()
    h = hist_pallas(idx)
    _ = float(jnp.sum(h))
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
print(f"row-unrolled pallas hist: {best * 1e3:.1f} ms / 2^24 "
      f"(XLA: 28.8 ms, column-tile pallas: 52.6 ms)")
ref = np.bincount(np.asarray(idx), minlength=HB)
assert np.array_equal(np.asarray(h, np.int64), ref), "MISMATCH"
print("exact vs numpy bincount")
