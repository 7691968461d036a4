"""Pallas histogram over HBM finals via (P,1) column tiles.

The XLA one-hot-matmul histogram costs 37.2 ms per 2^24 chunk because the
(B,64) bf16 one-hots materialize in HBM (~8 GB of traffic). This kernel
views the bin-index vector as (P,1) column tiles (the HBM->VMEM DMA is a
contiguous copy, no relayout), builds the one-hots in VMEM, and
accumulates (64,64) counts on the MXU per tile — the same recipe the CLT
kernel uses internally. Binning (log + floor + clip) stays in XLA, where
it fuses elementwise at full lane width.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

assert jax.default_backend() == "tpu"
B = 2**24
TP = 4096
NT = B // TP
HB = 4096


def hist_kernel(idx_ref, h_ref):
    bins = idx_ref[:]  # (TP, 1) i32, already clipped to [0, HB-1] + HB pad
    bins_t = jax.lax.transpose(bins, (1, 0))  # (1, TP)
    k_col = jax.lax.broadcasted_iota(jnp.int32, (64, TP), 0)
    k_io = jax.lax.broadcasted_iota(jnp.int32, (TP, 64), 1)
    oh_hi_t = ((bins_t >> 6) == k_col).astype(jnp.bfloat16)
    oh_lo = ((bins & 63) == k_io).astype(jnp.bfloat16)
    h_ref[:] = jax.lax.dot_general(
        oh_hi_t, oh_lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


call = pl.pallas_call(
    hist_kernel,
    grid=(NT,),
    in_specs=[pl.BlockSpec((TP, 1), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((64, 64), lambda i: (i, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((NT * 64, 64), jnp.float32),
)


@jax.jit
def hist_pallas(idx):
    tiles = call(idx.reshape(B, 1))
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
print(f"pallas column-tile hist: {best * 1e3:.1f} ms / 2^24 "
      f"(XLA epilogue: 37.2 ms)")

# exactness vs numpy
hn = np.bincount(np.asarray(idx), minlength=HB)
assert np.array_equal(np.asarray(h, np.int64), hn), "MISMATCH"
print("exact match vs numpy bincount; mass", float(jnp.sum(h)))
