"""Measure byte-lane correlations of the TPU hardware PRNG.

v9's draw-reuse feeds four month blocks from the four bytes of one
prng_random_bits word; any correlation between bytes of a word becomes
(via the orthogonal mix) a per-month-lane cross-block correlation. This
measures the 4x4 byte correlation matrix and a few bit statistics.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

assert jax.default_backend() == "tpu"
P, K = 1024, 128


def kern(seed_ref, out_ref):
    pltpu.prng_seed(seed_ref[0])
    bits = pltpu.prng_random_bits((P, K))
    for b in range(4):
        if b == 0:
            c = bits & 0xFF
        elif b < 3:
            c = jax.lax.shift_right_logical(bits, 8 * b) & 0xFF
        else:
            c = jax.lax.shift_right_logical(bits, 24)
        out_ref[b * P:(b + 1) * P, :] = c.astype(jnp.float32)


planes = []
for seed in range(8):
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4 * P, K), jnp.float32),
    )(jnp.asarray([seed * 7919 + 13], jnp.int32))
    o = np.asarray(out).reshape(4, P * K)
    planes.append(o)
x = np.concatenate(planes, axis=1)  # (4, N)
print("n words:", x.shape[1])
print("byte means (expect 127.5):", x.mean(axis=1))
c = np.corrcoef(x)
np.set_printoptions(precision=4, suppress=True)
print("byte correlation matrix:")
print(c)

# also check 16-bit halves
lo16 = x[0] + 256 * x[1]
hi16 = x[2] + 256 * x[3]
print("corr(lo16, hi16):", np.corrcoef(lo16, hi16)[0, 1])
