"""Find the covariance structure that causes the v9 std deficit.

Dumps (P,K) PRNG words from the hardware generator, extracts the three
byte planes v9 uses for T=360, mixes them through Q on HOST (float64 — no
kernel math involved), and measures Var of the 360-month z sum per path.
If the deficit reproduces, the hardware PRNG has cross-word intra-draw
structure; the z-covariance matrix then localizes it.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stock_market_monte_carlo_tpu.ops.pallas_engine import _clt_qmatrix

assert jax.default_backend() == "tpu"
P, K = 1024, 128
q_np, cs_np, sh_np = _clt_qmatrix(K)
qf = np.asarray(q_np).astype(np.float64)
cs = cs_np.astype(np.float64)
sh = sh_np.astype(np.float64)


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


zs = []  # per seed: (3, P, K) z planes
for seed in range(16):
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4 * P, K), jnp.float32),
    )(jnp.asarray([seed * 104729 + 7], jnp.int32))
    o = np.asarray(out, dtype=np.float64).reshape(4, P, K)
    z = np.stack([o[b] @ qf * cs - sh for b in range(3)])  # (3,P,K)
    zs.append(z)
z = np.concatenate(zs, axis=1)  # (3, 16*P, K)
n = z.shape[1]
print("z plane stds:", z.std(axis=(1, 2)))

live2 = 360 - 2 * K  # block 2 live lanes
S = z[0].sum(1) + z[1].sum(1) + z[2][:, :live2].sum(1)
print(f"Var(S) = {S.var():.1f}  expect 360 "
      f"(ratio {S.var() / 360:.4f}; v9 measured finals var ratio ~0.69)")

# localize: per-lane cross-block covariance diag and off-diag mass
for (a, b) in ((0, 1), (0, 2), (1, 2)):
    C = (z[a] - z[a].mean(0)).T @ (z[b] - z[b].mean(0)) / n  # (K,K)
    print(f"blocks {a}{b}: diag mean {np.diag(C).mean():+.4f}  "
          f"offdiag mean {((C.sum() - np.trace(C)) / (K * K - K)):+.6f}  "
          f"total sum {C.sum():+.2f}")
# within-block month covariance (should be ~0 by orthogonality)
for a in range(3):
    C = (z[a] - z[a].mean(0)).T @ (z[a] - z[a].mean(0)) / n
    print(f"block {a} within: offdiag mean "
          f"{((C.sum() - np.trace(C)) / (K * K - K)):+.6f} "
          f"total offdiag {C.sum() - np.trace(C):+.2f}")
