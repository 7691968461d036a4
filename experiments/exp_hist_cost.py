"""Cost of the XLA histogram epilogue used by the non-CLT kernel paths.

The exact-ICDF and historical kernels write finals to HBM and bin them
with ops/histogram.histogram_counts in XLA (pallas_engine.py epilogue).
This times that epilogue alone on a 2^24 chunk, to decide whether moving
the histogram in-kernel (as the CLT kernel does) or offering a stats-only
mode is worth it for the headline historical mode.
"""

import time

import jax
import jax.numpy as jnp

from stock_market_monte_carlo_tpu.engine.engine import make_histogram_spec
from stock_market_monte_carlo_tpu.models.market import GaussianReturns
from stock_market_monte_carlo_tpu.models.strategies import NoWithdrawal
from stock_market_monte_carlo_tpu.ops import histogram as hist_ops

assert jax.default_backend() == "tpu"
B = 2**24
spec = make_histogram_spec(GaussianReturns(), NoWithdrawal(), 360, 1000.0,
                           4094)


@jax.jit
def epilogue(finals, valid):
    lane = jnp.arange(B, dtype=jnp.int32)
    mask = lane < valid
    idx = spec.bin_index(finals)
    idx = jnp.where(mask, idx, spec.n_bins + 2)
    return hist_ops.histogram_counts(idx, spec.n_bins + 2)


key = jax.random.key(0)
finals = 1000.0 * jnp.exp(
    jax.random.normal(key, (B,), jnp.float32) * 0.18 + 1.79
)
finals = jax.block_until_ready(finals)
valid = jnp.int32(B)

h = epilogue(finals, valid)
_ = float(jnp.sum(h))
best = None
for _rep in range(5):
    t0 = time.perf_counter()
    h = epilogue(finals, valid)
    _ = float(jnp.sum(h))
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
print(f"XLA histogram epilogue: {best * 1e3:.1f} ms / 2^24 chunk "
      f"(historical chunk total: ~92 ms)")
