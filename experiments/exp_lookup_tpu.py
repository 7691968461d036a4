"""MXU lookup on TPU: exactness vs gather + historical-bands speed."""
import time
import jax
import jax.numpy as jnp
import numpy as np
import stock_market_monte_carlo_tpu as smmc
from stock_market_monte_carlo_tpu.ops.lookup import mxu_table_lookup

assert jax.default_backend() == "tpu"
rng = np.random.default_rng(0)
table = jnp.asarray(rng.normal(1.0, 0.3, 1127).astype(np.float32))
idx = jnp.asarray(rng.integers(0, 1127, size=(8192, 64)), jnp.int32)
got = np.asarray(jax.jit(mxu_table_lookup)(table, idx))
want = np.asarray(table)[np.asarray(idx)]
assert (got == want).all(), "MXU lookup not bit-exact on TPU"
print("bit-exact on TPU OK")

h = smmc.HistoricalBootstrap.from_csv()
smmc.simulate_bands(h, 10**6, 360, seed=6)  # warm
t0 = time.perf_counter()
b = smmc.simulate_bands(h, 10**7, 360, seed=6)
dt = time.perf_counter() - t0
print(f"historical bands 1e7x360: {dt:.2f} s (was 36.5 s) "
      f"median={b.band(0.5)[-1]:.1f}")
