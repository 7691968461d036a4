"""Measure XLA's fused historical-bootstrap rate on the real chip.

Question: can XLA's own gather lowering beat the Pallas kernel's 9
chunked vreg gathers per path-month (1.497 s @ 100M x 360)?
Methodology per docs/profiling.md: warmup compile, forced scalar fetch.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

assert jax.default_backend() == "tpu", jax.default_backend()

T = 360
N_TABLE = 1127
rng = np.random.default_rng(0)
table = jnp.asarray(rng.normal(1.005, 0.01, N_TABLE).astype(np.float32))


@jax.jit
def hist_chunk(key, table):
    # one chunk: sample idx, gather growth, product along months, reduce
    idx = jax.random.randint(key, (B, T), 0, N_TABLE)
    g = table[idx]
    finals = 1000.0 * jnp.prod(g, axis=1)
    return jnp.sum(finals), jnp.sum(finals * finals)


@jax.jit
def hist_chunk_scan(key, table):
    # scan over months: no (B,T) materialization, running product
    def body(carry, t):
        k = jax.random.fold_in(key, t)
        idx = jax.random.randint(k, (B,), 0, N_TABLE)
        return carry * table[idx], None

    tot, _ = jax.lax.scan(body, jnp.full((B,), 1000.0), jnp.arange(T))
    return jnp.sum(tot), jnp.sum(tot * tot)


for name, fn in [("fused-prod", hist_chunk), ("scan", hist_chunk_scan)]:
    for logb in (20, 22):
        B = 1 << logb
        key = jax.random.key(1)
        s, _ = fn(key, table)  # compile + warm
        float(s)
        t0 = time.perf_counter()
        reps = 3
        for r in range(reps):
            s, s2 = fn(jax.random.key(r), table)
        val = float(s) + float(s2)
        dt = (time.perf_counter() - t0) / reps
        rate = B * T / dt / 1e9
        print(f"{name} B=2^{logb}: {dt*1000:.1f} ms/chunk -> "
              f"{rate:.1f} G lookups/s (100Mx360 ~ {36.0/rate:.2f} s)")
