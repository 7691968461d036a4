"""XLA histogram variants: dtype and slice-size sweep at 2^24."""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

assert jax.default_backend() == "tpu"
B = 2**24
HB = 4096


def make_hist(slice_elems, oh_dtype, acc_dtype):
    @jax.jit
    def hist(flat):
        flat = jnp.where((flat < 0) | (flat >= HB), HB, flat)
        slices = flat.reshape(-1, slice_elems)

        def step(acc, sl):
            oh_hi = jax.nn.one_hot(sl >> 6, 64, dtype=oh_dtype)
            oh_lo = jax.nn.one_hot(sl & 63, 64, dtype=oh_dtype)
            acc = acc + jax.lax.dot_general(
                oh_hi, oh_lo, (((0,), (0,)), ((), ())),
                preferred_element_type=acc_dtype,
            ).astype(jnp.float32)
            return acc, None

        counts2d, _ = jax.lax.scan(
            step, jnp.zeros((64, 64), jnp.float32), slices
        )
        return counts2d.reshape(-1)

    return hist


idx = jax.random.randint(jax.random.key(0), (B,), 0, HB, jnp.int32)
idx = jax.block_until_ready(idx)
ref = np.bincount(np.asarray(idx), minlength=HB)

def make_hist_oriented(slice_elems, oh_dtype, acc_dtype):
    @jax.jit
    def hist(flat):
        flat = jnp.where((flat < 0) | (flat >= HB), HB, flat)
        slices = flat.reshape(-1, slice_elems)

        def step(acc, sl):
            S = sl.shape[0]
            row = sl.reshape(1, S)
            col = sl.reshape(S, 1)
            k_col = jax.lax.broadcasted_iota(jnp.int32, (64, S), 0)
            k_io = jax.lax.broadcasted_iota(jnp.int32, (S, 64), 1)
            oh_hi_t = ((row >> 6) == k_col).astype(oh_dtype)
            oh_lo = ((col & 63) == k_io).astype(oh_dtype)
            acc = acc + jax.lax.dot_general(
                oh_hi_t, oh_lo, (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype,
            ).astype(jnp.float32)
            return acc, None

        counts2d, _ = jax.lax.scan(
            step, jnp.zeros((64, 64), jnp.float32), slices
        )
        return counts2d.reshape(-1)

    return hist


def make_hist_rowonly(slice_elems, oh_dtype, acc_dtype):
    # both one-hots from row-shaped data: oh_lo via transpose INSIDE the
    # dot (contract dim1 x dim1) so neither operand needs an (S,1) column
    @jax.jit
    def hist(flat):
        flat = jnp.where((flat < 0) | (flat >= HB), HB, flat)
        slices = flat.reshape(-1, slice_elems)

        def step(acc, sl):
            S = sl.shape[0]
            row = sl.reshape(1, S)
            k_col = jax.lax.broadcasted_iota(jnp.int32, (64, S), 0)
            oh_hi_t = ((row >> 6) == k_col).astype(oh_dtype)
            oh_lo_t = ((row & 63) == k_col).astype(oh_dtype)
            acc = acc + jax.lax.dot_general(
                oh_hi_t, oh_lo_t, (((1,), (1,)), ((), ())),
                preferred_element_type=acc_dtype,
            ).astype(jnp.float32)
            return acc, None

        counts2d, _ = jax.lax.scan(
            step, jnp.zeros((64, 64), jnp.float32), slices
        )
        return counts2d.reshape(-1)

    return hist


for name, mk, se, dt, at in (
    ("bf16 s=2^16 (current)", make_hist, 1 << 16, jnp.bfloat16, jnp.float32),
    ("oriented bf16 s=2^16", make_hist_oriented, 1 << 16, jnp.bfloat16, jnp.float32),
    ("oriented bf16 s=2^18", make_hist_oriented, 1 << 18, jnp.bfloat16, jnp.float32),
    ("rowonly bf16 s=2^16", make_hist_rowonly, 1 << 16, jnp.bfloat16, jnp.float32),
    ("rowonly bf16 s=2^18", make_hist_rowonly, 1 << 18, jnp.bfloat16, jnp.float32),
):
    h = mk(se, dt, at)
    out = h(idx)
    _ = float(jnp.sum(out))
    best = None
    for _rep in range(4):
        t0 = time.perf_counter()
        out = h(idx)
        _ = float(jnp.sum(out))
        dtm = time.perf_counter() - t0
        best = dtm if best is None else min(best, dtm)
    ok = np.array_equal(np.asarray(out, np.int64), ref)
    print(f"{name:22s}: {best * 1e3:6.1f} ms  exact={ok}")
