"""TPU-friendly exact table lookup for the XLA (non-Pallas) paths.

XLA's TPU lowering of ``table[idx]`` for a small table and a large index
array is catastrophically slow (measured 0.1-0.5 G lookups/s,
experiments/exp_hist_xla.py — ~33 s for 1e7 paths x 360 months). This
module reformulates the gather as a one-hot matmul: the table is padded
to (C, 128) chunks and each month's column of indices becomes a
(B, 128) one-hot contracted against the (128, C) transposed table, then
a C-way chunk select. float32 one-hots are exact in the TPU's 3-pass
f32 matmul (one-hot entries are bf16-representable), so the lookup is
bit-exact with the direct gather.

The Pallas kernels never use this (they have the sliced-rotation and
chunk-scan forms in-register); it serves the XLA engine backend and the
trajectory-bands path on TPU. On CPU the native gather is faster and is
used as-is.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _padded_table_t(table: jax.Array):
    n = table.shape[0]
    c = -(-n // 128)
    flat = jnp.zeros((c * 128,), table.dtype).at[:n].set(table)
    return flat.reshape(c, 128).T, c  # (128, C)


def mxu_table_lookup(table: jax.Array, idx: jax.Array) -> jax.Array:
    """``table[idx]`` for idx of shape (..., T): exact, MXU-based.

    Scans over the last axis so the transient one-hot is (B, 128); the
    leading axes are flattened to B. Requires table size < 2^15.
    """
    shape = idx.shape
    b = 1
    for d in shape[:-1]:
        b *= d
    t = shape[-1]
    idx2 = idx.reshape(b, t)
    table_t, c = _padded_table_t(table.astype(jnp.float32))
    lanes = jnp.arange(128, dtype=idx2.dtype)[None, :]

    def month(_, col):
        within = col & 127
        chunk = (col >> 7).astype(jnp.int32)
        oh = (within[:, None] == lanes).astype(jnp.float32)   # (B, 128)
        # HIGHEST precision: TPU's default f32 matmul truncates inputs to
        # bf16 (lossy); the multi-pass form reproduces the f32 table
        # values exactly under a one-hot contraction
        v_c = jax.lax.dot_general(
            oh, table_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                     # (B, C)
        val = v_c[:, 0]
        for cc in range(1, c):
            val = jnp.where(chunk == cc, v_c[:, cc], val)
        return None, val

    _, out = jax.lax.scan(month, None, idx2.T)
    return out.T.reshape(shape).astype(table.dtype)


def table_lookup(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Backend-aware ``table[idx]``: the MXU form on TPU, the native
    gather elsewhere. Bit-identical results either way."""
    if jax.default_backend() == "tpu" and idx.ndim >= 2 \
            and table.shape[0] <= (1 << 15):
        return mxu_table_lookup(table, idx)
    return table[idx]
