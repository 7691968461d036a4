"""Histogram via MXU one-hot factorized matmul.

Scatter-add histograms are slow on TPU (XLA serializes duplicate-index
scatters). Instead we factorize the bin index b = hi*64 + lo and use

    counts[hi, lo] = sum_p onehot(hi_p)^T onehot(lo_p)

— a (P,64)^T x (P,64) matmul on the MXU. This replaces both the
reference's reduceBlock shared-memory tree (src/simulations.cu:157-183)
and its CPU-side histogram loops (examples/visualize_returns_gpu.cpp:
387-404) with something the TPU is actually built for.

Role today: the fused Pallas kernels accumulate the default 4096-bin
(64x64-factorized) histogram IN-KERNEL; this module is the epilogue used
when EngineOptions(histogram_bins=...) picks a bin count outside the
64x64 factorization, and by the XLA backend.

Out-of-range indices (used as a "discard" marker for padding paths) fall
outside [0, 64) after the hi split and produce all-zero one-hot rows, so
they vanish from the counts with no masking pass.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_LO = 64
_SLICE = 1 << 16  # elements per matmul slice


@partial(jax.jit, static_argnames=("n_total",))
def matmul_histogram(bin_idx: jax.Array, n_total: int) -> jax.Array:
    """Count occurrences of each bin in [0, n_total); indices >= n_total or
    < 0 are discarded. ``bin_idx`` is flattened. Returns (n_total,) float32.
    """
    flat = bin_idx.ravel().astype(jnp.int32)
    n_hi = -(-n_total // _LO)
    padded_total = n_hi * _LO

    # pad the element count to a slice multiple with discard markers
    n = flat.shape[0]
    n_pad = -(-n // _SLICE) * _SLICE
    if n_pad != n:
        flat = jnp.concatenate(
            [flat, jnp.full((n_pad - n,), padded_total, jnp.int32)]
        )
    # mark out-of-range as discard (maps to hi >= n_hi -> zero one-hot row)
    flat = jnp.where(
        (flat < 0) | (flat >= n_total), padded_total, flat
    )
    slices = flat.reshape(-1, _SLICE)

    def step(acc, sl):
        oh_hi = jax.nn.one_hot(sl >> 6, n_hi, dtype=jnp.bfloat16)
        oh_lo = jax.nn.one_hot(sl & 63, _LO, dtype=jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            oh_hi, oh_lo, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, None

    counts2d, _ = jax.lax.scan(
        step, jnp.zeros((n_hi, _LO), jnp.float32), slices
    )
    return counts2d.reshape(-1)[:n_total]


def histogram_counts(bin_idx: jax.Array, n_total: int) -> jax.Array:
    """Backend-appropriate histogram: MXU matmul on TPU, segment_sum on CPU
    (where scatter-add is cheap and matmuls are not)."""
    if jax.default_backend() == "tpu":
        return matmul_histogram(bin_idx, n_total)
    flat = bin_idx.ravel().astype(jnp.int32)
    flat = jnp.where((flat < 0) | (flat >= n_total), n_total, flat)
    return jax.ops.segment_sum(
        jnp.ones_like(flat, jnp.float32), flat, num_segments=n_total + 1
    )[:n_total]
