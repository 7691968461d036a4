"""MXU table lookup (ops/lookup.py): bit-exact with the native gather."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stock_market_monte_carlo_tpu.ops.lookup import (
    mxu_table_lookup,
    table_lookup,
)


@pytest.mark.parametrize("n_table", [1127, 1128, 128, 100, 5])
def test_mxu_lookup_bit_exact(n_table):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(1.0, 0.3, n_table).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n_table, size=(257, 12)), jnp.int32)
    got = mxu_table_lookup(table, idx)
    want = table[idx]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_mxu_lookup_3d_shape():
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=300).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 300, size=(4, 33, 7)), jnp.int32)
    got = mxu_table_lookup(table, idx)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(table[idx]))


def test_table_lookup_dispatch_cpu():
    # on CPU the native gather path is used; results identical either way
    table = jnp.arange(10, dtype=jnp.float32)
    idx = jnp.asarray([[1, 2], [9, 0]], jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(table_lookup(table, idx)), np.asarray(table[idx])
    )
