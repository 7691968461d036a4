"""RNG ports and statistical quality.

The parity references here are independent pure-Python reimplementations of
the published algorithms (xorshift13/17/5, PCG hash, Tausworthe), checked
against the jnp ports — mirroring how the reference validates RNGs only by
eyeballing histograms (examples/visualize_rng.cpp); we assert chi-square
bounds instead.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stock_market_monte_carlo_tpu.ops import rng as r

M32 = 0xFFFFFFFF


def _xorshift_py(y):
    # Liao 2020, as in the reference kernels (src/simulations.cu:70-76)
    y ^= (y << 11) & M32
    y &= M32
    y ^= y >> 7
    y ^= y >> 12
    return y & M32


def _xorshift_gm_py(x):
    x ^= (x << 13) & M32
    x ^= x >> 17
    x ^= (x << 5) & M32
    return x & M32


def _pcg_py(x):
    # rand_pcg hashes its *input* (the LCG advance is dead code because the
    # C++ takes the state by value — src/simulations.cu:62-67)
    word = (((x >> ((x >> 28) + 4)) ^ x) * 277803737) & M32
    return ((word >> 22) ^ word) & M32


def test_xorshift_port_matches_python_reference():
    xs = np.asarray([1, 2, 12345, 0xDEADBEEF, 0x7FFFFFFF], np.uint32)
    got, _ = r.xorshift_step(jnp.asarray(xs))
    want = [_xorshift_py(int(x)) for x in xs]
    np.testing.assert_array_equal(np.asarray(got, np.int64), want)


def test_xorshift_gm_port():
    xs = np.asarray([1, 99, 0xABCDEF01], np.uint32)
    got, _ = r.xorshift_gm_step(jnp.asarray(xs))
    want = [_xorshift_gm_py(int(x)) for x in xs]
    np.testing.assert_array_equal(np.asarray(got, np.int64), want)


def test_xorshf96_is_pure_hash():
    # y/z reset every call in the reference, so equal inputs map to equal
    # outputs (documented quirk)
    a = r.xorshf96(jnp.asarray([7, 7, 123], jnp.uint32))
    assert int(a[0]) == int(a[1])
    x = 123
    x ^= (x << 16) & M32
    x ^= x >> 5
    x ^= (x << 1) & M32
    want = (x ^ 362436069 ^ 521288629) & M32
    assert int(a[2]) == want


def test_hybrid_taus_simple_variants():
    st2 = jnp.asarray([[129, 257]], jnp.uint32)
    new2, u2 = r.hybrid_taus_simple_step(st2)
    assert new2.shape == (1, 2) and 0 <= float(u2[0]) < 1
    new1, u1 = r.hybrid_taus_simplest_step(jnp.asarray([129], jnp.uint32))
    assert 0 <= float(u1[0]) < 1


def test_pcg_hash_port_matches_python_reference():
    xs = np.asarray([0, 1, 2, 999, 0xCAFEBABE], np.uint32)
    got = r.pcg_hash(jnp.asarray(xs))
    want = [_pcg_py(int(x)) for x in xs]
    np.testing.assert_array_equal(np.asarray(got, np.int64), want)


def test_xorshift_stream_reproduces_reference_kernel_recipe():
    # state0 = pcg(tid+1); then xorshift chain (src/simulations.cu:140-146)
    lane = np.uint32(41)
    stream = np.asarray(
        r.xorshift_stream(jnp.asarray([lane + 1]), 5)[0], np.int64
    )
    s = _pcg_py(int(lane) + 1)
    want = []
    for _ in range(5):
        s = _xorshift_py(s)
        want.append(s)
    np.testing.assert_array_equal(stream, want)


def test_hybrid_taus_uniformity():
    n = 1 << 14
    state = jnp.stack(
        [
            r.pcg_hash(jnp.arange(n, dtype=jnp.uint32) + jnp.uint32(k * 7919 + 129))
            for k in range(4)
        ],
        axis=-1,
    )
    # Taus components need state >= 128 to avoid degenerate lock-in
    state = jnp.maximum(state, jnp.uint32(128))
    us = []
    for _ in range(8):
        state, u = r.hybrid_taus_step(state)
        us.append(np.asarray(u))
    u = np.concatenate(us)
    assert u.min() >= 0 and u.max() < 1
    counts, _ = np.histogram(u, bins=64, range=(0, 1))
    expected = u.size / 64
    chi2 = ((counts - expected) ** 2 / expected).sum()
    assert chi2 < 63 + 5 * np.sqrt(2 * 63)


def test_xorshift_uniformity_chi2():
    n = 1 << 16
    bits = np.asarray(
        r.xorshift_stream(jnp.arange(1, n + 1, dtype=jnp.uint32), 4)
    )
    u = bits.astype(np.float64) * 2.0**-32
    counts, _ = np.histogram(u, bins=128, range=(0, 1))
    expected = u.size / 128
    chi2 = ((counts - expected) ** 2 / expected).sum()
    assert chi2 < 127 + 6 * np.sqrt(2 * 127)


def test_bootstrap_index_mapping_matches_reference():
    # idx = n * (u32 * 2^-32) (src/simulations.cu:148)
    bits = jnp.asarray([0, 1 << 31, M32], jnp.uint32)
    idx = np.asarray(r.bootstrap_index_from_bits(bits, 1127))
    assert idx[0] == 0
    assert idx[1] == 1127 // 2
    assert idx[2] == 1126  # clamped to table size


def test_tile_seed_avalanche():
    seeds = np.asarray(
        [int(r.tile_seed(0, t)) for t in range(1024)], np.uint64
    )
    assert len(np.unique(seeds)) == 1024
    # bit balance: each of the 32 bits set ~half the time
    bits = (
        (seeds[:, None] >> np.arange(32, dtype=np.uint64)) & 1
    ).mean(axis=0)
    assert np.all(np.abs(bits - 0.5) < 0.1)


def test_path_tile_keys_deterministic_and_distinct():
    k = jax.random.key(0)
    a = r.path_tile_keys(k, jnp.uint32(0), 4)
    b = r.path_tile_keys(k, jnp.uint32(2), 4)
    da = jax.random.key_data(a)
    db = jax.random.key_data(b)
    np.testing.assert_array_equal(da[2], db[0])  # overlap at tile 2
    assert not np.array_equal(da[0], da[1])


def _sliced_rotation_draw(words, n_table):
    """Numpy replica of the Pallas sliced-rotation bootstrap draw
    (ops/pallas_engine.py historical counter mode): one (rows, 128) uint32
    word array -> one (rows, 128) table index per path. Must implement the
    same integer arithmetic as the kernel."""
    rows, lanes = words.shape
    assert lanes == 128
    k = -(-n_table // 128)
    tail_n = n_table - 128 * (k - 1)
    ll = np.broadcast_to(np.arange(128, dtype=np.int64), (rows, 128))
    n_valid = np.where(ll < tail_n, k, k - 1).astype(np.uint64)
    # source role: chunk from the wrap-around residual
    r_res = (words.astype(np.uint64) * n_table) & 0xFFFFFFFF
    cprime = (n_valid * r_res) >> np.uint64(32)
    # dest role: column choice
    idx_dest = (words.astype(np.uint64) * n_table) >> 32
    b_row = (words[:, 0:1] & 127).astype(np.int64)
    w_rot = (ll + b_row) & 127
    w_col = np.where(idx_dest < tail_n, idx_dest, w_rot).astype(np.int64)
    # gather combined[s] = entry (cprime_s, s) at column w
    chunk_at_w = np.take_along_axis(cprime.astype(np.int64), w_col, axis=1)
    return chunk_at_w * 128 + w_col


@pytest.mark.parametrize("n_table", [1127, 300, 129, 128, 100])
def test_sliced_rotation_bootstrap_is_uniform(n_table):
    """The one-gather bootstrap scheme must sample every table entry with
    probability exactly 1/n: P(w=j) * P(c'_j = c) = (K or K-1)/n * 1/n_j
    = 1/n. Chi-square over a large sample of the exact integer math."""
    rng = np.random.default_rng(7)
    rows = 4096
    reps = 30 if n_table > 500 else 10
    counts = np.zeros(n_table + 128, np.int64)
    for _ in range(reps):
        words = rng.integers(0, 2**32, size=(rows, 128), dtype=np.uint32)
        idx = _sliced_rotation_draw(words, n_table)
        counts += np.bincount(idx.ravel(), minlength=n_table + 128)
    # padding slots beyond the table must never be selected
    k = -(-n_table // 128)
    tail_n = n_table - 128 * (k - 1)
    # entries are laid out (chunk, lane); valid flat ids < n via the
    # (c, w) -> c*128 + w map only for w < tail_n at c == k-1
    flat_valid = np.zeros(n_table + 128, bool)
    for c in range(k):
        width = 128 if c < k - 1 else tail_n
        flat_valid[c * 128:c * 128 + width] = True
    assert counts[~flat_valid].sum() == 0
    got = counts[flat_valid].astype(np.float64)
    n = got.sum()
    expected = n / n_table
    chi2 = ((got - expected) ** 2 / expected).sum()
    dof = n_table - 1
    # rotation makes sampling slightly balanced (sub-iid), so chi2 can run
    # low; only the upper bound matters
    assert chi2 < dof + 6 * np.sqrt(2 * dof), (chi2, dof)


def test_sliced_rotation_bootstrap_row_mates_not_positively_correlated():
    """Collision probability for two paths in the same row must not exceed
    the iid baseline 1/n (the rotation branch is collision-free)."""
    rng = np.random.default_rng(3)
    n_table = 1127
    rows, reps = 2048, 40
    same = 0
    total = 0
    for _ in range(reps):
        words = rng.integers(0, 2**32, size=(rows, 128), dtype=np.uint32)
        idx = _sliced_rotation_draw(words, n_table)
        same += int((idx[:, 0] == idx[:, 64]).sum())
        total += rows
    p = same / total
    assert p < 1.0 / n_table * 1.5, p  # ~7.9e-4 expected, iid is 8.9e-4
