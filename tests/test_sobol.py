import jax
import jax.numpy as jnp
import numpy as np
import pytest

import stock_market_monte_carlo_tpu as smmc
from stock_market_monte_carlo_tpu.ops import sobol as sb


def test_primitive_polynomials_known_small_degrees():
    polys = sb.primitive_polynomials()
    by_degree = {}
    for p in polys.tolist():
        by_degree.setdefault(int(p).bit_length() - 1, []).append(int(p))
    # x^2+x+1 is the unique primitive polynomial of degree 2
    assert by_degree[2] == [0b111]
    # degree 3: x^3+x+1 (0b1011), x^3+x^2+1 (0b1101)
    assert by_degree[3] == [0b1011, 0b1101]
    # known counts: phi(2^d - 1) / d
    known = {2: 1, 3: 2, 4: 2, 5: 6, 6: 6, 7: 18, 8: 16, 9: 48, 10: 60}
    for d, c in known.items():
        assert len(by_degree[d]) == c, f"degree {d}"


def test_direction_numbers_shape_and_dim0():
    v = sb.direction_numbers(8)
    assert v.shape == (8, 32)
    assert v.dtype == np.uint32
    # dim 0 = van der Corput: v_k = 2^(31-k)
    np.testing.assert_array_equal(
        v[0], np.uint32(1) << (31 - np.arange(32, dtype=np.uint32))
    )


def test_each_dimension_is_a_0_1_sequence():
    """First 2^k unscrambled points of any dim are a permutation of
    {0, 1, ..., 2^k - 1} / 2^k — the defining (0,1)-net property."""
    dims = 6
    k = 10
    v = sb.direction_numbers(dims)
    pts = np.asarray(
        sb.sobol_points_f32(jnp.asarray(v), jnp.uint32(0), 1 << k, dims)
    )
    for d in range(dims):
        cells = np.floor(pts[:, d] * (1 << k)).astype(int)
        assert sorted(cells.tolist()) == list(range(1 << k)), f"dim {d}"


def test_random_access_matches_sequential():
    """Points at offset must equal the tail of points from 0 (skip-ahead)."""
    v = jnp.asarray(sb.direction_numbers(4))
    full = np.asarray(sb.sobol_points_f32(v, jnp.uint32(0), 256, 4))
    tail = np.asarray(sb.sobol_points_f32(v, jnp.uint32(100), 156, 4))
    np.testing.assert_array_equal(full[100:], tail)


def test_digital_shift_scrambling_preserves_uniformity():
    v = jnp.asarray(sb.direction_numbers(3))
    key = jax.random.key(42)
    a = np.asarray(sb.sobol_points_f32(v, jnp.uint32(0), 4096, 3, key))
    b = np.asarray(sb.sobol_points_f32(v, jnp.uint32(0), 4096, 3))
    assert not np.allclose(a, b)  # scrambling moved the points
    for d in range(3):
        cells = np.floor(a[:, d] * 4096).astype(int)
        # digital shift keeps the (0,1)-sequence property exactly
        assert sorted(cells.tolist()) == list(range(4096))


def test_sobol_beats_pseudorandom_convergence():
    """QMC error on a smooth integrand should beat MC at the same n.

    Integrand: product of (1 + (u-0.5)) over 8 dims, exact integral 1.
    """
    dims, n = 8, 1 << 12
    v = jnp.asarray(sb.direction_numbers(dims))
    pts = np.asarray(
        sb.sobol_points_f32(v, jnp.uint32(0), n, dims, jax.random.key(1))
    )
    qmc_est = np.prod(1 + (pts - 0.5), axis=1).mean()

    mc_errs = []
    for s in range(8):
        u = np.asarray(
            jax.random.uniform(jax.random.key(100 + s), (n, dims))
        )
        mc_errs.append(abs(np.prod(1 + (u - 0.5), axis=1).mean() - 1.0))
    mc_err = np.median(mc_errs)
    assert abs(qmc_est - 1.0) < mc_err / 3


def test_sobol_gaussian_model_end_to_end():
    m = smmc.SobolGaussianReturns.create(
        n_periods=24, mean_pct=0.5, std_pct=1.0
    )
    res = smmc.simulate_stats(m, 65_536, 24, seed=7)
    mean_a = 1000.0 * (1 + 0.5 / 100) ** 24
    # QMC at 64k paths nails the mean far tighter than MC would
    assert abs(res.mean - mean_a) / mean_a < 2e-4


def test_sobol_historical_model(historical_table):
    m = smmc.SobolHistoricalBootstrap.create(
        jnp.asarray(historical_table), n_periods=12
    )
    res = smmc.simulate_stats(m, 16_384, 12, seed=3)
    g = (100 + historical_table.astype(np.float64)) / 100
    mean_a = 1000.0 * g.mean() ** 12
    assert abs(res.mean - mean_a) / mean_a < 1e-3


def test_sobol_dims_limit():
    with pytest.raises(ValueError, match="dims"):
        sb.direction_numbers(100_000)
