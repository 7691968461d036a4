"""The production multi-chip configuration: Pallas kernels under shard_map.

This is the composition the north-star claim rests on — the fused kernels
(the reference's optimized GPU path, src/simulations.cu:112-247) dispatched
per device over a ``Mesh("paths")`` with psum/pmin/pmax merging over ICI
(the reference's multi-GPU async launcher role, src/simulations.cu:576-655).
Hardware has one chip, so these tests prove the composition on the 8-device
virtual CPU mesh at two fidelity levels (see ops.pallas_engine.interpret_mode):

- FULL fidelity: kernels whose streams are arithmetic (Sobol direction
  folds; the reference-parity xorshift/PCG recipe keyed by global path id)
  run under plain interpret mode and must reproduce single-device per-path
  values bit-for-bit under sharding.
- Composition fidelity: the hardware-PRNG kernels (sliced-rotation
  historical, Gaussian ICDF/CLT) run under the TPU-semantics interpreter,
  whose prng_random_bits is a deterministic all-zeros stub — per-path
  values are degenerate but fully defined, so the sharded dispatch, ragged
  masking, strategy math, in-kernel histogram, and the cross-device merge
  are still checked for exact single-vs-multi-device identity.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import stock_market_monte_carlo_tpu as smmc
from stock_market_monte_carlo_tpu.config import EngineOptions
from stock_market_monte_carlo_tpu.engine.engine import KEY_TILE
from stock_market_monte_carlo_tpu.models.strategies import (
    FixedPercentWithdrawal,
)

PALLAS = EngineOptions(backend="pallas", chunk_paths=KEY_TILE)


def _stats_identical(a, b, hist=True, std_atol=1e-6):
    np.testing.assert_allclose(a.mean, b.mean, rtol=1e-6)
    # std_atol: zero-bit-stream configs make every path identical, so the
    # true variance is 0 and the reported std is sqrt(f32 reassociation
    # noise) (~1e-2 in currency units) — compare those with an absolute
    # bar; full-fidelity configs keep the tight relative one
    np.testing.assert_allclose(a.std, b.std, rtol=1e-6, atol=std_atol)
    assert a.moments.n == b.moments.n
    assert a.moments.min == b.moments.min
    assert a.moments.max == b.moments.max
    assert a.count_below == b.count_below
    if hist:
        np.testing.assert_array_equal(a.histogram_counts,
                                      b.histogram_counts)


# ---------------------------------------------------------------------------
# Full-fidelity sharded kernels (streams computed arithmetically).
# ---------------------------------------------------------------------------


def test_reference_rng_historical_pallas_sharded_bitexact(
        mesh8, historical_table):
    """The reference GPU recipe (PCG seed + xorshift per month, keyed by
    global path id — src/simulations.cu:140-150) through the Pallas kernel
    on 8 devices: per-path finals must match 1-device Pallas bit for bit."""
    m = smmc.HistoricalBootstrap(jnp.asarray(historical_table),
                                 rng="reference")
    n, t = 8 * KEY_TILE, 6
    single = smmc.simulate_final_values(m, n, t, seed=4, options=PALLAS)
    sharded = smmc.simulate_final_values(m, n, t, seed=4, options=PALLAS,
                                         mesh=mesh8)
    np.testing.assert_array_equal(single, sharded)


def test_reference_rng_historical_pallas_sharded_stats(
        mesh8, historical_table):
    m = smmc.HistoricalBootstrap(jnp.asarray(historical_table),
                                 rng="reference")
    n, t = 8 * KEY_TILE, 6
    a = smmc.simulate_stats(m, n, t, seed=4, target_amount=1100.0,
                            options=PALLAS)
    b = smmc.simulate_stats(m, n, t, seed=4, target_amount=1100.0,
                            options=PALLAS, mesh=mesh8)
    _stats_identical(a, b)


def test_sobol_gaussian_pallas_sharded_bitexact(mesh8):
    """Scrambled-Sobol Gaussian kernel sharded over the mesh: the QMC
    sequence position is the global path id, so sharding must not change
    a single sample."""
    m = smmc.SobolGaussianReturns.create(n_periods=8)
    n, t = 8 * KEY_TILE, 8
    single = smmc.simulate_final_values(m, n, t, seed=7, options=PALLAS)
    sharded = smmc.simulate_final_values(m, n, t, seed=7, options=PALLAS,
                                         mesh=mesh8)
    np.testing.assert_array_equal(single, sharded)


# ---------------------------------------------------------------------------
# Composition fidelity: hardware-PRNG kernels under the TPU-semantics
# interpreter (deterministic zero-bit stream).
# ---------------------------------------------------------------------------


def test_sliced_rotation_historical_pallas_sharded(mesh8, historical_table):
    """The production historical kernel (sliced-rotation one-gather
    bootstrap) under shard_map, including a ragged tail that leaves three
    devices fully masked (valid=0)."""
    m = smmc.HistoricalBootstrap(jnp.asarray(historical_table))
    n, t = 4 * KEY_TILE + 777, 5
    a = smmc.simulate_stats(m, n, t, seed=2, target_amount=1200.0,
                            options=PALLAS)
    b = smmc.simulate_stats(m, n, t, seed=2, target_amount=1200.0,
                            options=PALLAS, mesh=mesh8)
    assert b.moments.n == n
    assert b.histogram_counts.sum() == n
    _stats_identical(a, b, std_atol=0.05)


def test_gaussian_clt_pallas_sharded(mesh8):
    """The flagship CLT MXU sampler under shard_map (the north-star
    configuration: 8-way path sharding of the fused CLT kernel)."""
    opts = EngineOptions(backend="pallas", chunk_paths=KEY_TILE,
                         gaussian_sampler="clt")
    m = smmc.GaussianReturns()
    n, t = 8 * KEY_TILE, 4
    a = smmc.simulate_stats(m, n, t, seed=3, target_amount=1000.0,
                            options=opts)
    b = smmc.simulate_stats(m, n, t, seed=3, target_amount=1000.0,
                            options=opts, mesh=mesh8)
    assert np.isfinite(b.mean) and b.mean > 0
    _stats_identical(a, b)


def test_gaussian_icdf_strategy_pallas_sharded(mesh8):
    """Exact-ICDF kernel with a withdrawal strategy sharded over the mesh
    (strategy keep factors + withdrawn accumulation cross the shard_map
    boundary as replicated operands)."""
    m = smmc.GaussianReturns()
    n, t = 8 * KEY_TILE, 4
    a = smmc.simulate_stats(m, n, t, seed=5,
                            strategy=FixedPercentWithdrawal(1.0),
                            options=PALLAS)
    b = smmc.simulate_stats(m, n, t, seed=5,
                            strategy=FixedPercentWithdrawal(1.0),
                            options=PALLAS, mesh=mesh8)
    _stats_identical(a, b)
    np.testing.assert_allclose(a.moments.total_withdrawn,
                               b.moments.total_withdrawn, rtol=1e-6)


def test_clt_keepfold_strategy_pallas_sharded(mesh8):
    """CLT keep-fold mode (strategy finals at plain-CLT speed,
    track_withdrawn=False) under shard_map."""
    opts = EngineOptions(backend="pallas", chunk_paths=KEY_TILE,
                         gaussian_sampler="clt", track_withdrawn=False)
    m = smmc.GaussianReturns()
    n, t = 8 * KEY_TILE, 4
    a = smmc.simulate_stats(m, n, t, seed=6,
                            strategy=FixedPercentWithdrawal(2.0),
                            options=opts)
    b = smmc.simulate_stats(m, n, t, seed=6,
                            strategy=FixedPercentWithdrawal(2.0),
                            options=opts, mesh=mesh8)
    _stats_identical(a, b)


def test_pallas_sharded_keep_finals(mesh8, historical_table):
    """keep_final_values through the pallas+mesh path: per-path finals
    come back P("paths")-sharded and concatenate to the single-device
    result exactly."""
    m = smmc.HistoricalBootstrap(jnp.asarray(historical_table))
    n, t = 8 * KEY_TILE, 4
    single = smmc.simulate_final_values(m, n, t, seed=8, options=PALLAS)
    sharded = smmc.simulate_final_values(m, n, t, seed=8, options=PALLAS,
                                         mesh=mesh8)
    assert sharded.shape == (n,)
    np.testing.assert_array_equal(single, sharded)


def test_law_statsonly_grouped_sharded(mesh8):
    """The finals-free grouped terminal-law kernel (multiple logical
    tiles per grid step, VMEM-accumulated histogram) under shard_map at
    a chunk size that engages the grouping — the production multi-chip
    law configuration. Zero-bit streams: sharded must equal
    single-device exactly (same dispatch shapes both ways). group=4
    keeps the TPU-semantics interpreter affordable (~70 s/compile on
    CPU); ragged in-group masking is covered at the kernel level
    (test_terminal_law.py) and at full entropy on hardware
    (test_tpu_only.py)."""
    opts = EngineOptions(backend="pallas", terminal_law=True,
                         chunk_paths=4 * KEY_TILE)
    n, t = 8 * 4 * KEY_TILE, 360  # one grouped chunk per device
    a = smmc.simulate_stats(smmc.GaussianReturns(), n, t, seed=6,
                            target_amount=2000.0, options=opts)
    b = smmc.simulate_stats(smmc.GaussianReturns(), n, t, seed=6,
                            target_amount=2000.0, options=opts,
                            mesh=mesh8)
    _stats_identical(a, b)
    assert a.histogram_counts.sum() == n


# ---------------------------------------------------------------------------
# FULL fidelity for the PRODUCTION counter-mode kernels: SMMC_PRNG_IMPL=
# arith swaps the opaque hardware PRNG for an in-kernel splitmix counter
# stream (ops.pallas_engine._arith_bits) keyed by the SAME `_tile_seed_i32`
# tile seeds the hw kernels use. The kernels below are byte-for-byte the
# production kernel bodies (only `_TileRng.bits` resolves differently), so
# these close the zeros-stub gap: the production seeding path produces
# NONZERO per-path values that must be bit-identical under shard_map and
# chunk-size changes.
# ---------------------------------------------------------------------------


@pytest.fixture
def arith_prng(monkeypatch):
    monkeypatch.setenv("SMMC_PRNG_IMPL", "arith")


def test_arith_historical_sliced_rotation_sharded_bitexact(
        arith_prng, mesh8, historical_table):
    """Production sliced-rotation bootstrap kernel, nonzero streams,
    ragged tail: per-path finals sharded == single-device bit for bit."""
    m = smmc.HistoricalBootstrap(jnp.asarray(historical_table))
    n, t = 4 * KEY_TILE + 777, 5
    single = smmc.simulate_final_values(m, n, t, seed=2, options=PALLAS)
    sharded = smmc.simulate_final_values(m, n, t, seed=2, options=PALLAS,
                                         mesh=mesh8)
    assert np.std(np.asarray(single)) > 0  # nonzero stream, not the stub
    np.testing.assert_array_equal(single, sharded)
    a = smmc.simulate_stats(m, n, t, seed=2, target_amount=1200.0,
                            options=PALLAS)
    b = smmc.simulate_stats(m, n, t, seed=2, target_amount=1200.0,
                            options=PALLAS, mesh=mesh8)
    _stats_identical(a, b)


def test_arith_gaussian_clt_sharded_bitexact(arith_prng, mesh8):
    """Production CLT MXU kernel with nonzero streams under shard_map."""
    opts = EngineOptions(backend="pallas", chunk_paths=KEY_TILE,
                         gaussian_sampler="clt")
    m = smmc.GaussianReturns()
    n, t = 8 * KEY_TILE, 4
    single = smmc.simulate_final_values(m, n, t, seed=3, options=opts)
    sharded = smmc.simulate_final_values(m, n, t, seed=3, options=opts,
                                         mesh=mesh8)
    assert np.std(np.asarray(single)) > 0
    np.testing.assert_array_equal(single, sharded)
    # statistical sanity of the arith stream: mean within MC error of
    # the analytic 1000*(1.005)^4
    analytic = 1000.0 * 1.005 ** t
    assert abs(np.mean(np.asarray(single)) - analytic) < 0.5


def test_arith_gaussian_icdf_strategy_sharded(arith_prng, mesh8):
    """Exact-ICDF kernel + withdrawal strategy, nonzero streams: stats
    and withdrawn totals identical across sharding."""
    m = smmc.GaussianReturns()
    n, t = 8 * KEY_TILE, 4
    a = smmc.simulate_stats(m, n, t, seed=5,
                            strategy=FixedPercentWithdrawal(1.0),
                            options=PALLAS)
    b = smmc.simulate_stats(m, n, t, seed=5,
                            strategy=FixedPercentWithdrawal(1.0),
                            options=PALLAS, mesh=mesh8)
    assert a.std > 1.0  # nonzero stream
    _stats_identical(a, b)
    np.testing.assert_allclose(a.moments.total_withdrawn,
                               b.moments.total_withdrawn, rtol=1e-6)


def test_arith_law_sharded_bitexact(arith_prng, mesh8):
    """Terminal-law kernels (finals + finals-free grouped stats) with
    nonzero streams under shard_map."""
    opts = EngineOptions(backend="pallas", terminal_law=True,
                         chunk_paths=KEY_TILE)
    m = smmc.GaussianReturns()
    n, t = 8 * KEY_TILE, 360
    single = smmc.simulate_final_values(m, n, t, seed=6, options=opts)
    sharded = smmc.simulate_final_values(m, n, t, seed=6, options=opts,
                                         mesh=mesh8)
    assert np.std(np.asarray(single)) > 0
    np.testing.assert_array_equal(single, sharded)
    a = smmc.simulate_stats(m, n, t, seed=6, target_amount=2000.0,
                            options=opts)
    b = smmc.simulate_stats(m, n, t, seed=6, target_amount=2000.0,
                            options=opts, mesh=mesh8)
    _stats_identical(a, b)
    assert a.histogram_counts.sum() == n


def test_arith_chunk_size_invariance(arith_prng, historical_table):
    """The arith stream is keyed by global tile position exactly like the
    hw stream, so chunk size must not change any per-path value."""
    m = smmc.HistoricalBootstrap(jnp.asarray(historical_table))
    n, t = 2 * KEY_TILE + 777, 4
    small = EngineOptions(backend="pallas", chunk_paths=KEY_TILE)
    big = EngineOptions(backend="pallas", chunk_paths=4 * KEY_TILE)
    np.testing.assert_array_equal(
        smmc.simulate_final_values(m, n, t, seed=9, options=small),
        smmc.simulate_final_values(m, n, t, seed=9, options=big))


def test_arith_segmented_sharded_bitexact(arith_prng, mesh8,
                                          historical_table):
    """Seed segmentation on the PRODUCTION sliced-rotation kernel with
    nonzero (arith) streams: segmented sharded finals == segmented
    single-device bit for bit, the segment-0 prefix equals the
    unsegmented stream, and segments draw fresh paths. Complements
    tests/test_segments.py (XLA backend) with the Pallas counter-mode
    path at full fidelity."""
    m = smmc.HistoricalBootstrap(jnp.asarray(historical_table))
    seg = 2 * KEY_TILE
    n, t = 5 * KEY_TILE + 777, 5  # 3 segments, ragged tail
    opts = EngineOptions(backend="pallas", chunk_paths=KEY_TILE,
                         seed_segment_paths=seg)
    single = smmc.simulate_final_values(m, n, t, seed=2, options=opts)
    sharded = smmc.simulate_final_values(m, n, t, seed=2, options=opts,
                                         mesh=mesh8)
    assert np.std(np.asarray(single)) > 0  # nonzero stream, not the stub
    np.testing.assert_array_equal(single, sharded)
    plain = smmc.simulate_final_values(
        m, seg, t, seed=2,
        options=EngineOptions(backend="pallas", chunk_paths=KEY_TILE))
    np.testing.assert_array_equal(np.asarray(single)[:seg],
                                  np.asarray(plain))
    assert not np.array_equal(np.asarray(single)[seg:2 * seg],
                              np.asarray(single)[:seg])
