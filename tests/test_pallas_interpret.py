"""Pallas kernel coverage on CPU via interpret mode.

The hardware PRNG (`pltpu.prng_seed`) has no CPU lowering, so only the
Sobol kernels (which fold direction numbers arithmetically) run here; the
PRNG-based Gaussian/historical kernels are exercised on real TPU by the
bench harness and the driver's compile check. Sobol is the strongest
cross-check anyway: the Pallas path must reproduce the XLA path's exact
points and ICDF, so final values agree to float reassociation.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import stock_market_monte_carlo_tpu as smmc
from stock_market_monte_carlo_tpu.config import EngineOptions

OPTS_PALLAS = EngineOptions(backend="pallas", chunk_paths=8192)
OPTS_XLA = EngineOptions(backend="xla", chunk_paths=8192)


def test_sobol_gaussian_pallas_matches_xla_exactly():
    m = smmc.SobolGaussianReturns.create(n_periods=24)
    fp = smmc.simulate_final_values(m, 8192, 24, seed=5, options=OPTS_PALLAS)
    fx = smmc.simulate_final_values(m, 8192, 24, seed=5, options=OPTS_XLA)
    np.testing.assert_allclose(fp, fx, rtol=1e-3)


def test_sobol_historical_pallas_matches_xla(historical_table):
    m = smmc.SobolHistoricalBootstrap.create(
        jnp.asarray(historical_table), n_periods=12
    )
    fp = smmc.simulate_final_values(m, 8192, 12, seed=2, options=OPTS_PALLAS)
    fx = smmc.simulate_final_values(m, 8192, 12, seed=2, options=OPTS_XLA)
    np.testing.assert_allclose(fp, fx, rtol=1e-3)


def test_sobol_pallas_stats_block(historical_table):
    m = smmc.SobolGaussianReturns.create(n_periods=12)
    res = smmc.simulate_stats(
        m, 8192, 12, seed=1, target_amount=1030.0, options=OPTS_PALLAS
    )
    ref = smmc.simulate_stats(
        m, 8192, 12, seed=1, target_amount=1030.0, options=OPTS_XLA
    )
    np.testing.assert_allclose(res.mean, ref.mean, rtol=1e-5)
    # see test_checkpoint: the cancellation in std amplifies ulp-level
    # reassociation differences between the kernel row-sums and XLA sums
    np.testing.assert_allclose(res.std, ref.std, rtol=5e-4)
    assert res.count_below == ref.count_below
    # histograms may differ by boundary-bin jitter from float reassociation
    # (a ~1e-7 relative shift moves a path across a narrow bin edge); the
    # CDF can therefore differ only transiently at single-bin scale
    assert res.histogram_counts.sum() == ref.histogram_counts.sum()
    cdf_diff = np.abs(
        np.cumsum(res.histogram_counts) - np.cumsum(ref.histogram_counts)
    )
    assert cdf_diff.max() <= 8


def test_sobol_pallas_strategies():
    from stock_market_monte_carlo_tpu.models.strategies import (
        FixedPercentWithdrawal,
    )

    m = smmc.SobolGaussianReturns.create(n_periods=12)
    base = smmc.simulate_final_values(m, 8192, 12, seed=3,
                                      options=OPTS_PALLAS)
    w = smmc.simulate_final_values(
        m, 8192, 12, seed=3, strategy=FixedPercentWithdrawal(1.0),
        options=OPTS_PALLAS,
    )
    np.testing.assert_allclose(w, base * 0.99**12, rtol=1e-4)


def test_sobol_deep_index_pallas_matches_xla():
    """64-bit-depth Sobol (index_offset past 2^33) through the Pallas
    kernel's two-word gray fold vs the XLA path."""
    m = smmc.SobolGaussianReturns.create(
        n_periods=12, index_offset=(1 << 33) + 777
    )
    fp = smmc.simulate_final_values(m, 8192, 12, seed=5, options=OPTS_PALLAS)
    fx = smmc.simulate_final_values(m, 8192, 12, seed=5, options=OPTS_XLA)
    np.testing.assert_allclose(fp, fx, rtol=1e-3)


def test_clt_prefix_mxu_matches_roll(monkeypatch):
    """The two withdrawn-total prefix implementations (Hillis-Steele
    rolls vs log-space MXU matmul, SMMC_CLT_PREFIX) must agree through
    the interpreter on identical streams. gaussian_sampler MUST be
    "clt-prefix" — plain "clt" with a tracked-withdrawn strategy routes
    to the ICDF kernel and would make this test vacuous. The build
    caches are keyed by the implementation (engine._get_chunk_fn /
    _build_clt_call), so no manual cache clearing is needed."""
    from stock_market_monte_carlo_tpu.models.strategies import (
        FixedPercentWithdrawal,
    )

    def run_once(impl):
        monkeypatch.setenv("SMMC_CLT_PREFIX", impl)
        opts = EngineOptions(backend="pallas",
                             gaussian_sampler="clt-prefix",
                             chunk_paths=8192)
        from stock_market_monte_carlo_tpu.engine.engine import (
            _effective_sampler,
        )

        assert _effective_sampler(
            smmc.GaussianReturns(), FixedPercentWithdrawal(0.25),
            "pallas", opts,
        ) == "clt-prefix"
        return smmc.simulate_stats(
            smmc.GaussianReturns(), 8192, 360, seed=3,
            strategy=FixedPercentWithdrawal(0.25),
            target_amount=2000.0, options=opts,
        )

    a = run_once("roll")
    b = run_once("mxu")
    # measured rel diffs through the interpreter: mean 7.5e-6,
    # withdrawn 5.8e-6 — bars leave ~3x headroom
    assert b.mean == pytest.approx(a.mean, rel=3e-5)
    assert b.moments.total_withdrawn == pytest.approx(
        a.moments.total_withdrawn, rel=3e-5
    )


def test_clt_finals_free_matches_finals_kernel(monkeypatch):
    """The finals-free CLT kernel (SMMC_CLT_FINALSFREE=1 — no (P,1)
    finals output, the v15 law-kernel trade) must reproduce the finals
    kernel's stats and MXU histogram bit for bit on identical NONZERO
    streams (SMMC_PRNG_IMPL=arith gives the production kernel bodies
    full-fidelity bits on CPU). Build caches key on both env knobs."""
    monkeypatch.setenv("SMMC_PRNG_IMPL", "arith")
    m = smmc.GaussianReturns()

    def run(ff, histogram):
        monkeypatch.setenv("SMMC_CLT_FINALSFREE", ff)
        opts = EngineOptions(backend="pallas", gaussian_sampler="clt",
                             chunk_paths=2 * 8192, histogram=histogram)
        return smmc.simulate_stats(m, 4 * 8192 - 777, 24, seed=4,
                                   target_amount=1200.0, options=opts)

    for histogram in (True, False):
        a = run("0", histogram)
        b = run("1", histogram)
        assert a.mean == b.mean
        assert a.std == b.std
        assert a.moments.min == b.moments.min
        assert a.moments.max == b.moments.max
        assert a.count_below == b.count_below
        if histogram:
            np.testing.assert_array_equal(a.histogram_counts,
                                          b.histogram_counts)
        assert a.std > 1.0  # nonzero streams, not the interpreter stub
