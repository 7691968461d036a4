"""Extreme-tail validation of the CLT MXU sampler — deterministic.

The flagship Gaussian number uses the CLT sampler (a 128-uniform mix
through a fixed orthogonal Q, ops/pallas_engine.py), whose per-month law
is not exactly normal (excess kurtosis ~ -0.027/column). This application
exists to measure P(final < target) deep in the tail, so the sampler's
law is computed EXACTLY (characteristic function + FFT convolution over
the horizon, ops/analytic.py) and compared against the exact-normal law
through the identical pipeline: no Monte Carlo noise, quantiles resolved
to p = 1e-6.

Measured (and pinned here): the CLT law's final-value quantiles deviate
from exact-normal by <= 6e-5 relative at p = 1e-6 for the default market
at 360 months — two orders inside the 1e-3 parity bar — so no ICDF
fallback is needed at any practically resolvable tail (RESULTS.md has
the full table; the law's bounded support, |z| <= ~15.7, only matters
below p ~ 1e-50).
"""

import numpy as np

from stock_market_monte_carlo_tpu.ops import analytic as an


def test_clt_z_pdf_exact_moments():
    """The CF-inversion machinery reproduces the closed-form moments of
    z = sum w_i U_i exactly: mass 1, mean 0, variance 1, and excess
    kurtosis -(1/120) sum w^4 (U(-1/2,1/2) has kappa4 = -1/120)."""
    w = an.clt_column_weights()
    assert w.shape == (128, 128)
    # unit variance by construction (the kernel's affine constants)
    np.testing.assert_allclose((w**2).sum(axis=0) / 12.0
                               * (1.0 - 2.0**-32), 1.0, rtol=1e-12)
    for j in (0, 17, 127):
        x, pdf = an.clt_z_pdf(w[:, j])
        dx = x[1] - x[0]
        mass = (pdf * dx).sum()
        mean = (x * pdf * dx).sum()
        var = (x**2 * pdf * dx).sum() - mean**2
        k4 = ((x - mean) ** 4 * pdf * dx).sum() / var**2 - 3.0
        k4_exact = -(1.0 / 120.0) * (w[:, j] ** 4).sum()
        assert abs(mass - 1.0) < 1e-9
        assert abs(mean) < 1e-10
        assert abs(var - 1.0) < 1e-8
        assert abs(k4 - k4_exact) < 1e-6, j


def test_clt_final_value_tails_match_normal_law():
    """360-month final-value quantiles under the CLT sampler's exact law
    vs the exact-normal law, same pipeline: deviation stays below 1e-4
    down to p = 1e-5 and below 2e-4 at p = 1e-6 (measured: <= 6e-5)."""
    vc, cc = an.clt_final_value_distribution(0.5, 10 / 12, 360, 1000.0)
    vn, cn = an.clt_final_value_distribution(0.5, 10 / 12, 360, 1000.0,
                                             law="normal")
    ps = [1e-6, 1e-5, 1e-4, 0.5, 1 - 1e-4, 1 - 1e-5, 1 - 1e-6]
    qc = an.quantiles_from_cdf(vc, cc, ps)
    qn = an.quantiles_from_cdf(vn, cn, ps)
    rel = np.abs(qc / qn - 1.0)
    assert rel[3] < 2e-5          # median essentially identical
    assert np.all(rel[[1, 2, 4, 5]] < 1e-4)   # p in [1e-5, 1e-4] bands
    assert np.all(rel[[0, 6]] < 2e-4)         # p = 1e-6
    # P(final < x) at the normal law's 1e-5 quantile: within 1%
    x5 = qn[1]
    pc = float(np.interp(x5, vc, cc))
    pn = float(np.interp(x5, vn, cn))
    assert abs(pc / pn - 1.0) < 0.01


def test_normal_law_pipeline_matches_independent_oracle():
    """The law='normal' arm of the CLT pipeline (centered wraparound
    grid) reproduces the original full-support oracle to ~1e-5 — the two
    implementations share no convolution code path."""
    vn, cn = an.clt_final_value_distribution(0.5, 10 / 12, 360, 1000.0,
                                             law="normal")
    ps = [1e-4, 0.5, 1 - 1e-4]
    got = an.quantiles_from_cdf(vn, cn, ps)
    want = an.final_value_quantiles(0.5, 10 / 12, 360, 1000.0, ps)
    np.testing.assert_allclose(got, want, rtol=1e-4)
