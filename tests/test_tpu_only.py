"""TPU-hardware validation (skipped on the CPU test mesh).

These exercise the hardware-PRNG Pallas kernels, which have no CPU
lowering. Run manually on a TPU host with:

    JAX_PLATFORMS=axon python -m pytest tests/test_tpu_only.py -q -p no:cacheprovider --override-ini=addopts=

(the default conftest forces CPU; this module re-checks the live backend
and skips unless it's really TPU).
"""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="requires real TPU"
)


def _opts(**kw):
    from stock_market_monte_carlo_tpu.config import EngineOptions

    kw.setdefault("chunk_paths", 2**21)
    return EngineOptions(**kw)


def test_gaussian_pallas_analytic_moments():
    import stock_market_monte_carlo_tpu as smmc

    n, t = 2**21, 360
    res = smmc.simulate_stats(smmc.GaussianReturns(), n, t, seed=3,
                              options=_opts())
    mean_a = 1000 * 1.005**t
    m1, s1 = 1.005, 10 / 12 / 100
    std_a = mean_a * np.sqrt(((m1 * m1 + s1 * s1) / (m1 * m1)) ** t - 1)
    assert abs(res.mean - mean_a) < 5 * std_a / np.sqrt(n)
    assert abs(res.std - std_a) / std_a < 5e-3


def test_clt_sampler_statistical_parity():
    """CLT turbo sampler must match the exact-ICDF engine's distribution
    to well inside the 1e-3 bar on mean/std/quantiles."""
    import stock_market_monte_carlo_tpu as smmc

    n, t = 2**22, 360
    a = smmc.simulate_stats(smmc.GaussianReturns(), n, t, seed=3,
                            options=_opts())
    b = smmc.simulate_stats(smmc.GaussianReturns(), n, t, seed=3,
                            options=_opts(gaussian_sampler="clt"))
    se_mean = a.std / np.sqrt(n)
    assert abs(a.mean - b.mean) < 5 * se_mean
    assert abs(a.std - b.std) / a.std < 3e-3
    qa = a.quantiles([0.01, 0.05, 0.5, 0.95, 0.99])
    qb = b.quantiles([0.01, 0.05, 0.5, 0.95, 0.99])
    for q in qa:
        assert abs(qa[q] - qb[q]) / qa[q] < 3e-3, q


def test_historical_pallas_matches_table_moments(historical_table):
    import jax.numpy as jnp

    import stock_market_monte_carlo_tpu as smmc

    m = smmc.HistoricalBootstrap(jnp.asarray(historical_table))
    n, t = 2**21, 360
    res = smmc.simulate_stats(m, n, t, seed=2, options=_opts())
    g = (100 + historical_table.astype(np.float64)) / 100
    mean_a = 1000.0 * g.mean() ** t
    var_a = 1000.0**2 * ((g**2).mean() ** t - g.mean() ** (2 * t))
    assert abs(res.mean - mean_a) < 5 * np.sqrt(var_a / n)


def test_clt_keep_finals_and_masking():
    import stock_market_monte_carlo_tpu as smmc

    n = 2**21 + 12345  # ragged
    res = smmc.simulate_stats(
        smmc.GaussianReturns(), n, 60, seed=4,
        options=_opts(gaussian_sampler="clt"), keep_final_values=True,
    )
    assert res.final_values.shape == (n,)
    assert np.all(res.final_values > 0)
    assert res.moments.n == n
    # stats derived from kept finals must agree with in-kernel stats
    np.testing.assert_allclose(res.final_values.mean(), res.mean, rtol=1e-5)
    np.testing.assert_allclose(
        res.final_values.min(), res.moments.min, rtol=1e-6
    )


def test_pallas_power_sum_extraction_well_conditioned(historical_table):
    """Hardware version of test_analytic's conditioning check: std (and
    skew/kurtosis) extracted from the Pallas kernels' centered partial
    rows must match float64 statistics of the IDENTICAL finals to <=1e-5
    (the old uncentered floor was 1e-4; ref contract: the reduceBlock
    mean/variance pipeline, benchmark_mc_gpu_reduceBlock.cpp:7-26)."""
    import jax.numpy as jnp

    import stock_market_monte_carlo_tpu as smmc

    n, t = 2**22, 360  # 2 chunks of 2^21
    cases = [
        (smmc.GaussianReturns(), "icdf"),
        (smmc.GaussianReturns(), "clt"),
        (smmc.HistoricalBootstrap(jnp.asarray(historical_table)), "icdf"),
    ]
    for model, sampler in cases:
        res = smmc.simulate_stats(
            model, n, t, seed=13,
            options=_opts(gaussian_sampler=sampler),
            keep_final_values=True,
        )
        f = np.asarray(res.final_values, np.float64)
        mean, std = f.mean(), f.std(ddof=0)
        assert abs(res.mean / mean - 1) < 1e-5, sampler
        assert abs(res.std / std - 1) < 1e-5, sampler
        kurt = float(((f - mean) ** 4).mean() / std**4)
        assert abs(res.moments.kurtosis / kurt - 1) < 1e-4, sampler


def test_reference_rng_pallas_matches_xla_exactly(historical_table):
    """rng='reference' draws an identical integer stream on the Pallas
    kernel and the XLA engine: per-path finals must agree to float
    reassociation."""
    import jax.numpy as jnp

    import stock_market_monte_carlo_tpu as smmc
    from stock_market_monte_carlo_tpu.config import EngineOptions

    m = smmc.HistoricalBootstrap(jnp.asarray(historical_table),
                                 rng="reference")
    n, t = 2**14, 24
    fp = smmc.simulate_final_values(
        m, n, t, seed=0, options=EngineOptions(chunk_paths=2**14)
    )
    fx = smmc.simulate_final_values(
        m, n, t, seed=0,
        options=EngineOptions(chunk_paths=2**14, backend="xla"),
    )
    np.testing.assert_allclose(fp, fx, rtol=1e-5)


def test_pallas_chunk_invariance_tpu():
    import stock_market_monte_carlo_tpu as smmc

    n, t = 2**16, 24
    a = smmc.simulate_final_values(
        smmc.GaussianReturns(), n, t, seed=9,
        options=_opts().__class__(chunk_paths=2**14),
    )
    b = smmc.simulate_final_values(
        smmc.GaussianReturns(), n, t, seed=9,
        options=_opts().__class__(chunk_paths=2**16),
    )
    np.testing.assert_array_equal(a, b)


def test_pallas_meets_1e3_bar_against_oracle():
    """BASELINE.md's north-star tolerance demonstrated directly: both TPU
    samplers within 1e-3 of the independent FFT-convolution oracle
    (ops/analytic.py) on mean/std/quantiles at 2^24 paths."""
    import numpy as np

    import stock_market_monte_carlo_tpu as smmc
    from stock_market_monte_carlo_tpu.ops import analytic as an

    n, t = 2**24, 360
    qs = [0.05, 0.25, 0.5, 0.75, 0.95]
    mean_a, std_a = an.final_value_moments(0.5, 10 / 12, t, 1000.0)
    want_q = an.final_value_quantiles(0.5, 10 / 12, t, 1000.0, qs)
    for sampler in ("icdf", "clt"):
        res = smmc.simulate_stats(
            smmc.GaussianReturns(), n, t, seed=17,
            options=_opts(gaussian_sampler=sampler, chunk_paths=2**24),
        )
        assert abs(res.mean - mean_a) / mean_a < 1e-3, sampler
        assert abs(res.std - std_a) / std_a < 1e-3, sampler
        got_map = res.quantiles(qs)
        got = np.asarray([got_map[q] for q in qs])
        np.testing.assert_allclose(got, want_q, rtol=1e-3,
                                   err_msg=sampler)


def test_clt_prefix_strategy_kernel_exact():
    """The lane-prefix CLT strategy kernel (sampler='clt-prefix') matches
    the exact ICDF kernel's distribution and withdrawn totals."""
    import numpy as np

    import stock_market_monte_carlo_tpu as smmc
    from stock_market_monte_carlo_tpu.models.strategies import (
        FixedPercentWithdrawal,
    )

    n, t = 2**22, 360
    strat = FixedPercentWithdrawal(0.25)
    a = smmc.simulate_stats(smmc.GaussianReturns(), n, t, seed=3,
                            strategy=strat, options=_opts())
    b = smmc.simulate_stats(
        smmc.GaussianReturns(), n, t, seed=3, strategy=strat,
        options=_opts(gaussian_sampler="clt-prefix"),
    )
    se = a.std / np.sqrt(n)
    assert abs(a.mean - b.mean) < 5 * se
    assert abs(a.std - b.std) / a.std < 3e-3
    wd_a = a.moments.total_withdrawn
    wd_b = b.moments.total_withdrawn
    assert abs(wd_a - wd_b) / wd_a < 2e-3
    # withdrawn per path has a closed form under constant keep:
    # E[wd] = v0 * m1 * (1-k) * ((k*m1)^T - 1) / (k*m1 - 1)
    k, m1 = 1 - 0.25 / 100, 1.005
    ewd = 1000.0 * m1 * (1 - k) * ((k * m1) ** t - 1) / (k * m1 - 1)
    assert abs(wd_b / n - ewd) / ewd < 5e-3


def test_historical_strategy_pallas_matches_xla_stats(historical_table):
    """Sliced-rotation bootstrap composed with a withdrawal strategy:
    the Pallas kernel's statistics must match the XLA engine's (different
    bit streams, same distribution)."""
    import jax.numpy as jnp
    import numpy as np

    import stock_market_monte_carlo_tpu as smmc
    from stock_market_monte_carlo_tpu.models.strategies import (
        FixedPercentWithdrawal,
    )

    m = smmc.HistoricalBootstrap(jnp.asarray(historical_table))
    strat = FixedPercentWithdrawal(0.5)
    n, t = 2**21, 120
    a = smmc.simulate_stats(m, n, t, seed=5, strategy=strat,
                            options=_opts())
    b = smmc.simulate_stats(m, n, t, seed=5, strategy=strat,
                            options=_opts(backend="xla"))
    se = b.std / np.sqrt(n)
    assert abs(a.mean - b.mean) < 5 * se
    assert abs(a.std - b.std) / b.std < 0.01
    wd_a = a.moments.total_withdrawn
    wd_b = b.moments.total_withdrawn
    assert abs(wd_a - wd_b) / wd_b < 0.01


def test_clt_ks_statistic_vs_oracle_cdf():
    """Whole-distribution check of the CLT sampler on hardware: KS
    statistic of its empirical finals CDF against the exact
    FFT-convolution oracle, inside the 1% critical band."""
    import numpy as np

    import stock_market_monte_carlo_tpu as smmc
    from stock_market_monte_carlo_tpu.ops import analytic as an

    n, t = 1 << 18, 120
    res = smmc.simulate_stats(
        smmc.GaussianReturns(), n, t, seed=23,
        options=_opts(gaussian_sampler="clt", chunk_paths=1 << 18),
        keep_final_values=True,
    )
    finals = np.sort(res.final_values.astype(np.float64))
    values, cdf = an.final_value_distribution(0.5, 10 / 12, t, 1000.0)
    pos = np.clip(np.searchsorted(values, finals, side="right") - 1,
                  0, len(cdf) - 1)
    f_oracle = cdf[pos]
    ecdf_hi = np.arange(1, n + 1) / n
    ecdf_lo = np.arange(0, n) / n
    d = max(np.max(np.abs(ecdf_hi - f_oracle)),
            np.max(np.abs(f_oracle - ecdf_lo)))
    assert d < 1.63 / np.sqrt(n), d


def test_clt_nw_strategy_full_speed_path():
    """track_withdrawn=False + sampler='clt' runs multiplicative
    strategies through the PLAIN CLT kernel with the keep fractions
    folded into the per-block constants — strategy finals are exact at
    plain-CLT speed; total_withdrawn reports 0.0 by contract."""
    import numpy as np

    import stock_market_monte_carlo_tpu as smmc
    from stock_market_monte_carlo_tpu.models.strategies import (
        FixedPercentWithdrawal,
    )

    n, t = 2**22, 360
    strat = FixedPercentWithdrawal(0.25)
    ref = smmc.simulate_stats(smmc.GaussianReturns(), n, t, seed=3,
                              strategy=strat, options=_opts())
    fast = smmc.simulate_stats(
        smmc.GaussianReturns(), n, t, seed=3, strategy=strat,
        options=_opts(gaussian_sampler="clt", track_withdrawn=False),
    )
    se = ref.std / np.sqrt(n)
    assert abs(fast.mean - ref.mean) < 5 * se
    assert abs(fast.std - ref.std) / ref.std < 3e-3
    assert fast.moments.total_withdrawn == 0.0
    # closed form: E[V_T] = v0 * (m1*k)^T
    k, m1 = 1 - 0.25 / 100, 1.005
    mean_a = 1000.0 * (m1 * k) ** t
    assert abs(fast.mean - mean_a) / mean_a < 1e-3


def test_clt_long_horizon_fori_path():
    """T > 2048 months (nblocks > 16) exercises the CLT kernel's
    fori_loop block path, which the unrolled default never compiles."""
    import numpy as np

    import stock_market_monte_carlo_tpu as smmc

    T = 2304
    r = smmc.simulate_stats(smmc.GaussianReturns(), 2**22, T, seed=2,
                            target_amount=2000.0,
                            options=_opts(gaussian_sampler="clt",
                                          chunk_paths=2**22))
    a, b = 1.005, 1 / 120
    mean_a = 1000 * a**T
    std_a = (1000**2 * ((a * a + b * b) ** T - a ** (2 * T))) ** 0.5
    assert abs(r.mean - mean_a) / mean_a < 5e-3
    assert abs(r.std - std_a) / std_a < 2e-2
    # the keep-fold strategy mode at the same horizon exercises the
    # fori path's TRACED keep_ref[j, :] sublane slice
    from stock_market_monte_carlo_tpu.models.strategies import (
        FixedPercentWithdrawal,
    )

    rs = smmc.simulate_stats(
        smmc.GaussianReturns(), 2**22, T, seed=2, target_amount=2000.0,
        strategy=FixedPercentWithdrawal(0.25),
        options=_opts(gaussian_sampler="clt", track_withdrawn=False,
                      chunk_paths=2**22))
    k = 1 - 0.25 / 100
    mean_s = 1000 * (a * k) ** T
    assert abs(rs.mean - mean_s) / mean_s < 5e-3
    assert rs.moments.total_withdrawn == 0.0


def test_pallas_bands_statistical_parity_vs_xla(historical_table):
    """The fused Pallas band kernel's BAND VALUES must match the XLA
    band path statistically on hardware (different bit streams, same
    distribution) — the CPU suite can only check composition/mass
    because the interpreter's PRNG stub is all-zeros. A mass-conserving
    binning bug (wrong coefficient sign, month/row misalignment) fails
    here and nowhere else."""
    import jax.numpy as jnp

    import stock_market_monte_carlo_tpu as smmc
    from stock_market_monte_carlo_tpu.models.strategies import (
        FixedPercentWithdrawal,
    )

    n, t = 2**21, 60
    cases = [
        (smmc.GaussianReturns(), smmc.NoWithdrawal()),
        (smmc.HistoricalBootstrap(jnp.asarray(historical_table)),
         FixedPercentWithdrawal(0.5)),
    ]
    for model, strat in cases:
        a = smmc.simulate_bands(model, n, t, seed=7, strategy=strat,
                                sample_paths=0,
                                options=_opts(backend="pallas"))
        b = smmc.simulate_bands(model, n, t, seed=7, strategy=strat,
                                sample_paths=0,
                                options=_opts(backend="xla"))
        # every month's counts account for every path in both paths
        assert a.month_hist.sum(axis=1).tolist() == [n] * (t + 1)
        assert b.month_hist.sum(axis=1).tolist() == [n] * (t + 1)
        # band values: independent 2^21-path samples on a 1024-bin grid;
        # mid-quantile MC error ~1e-3 relative, grid quantization ~1 bin
        # width (~2.3% of sigma_t in log space) — 1% covers both
        np.testing.assert_allclose(a.values[:, 1:], b.values[:, 1:],
                                   rtol=1e-2)
        # months after the first: medians track the model's drift
        assert np.all(np.diff(a.values[2]) > -a.values[2][:-1] * 0.05)


def test_cdf_bands_parity_vs_hist(historical_table):
    """CDF band mode (band_mode='cdf') vs the hist mode on hardware.

    Both kernels draw the SAME tile-keyed streams, so with the same seed
    they reduce the IDENTICAL sample — the band values differ only by
    reduction resolution (hist: linear interp on a 1024-bin z-grid,
    ~0.023 z quantization; cdf: probit interp between 32 thresholds,
    ~1e-3 z for near-lognormal months). 1% relative covers both with
    margin; a threshold-placement or counting bug fails by orders of
    magnitude."""
    import jax.numpy as jnp

    import stock_market_monte_carlo_tpu as smmc
    from stock_market_monte_carlo_tpu.models.strategies import (
        FixedPercentWithdrawal,
    )

    n, t = 2**21, 60
    cases = [
        (smmc.GaussianReturns(), smmc.NoWithdrawal()),
        (smmc.HistoricalBootstrap(jnp.asarray(historical_table)),
         FixedPercentWithdrawal(0.5)),
    ]
    for model, strat in cases:
        a = smmc.simulate_bands(model, n, t, seed=7, strategy=strat,
                                sample_paths=0, band_mode="cdf",
                                options=_opts(backend="pallas"))
        b = smmc.simulate_bands(model, n, t, seed=7, strategy=strat,
                                sample_paths=0,
                                options=_opts(backend="pallas"))
        assert a.mode == "cdf"
        # counts-below: monotone, bounded, every month's top guard sees
        # (essentially) every path
        assert (np.diff(a.month_hist, axis=1) >= 0).all()
        assert a.month_hist[:, -1].min() >= n - 5
        np.testing.assert_allclose(a.values[:, 1:], b.values[:, 1:],
                                   rtol=1e-2)


def test_terminal_law_hardware_parity():
    """Terminal-law Pallas kernel on real hardware: one erfinv draw per
    path through the fitted quantile function must reproduce the FFT
    oracle's moments/quantiles within MC bars — the same bars the exact
    month-loop engine meets (the two engines sample the same law)."""
    import stock_market_monte_carlo_tpu as smmc
    from stock_market_monte_carlo_tpu.ops import analytic

    n, t = 2**22, 360
    g = smmc.GaussianReturns()
    res = smmc.simulate_stats(g, n, t, seed=11,
                              options=_opts(terminal_law=True))
    mean_cf, std_cf = analytic.final_value_moments(
        float(g.mean_pct), float(g.std_pct), t, 1000.0)
    assert abs(res.mean - mean_cf) < 5 * std_cf / np.sqrt(n)
    assert abs(res.std - std_cf) / std_cf < 5e-3
    qs = (0.01, 0.05, 0.5, 0.95, 0.99)
    oq = analytic.final_value_quantiles(
        float(g.mean_pct), float(g.std_pct), t, 1000.0, qs)
    sq = res.quantiles(qs)
    for q, want in zip(qs, oq):
        assert abs(sq[q] / want - 1.0) < 3e-3, (q, sq[q], want)

    # historical: vs the exact bootstrap FFT law
    h = smmc.HistoricalBootstrap.from_csv()
    rh = smmc.simulate_stats(h, n, t, seed=11,
                             options=_opts(terminal_law=True))
    values, cdf = analytic.bootstrap_final_value_distribution(
        np.asarray(h.returns_pct, np.float64), t, 1000.0)
    pmf = np.diff(np.concatenate([[0.0], cdf]))
    mean_o = float(np.sum(pmf * values))
    std_o = float(np.sqrt(np.sum(pmf * values**2) - mean_o**2))
    assert abs(rh.mean - mean_o) < 5 * std_o / np.sqrt(n)
    oqh = analytic.quantiles_from_cdf(values, cdf, qs)
    sqh = rh.quantiles(qs)
    for q, want in zip(qs, oqh):
        assert abs(sqh[q] / want - 1.0) < 3e-3, (q, sqh[q], want)

    # determinism on hardware PRNG
    res2 = smmc.simulate_stats(g, n, t, seed=11,
                               options=_opts(terminal_law=True))
    assert res2.mean == res.mean
    np.testing.assert_array_equal(res2.histogram_counts,
                                  res.histogram_counts)


def test_law_statsonly_matches_finals_kernel_hardware():
    """Full-entropy identity between the finals-free grouped law kernel
    (the simulate_stats default) and the finals-writing kernel
    (keep_final_values=True): same per-tile hardware-PRNG streams by
    construction, so histograms/min/max/count-below agree exactly and
    the moment rows to f32 reassociation."""
    import stock_market_monte_carlo_tpu as smmc

    n, t = 2**21 + 12345, 360  # ragged tail exercises masked group lanes
    g = smmc.GaussianReturns()
    a = smmc.simulate_stats(g, n, t, seed=17,
                            options=_opts(terminal_law=True))
    b = smmc.simulate_stats(g, n, t, seed=17,
                            options=_opts(terminal_law=True),
                            keep_final_values=True)
    np.testing.assert_array_equal(a.histogram_counts, b.histogram_counts)
    assert a.moments.min == b.moments.min
    assert a.moments.max == b.moments.max
    assert a.count_below == b.count_below
    assert abs(a.mean / b.mean - 1.0) < 1e-6
    assert abs(a.std / b.std - 1.0) < 1e-5
    # the finals themselves are the law quantile of each path's draw
    assert b.final_values is not None and len(b.final_values) == n


def test_arith_stream_matches_cpu_golden(monkeypatch):
    """Cross-backend reproducibility of the arith counter stream on the
    real chip against CPU-generated goldens (tests/test_arith_golden.py):
    the historical kernel (gather/select/multiply only — elementwise IEEE
    ops) must match BIT FOR BIT; CLT (MXU matmul, exp/log) and the
    terminal law (exp) carry tight relative bars because those lowerings
    legitimately differ per backend."""
    import stock_market_monte_carlo_tpu as smmc
    from stock_market_monte_carlo_tpu.config import EngineOptions
    from tests.test_arith_golden import GOLDEN, N

    monkeypatch.setenv("SMMC_PRNG_IMPL", "arith")

    def finals(name):
        kw = {}
        if name == "historical":
            model = smmc.HistoricalBootstrap.from_csv()
        else:
            model = smmc.GaussianReturns()
            if name == "clt":
                kw["gaussian_sampler"] = "clt"
            else:
                kw["terminal_law"] = True
        opts = EngineOptions(backend="pallas", chunk_paths=8192, **kw)
        return np.asarray(smmc.simulate_final_values(
            model, N, GOLDEN[name]["t"], seed=12, options=opts))

    f = finals("historical")
    g = GOLDEN["historical"]
    np.testing.assert_array_equal(f[:4], np.float32(g["head"]))
    for idx, val in g["probes"].items():
        assert f[idx] == np.float32(val), ("historical", idx, f[idx])
    assert float(np.sum(f, dtype=np.float64)) == pytest.approx(
        g["total"], rel=1e-12)

    for name, rel in (("clt", 2e-5), ("law", 2e-5)):
        f = finals(name)
        g = GOLDEN[name]
        np.testing.assert_allclose(f[:4], np.float32(g["head"]), rtol=rel)
        assert float(np.sum(f, dtype=np.float64)) == pytest.approx(
            g["total"], rel=rel)


def test_seed_segmentation_hardware_law():
    """Segmented terminal-law run on the production Pallas kernels:
    segment 0 must reproduce the unsegmented prefix (same stats for the
    first-segment paths), the merged run must carry exact counts, and
    the mean must sit within CLT noise of the exact bootstrap-law mean.
    (The full invariance matrix is CPU-tested in tests/test_segments.py;
    this pins the hardware path end to end.)"""
    import stock_market_monte_carlo_tpu as smmc

    hist = smmc.HistoricalBootstrap.from_csv()
    seg = 2 * 2**21
    n = 5 * 2**21 + 12345  # 3 segments, ragged tail
    o = _opts(terminal_law=True, seed_segment_paths=seg)
    r = smmc.simulate_stats(hist, n, 360, seed=7, target_amount=2000.0,
                            options=o)
    assert r.moments.n == n
    assert r.histogram_counts.sum() == n
    # segment 0 == plain-seed run of seg paths (merged stats additivity:
    # subtracting the unsegmented prefix's sums must leave a valid
    # remainder with the right count)
    r0 = smmc.simulate_stats(hist, seg, 360, seed=7, target_amount=2000.0,
                             options=_opts(terminal_law=True))
    rest = np.asarray(r.histogram_counts) - np.asarray(r0.histogram_counts)
    assert (rest >= 0).all() and rest.sum() == n - seg
    table = np.asarray(hist.returns_pct, np.float64)
    exact_mean = 1000.0 * (1.0 + table.mean() / 100.0) ** 360
    assert abs(r.mean - exact_mean) < 6 * r.std / np.sqrt(n)


def test_hostile_big_table_hardware():
    """The sliced-rotation one-gather sampler with a 32749-row table
    (256 table slices vs the synthetic table's 9) on REAL hardware:
    until round 5 every hardware run used the ~1127-row table, so the
    large-k Mosaic lowering of the gather had never executed on the
    chip. Mean and second moment must match the closed forms
    E[V_T] = v0 E[g]^T, E[V_T^2] = v0^2 E[g^2]^T within MC tolerance
    (same contract as test_historical_pallas_matches_table_moments)."""
    import stock_market_monte_carlo_tpu as smmc
    from stock_market_monte_carlo_tpu.data._synthetic import (
        hostile_monthly_returns,
    )

    table = hostile_monthly_returns(32749)
    model = smmc.HistoricalBootstrap(table)
    n, t = 2**22, 60
    res = smmc.simulate_stats(model, n, t, seed=17, options=_opts())
    g = 1.0 + table.astype(np.float64) / 100.0
    mean_a = 1000.0 * g.mean() ** t
    m2_a = 1000.0 ** 2 * (g * g).mean() ** t
    var_a = m2_a - mean_a ** 2
    assert abs(res.mean - mean_a) < 6 * np.sqrt(var_a / n), (
        res.mean, mean_a)
    # heavy tails: second moment has huge MC variance — compare std
    # loosely (the law-level cross-checks run on CPU vs the FFT oracle,
    # tests/test_hostile_table.py; this pins the hardware gather)
    assert abs(res.std - np.sqrt(var_a)) / np.sqrt(var_a) < 0.25
    assert res.histogram_counts.sum() == n
