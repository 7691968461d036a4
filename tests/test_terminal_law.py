"""Terminal-law sampler (EngineOptions(terminal_law=True)).

The fit is validated against the deterministic FFT oracles
(ops/analytic.py) on the host; engine statistics are validated at full
fidelity through the XLA backend (tile-keyed threefry normals); the
Pallas kernel's composition runs under the TPU-semantics interpreter
(hardware-PRNG zero stub — statistics for that path are hardware tests,
tests/test_tpu_only.py).

Reference: no analog — the reference benchmarks only month-loop kernels
(README.md:66-75); this is the framework's algorithmic upgrade
(ops/terminal_law.py module docstring)."""

import numpy as np
import pytest

import stock_market_monte_carlo_tpu as smmc
from stock_market_monte_carlo_tpu.config import EngineOptions
from stock_market_monte_carlo_tpu.engine import engine as eng
from stock_market_monte_carlo_tpu.models.strategies import (
    FixedAmountWithdrawal,
    FixedPercentWithdrawal,
)
from stock_market_monte_carlo_tpu.ops import analytic
from stock_market_monte_carlo_tpu.ops import terminal_law as tlaw

GAUSS = smmc.GaussianReturns()
LAW = EngineOptions(terminal_law=True)


# ---------------------------------------------------------------------------
# Host fit vs the FFT oracles.
# ---------------------------------------------------------------------------


def test_fit_matches_oracle_quantiles():
    """The float32 kernel replica of the fitted quantile function must
    track the FFT oracle to ~1e-6 in log space across the full reachable
    z range — including |z| ~ 5 (p ~ 3e-7), far past any histogram."""
    fit = tlaw.fit_terminal_law(GAUSS, smmc.NoWithdrawal(), 360, 1000.0)
    assert fit.max_err < 2e-5
    assert 1 <= fit.degree < tlaw.LAW_D
    values, cdf = analytic.final_value_distribution(
        float(GAUSS.mean_pct), float(GAUSS.std_pct), 360, 1000.0
    )
    for p in (1e-6, 1e-4, 0.01, 0.5, 0.99, 1 - 1e-4):
        z = float(tlaw.norm_icdf64(p))
        got = fit.scale * np.exp(float(tlaw.clenshaw_f32(
            fit.coefs, np.float32(z / tlaw.LAW_ZMAX)
        )))
        want = analytic.quantiles_from_cdf(values, cdf, [p])[0]
        assert abs(got / want - 1.0) < 5e-5, (p, got, want)


def test_fit_historical_and_rejections():
    h = smmc.HistoricalBootstrap.from_csv()
    fit = tlaw.fit_terminal_law(h, smmc.NoWithdrawal(), 240, 1000.0)
    assert fit.max_err < 2e-5
    # a 1-month bootstrap law is a step function: must refuse, not
    # silently return a smoothed fake
    with pytest.raises(ValueError, match="not .*smooth|step function"):
        tlaw.fit_terminal_law(h, smmc.NoWithdrawal(), 1, 1000.0)
    # 100% withdrawal: every final exactly 0, no law to fit
    with pytest.raises(ValueError, match="keep"):
        tlaw.fit_terminal_law(
            GAUSS, FixedPercentWithdrawal(100.0), 12, 1000.0
        )


def test_fit_cache_and_strategy_shift():
    """Keep-fraction schedules shift the law by a constant in log space:
    the fitted quantile function must equal the no-strategy one scaled by
    prod(keep)."""
    f0 = tlaw.fit_terminal_law(GAUSS, smmc.NoWithdrawal(), 120, 1000.0)
    assert tlaw.fit_terminal_law(
        GAUSS, smmc.NoWithdrawal(), 120, 1000.0
    ) is f0  # cached
    fs = tlaw.fit_terminal_law(
        GAUSS, FixedPercentWithdrawal(0.25), 120, 1000.0
    )
    keep_prod = (1.0 - 0.25 / 100.0) ** 120
    # the two fits run independent lstsq solves; ~1e-7 relative noise
    assert fs.scale / f0.scale == pytest.approx(keep_prod, rel=1e-5)
    np.testing.assert_allclose(fs.coefs, f0.coefs, atol=2e-6)


# ---------------------------------------------------------------------------
# Engine statistics (XLA backend: full-fidelity draws on CPU).
# ---------------------------------------------------------------------------


def test_law_stats_match_closed_form():
    n, t = 1 << 20, 360
    res = smmc.simulate_stats(GAUSS, n, t, seed=3, target_amount=3000.0,
                              options=LAW)
    m = res.moments
    mean_cf, std_cf = analytic.final_value_moments(
        float(GAUSS.mean_pct), float(GAUSS.std_pct), t, 1000.0
    )
    # MC noise: se(mean) = std/sqrt(n) ~ 0.93; 5 sigma bars
    assert abs(m.mean - mean_cf) < 5 * std_cf / np.sqrt(n)
    assert abs(m.std / std_cf - 1.0) < 5 / np.sqrt(2 * n) + 1e-4
    # quantiles vs the oracle law (histogram resolution ~ bin width)
    qs = (0.01, 0.05, 0.5, 0.95, 0.99)
    oq = analytic.final_value_quantiles(
        float(GAUSS.mean_pct), float(GAUSS.std_pct), t, 1000.0, qs
    )
    sq = np.array([res.quantiles(qs)[q] for q in qs])
    np.testing.assert_allclose(sq, oq, rtol=5e-3)
    # count-below is an exact CDF evaluation of the same law
    values, cdf = analytic.final_value_distribution(
        float(GAUSS.mean_pct), float(GAUSS.std_pct), t, 1000.0
    )
    p_below = float(np.interp(np.log(3000.0), np.log(values), cdf))
    se = np.sqrt(p_below * (1 - p_below) / n)
    assert abs(m.count_below / n - p_below) < 5 * se + 1e-6


def test_law_historical_matches_bootstrap_law():
    h = smmc.HistoricalBootstrap.from_csv()
    n, t = 1 << 20, 240
    res = smmc.simulate_stats(h, n, t, seed=7, options=LAW)
    values, cdf = analytic.bootstrap_final_value_distribution(
        np.asarray(h.returns_pct, np.float64), t, 1000.0
    )
    pmf = np.diff(np.concatenate([[0.0], cdf]))
    mean_o = float(np.sum(pmf * values))
    std_o = float(np.sqrt(np.sum(pmf * values**2) - mean_o**2))
    assert abs(res.moments.mean - mean_o) < 5 * std_o / np.sqrt(n)
    qs = (0.05, 0.5, 0.95)
    oq = analytic.quantiles_from_cdf(values, cdf, qs)
    sq = np.array([res.quantiles(qs)[q] for q in qs])
    np.testing.assert_allclose(sq, oq, rtol=5e-3)


def test_law_strategy_finals_match_month_loop():
    """Multiplicative strategy via the terminal law vs the month-loop
    engine: same law, independent draws — agree within MC bars."""
    n, t = 1 << 19, 240
    strat = FixedPercentWithdrawal(0.25)
    nw = EngineOptions(terminal_law=True, track_withdrawn=False)
    a = smmc.simulate_stats(GAUSS, n, t, seed=1, strategy=strat,
                            options=nw)
    b = smmc.simulate_stats(GAUSS, n, t, seed=2, strategy=strat,
                            options=EngineOptions(track_withdrawn=False))
    se = a.moments.std / np.sqrt(n)
    assert abs(a.moments.mean - b.moments.mean) < 6 * se
    assert abs(a.moments.std / b.moments.std - 1.0) < 0.02
    assert a.moments.total_withdrawn == 0.0


def test_law_chunk_and_mesh_invariance(mesh8):
    """Same contract as the month-loop engines: per-path finals identical
    across chunk sizes; sharded stats identical to single-device."""
    n, t = 3 * eng.KEY_TILE + 777, 120
    fa = smmc.simulate_final_values(
        GAUSS, n, t, seed=5,
        options=EngineOptions(terminal_law=True,
                              chunk_paths=eng.KEY_TILE))
    fb = smmc.simulate_final_values(
        GAUSS, n, t, seed=5,
        options=EngineOptions(terminal_law=True,
                              chunk_paths=4 * eng.KEY_TILE))
    np.testing.assert_array_equal(fa, fb)
    r1 = smmc.simulate_stats(GAUSS, n, t, seed=5, options=LAW)
    r2 = smmc.simulate_stats(GAUSS, n, t, seed=5, options=LAW, mesh=mesh8)
    # identical SAMPLE (histogram/extrema exact); moment sums reassociate
    # across the psum merge (float32 partials) — same contract as the
    # month-loop engines (tests/test_sharding.py)
    assert r1.moments.mean == pytest.approx(r2.moments.mean, rel=1e-9)
    assert r1.moments.min == r2.moments.min
    assert r1.moments.max == r2.moments.max
    np.testing.assert_array_equal(r1.histogram_counts,
                                  r2.histogram_counts)


def test_law_rejections():
    with pytest.raises(ValueError, match="track_withdrawn"):
        smmc.simulate_stats(GAUSS, 8192, 12,
                            strategy=FixedPercentWithdrawal(0.25),
                            options=LAW)
    with pytest.raises(ValueError, match="multiplicative"):
        smmc.simulate_stats(GAUSS, 8192, 12,
                            strategy=FixedAmountWithdrawal(amount=1.0),
                            options=EngineOptions(terminal_law=True,
                                                  track_withdrawn=False))
    with pytest.raises(ValueError, match="counter-rng"):
        smmc.simulate_stats(
            smmc.SobolGaussianReturns.create(n_periods=12), 8192, 12,
            options=LAW)
    with pytest.raises(ValueError, match="FINAL"):
        smmc.simulate_bands(GAUSS, 8192, 12, options=LAW)


def test_law_checkpoint_resume(tmp_path):
    """Law runs checkpoint/resume like any other engine config, and the
    fingerprint separates law from month-loop streams."""
    ck = str(tmp_path / "law.npz")
    calls = []

    class Stop(Exception):
        pass

    def interrupt(done, total):
        calls.append(done)
        if len(calls) == 2:
            raise Stop()

    opts = EngineOptions(terminal_law=True, chunk_paths=eng.KEY_TILE)
    with pytest.raises(Stop):
        smmc.simulate_stats(GAUSS, 4 * eng.KEY_TILE, 60, seed=9,
                            options=opts, checkpoint_path=ck,
                            progress=interrupt)
    resumed = smmc.simulate_stats(GAUSS, 4 * eng.KEY_TILE, 60, seed=9,
                                  options=opts, checkpoint_path=ck)
    fresh = smmc.simulate_stats(GAUSS, 4 * eng.KEY_TILE, 60, seed=9,
                                options=opts)
    assert resumed.moments.mean == pytest.approx(fresh.moments.mean,
                                                 rel=1e-12)
    np.testing.assert_array_equal(resumed.histogram_counts,
                                  fresh.histogram_counts)
    # a month-loop run must REFUSE the law checkpoint loudly: the
    # fingerprint's effective-sampler tag separates the streams
    with pytest.raises(ValueError, match="different run"):
        smmc.simulate_stats(
            GAUSS, 4 * eng.KEY_TILE, 60, seed=9,
            options=EngineOptions(chunk_paths=eng.KEY_TILE),
            checkpoint_path=ck)


# ---------------------------------------------------------------------------
# Pallas kernel composition (TPU-semantics interpreter; zero-bit PRNG
# stub -> constant draws. Statistics on hardware:
# tests/test_tpu_only.py::test_terminal_law_parity).
# ---------------------------------------------------------------------------


def test_law_pallas_composition():
    opts = EngineOptions(terminal_law=True, backend="pallas",
                         chunk_paths=8192)
    n = 2 * 8192 + 100
    r = smmc.simulate_stats(GAUSS, n, 360, target_amount=2000.0,
                            options=opts)
    m = r.moments
    assert m.n == n
    assert np.isfinite(m.mean) and m.mean > 0
    assert r.histogram_counts.sum() == n
    # the zero-bit stub draws u = 2^-24 everywhere -> every final equals
    # the law's z(2^-24) quantile; min == max pins the mapping
    fv = smmc.simulate_final_values(GAUSS, 8192, 360, options=opts)
    assert fv.min() == fv.max()
    fit = tlaw.fit_terminal_law(GAUSS, smmc.NoWithdrawal(), 360, 1000.0)
    u = np.float32(2.0**-24)
    z = np.sqrt(2.0) * _erfinv_np(2.0 * u - 1.0)
    want = fit.scale * np.exp(float(tlaw.clenshaw_f32(
        fit.coefs, np.float32(z / tlaw.LAW_ZMAX))))
    assert abs(fv[0] / want - 1.0) < 1e-4

    # stats-only (histogram=False) composes too
    r2 = smmc.simulate_stats(GAUSS, 8192, 360, options=EngineOptions(
        terminal_law=True, backend="pallas", chunk_paths=8192,
        histogram=False))
    assert np.isfinite(r2.moments.mean)


def _erfinv_np(x):
    """Float32 replica of ops/pallas_engine._erfinv_poly for the stub
    cross-check above (Giles 2010 single-precision branch)."""
    import jax.numpy as jnp

    from stock_market_monte_carlo_tpu.ops.pallas_engine import (
        _erfinv_poly,
    )

    return float(_erfinv_poly(jnp.float32(x)))


def test_law_statsonly_kernel_matches_finals_kernel():
    """The finals-free grouped law kernel (pallas_engine.
    _build_law_stats_kernel) must reproduce the finals kernel's stats and
    histogram from the SAME per-tile streams. Under the CPU interpreter
    the PRNG stub makes every draw identical, which still pins the
    grouped seeding order, ragged masking, group/grid accumulation and
    the constant-index-map histogram block against the per-tile
    reference; hardware runs the same identity at full entropy
    (tests/test_tpu_only.py::test_law_statsonly_matches_finals_kernel)."""
    import jax
    import jax.numpy as jnp

    from stock_market_monte_carlo_tpu.ops import pallas_engine as pe
    from stock_market_monte_carlo_tpu.ops import reductions as red

    fit = tlaw.fit_terminal_law(GAUSS, smmc.NoWithdrawal(), 360, 1000.0)
    law_op = jnp.asarray(fit.operand())
    spec = red.HistogramSpec(lo=10.0, hi=1e6, n_bins=4094)
    key = jax.random.key(9)
    kw = dict(n_periods=360, chunk_shape_b=4 * pe.TILE_PATHS, spec=spec,
              sampler="law")
    # ragged: last 1000 paths of the chunk are masked padding
    valid = 4 * pe.TILE_PATHS - 1000
    a = pe.pallas_chunk_stats(
        GAUSS, smmc.NoWithdrawal(), key, law_op, jnp.float32(1000.0),
        jnp.uint32(0), valid, jnp.float32(2000.0), keep_finals=False,
        **kw)
    b = pe.pallas_chunk_stats(
        GAUSS, smmc.NoWithdrawal(), key, law_op, jnp.float32(1000.0),
        jnp.uint32(0), valid, jnp.float32(2000.0), keep_finals=True,
        **kw)
    sa, ha = np.asarray(a[0], np.float64), np.asarray(a[1])
    sb, hb = np.asarray(b[0], np.float64), np.asarray(b[1])
    # histogram counts are integers accumulated exactly in both paths
    np.testing.assert_array_equal(ha, hb)
    assert ha.sum() == valid
    # moment rows: identical addends, different (tree) association —
    # the zero-bit stub makes all 31768 addends equal, the worst case
    # for f32 reassociation drift (measured ~1e-6 relative)
    np.testing.assert_allclose(sa, sb, rtol=5e-6, atol=1e-9)
    # min/max/count rows are order-independent: exact
    np.testing.assert_array_equal(sa[5:8], sb[5:8])

    # no-histogram variant composes and agrees on the moment rows
    c = pe.pallas_chunk_stats(
        GAUSS, smmc.NoWithdrawal(), key, law_op, jnp.float32(1000.0),
        jnp.uint32(0), valid, jnp.float32(2000.0), keep_finals=False,
        with_hist=False, **kw)
    np.testing.assert_array_equal(np.asarray(c[0]), np.asarray(a[0]))
    assert np.asarray(c[1]).sum() == 0.0


def test_law_onehot_i8_matches_bf16_control():
    """The int8-indicator MXU histogram (SMMC_LAW_OH default) must count
    identically to the original bf16/f32 trace: one-hots are exact in
    both dtypes and per-cell counts <= 2^24 make the int32 accumulate +
    f32 cast lossless (experiments/exp_law_oh.py measures the speed
    side on hardware)."""
    import jax
    import jax.numpy as jnp

    from stock_market_monte_carlo_tpu.ops import pallas_engine as pe
    from stock_market_monte_carlo_tpu.ops import reductions as red

    fit = tlaw.fit_terminal_law(GAUSS, smmc.NoWithdrawal(), 120, 1000.0)
    law_op = jnp.asarray(fit.operand())
    spec = red.HistogramSpec(lo=10.0, hi=1e6, n_bins=4094)
    key = jax.random.key(11)
    kw = dict(n_periods=120, chunk_shape_b=4 * pe.TILE_PATHS, spec=spec,
              sampler="law", keep_finals=False)
    args = (GAUSS, smmc.NoWithdrawal(), key, law_op, jnp.float32(1000.0),
            jnp.uint32(0), 4 * pe.TILE_PATHS - 777, jnp.float32(2000.0))

    # the dtype pair is an explicit builder argument (law_oh_i8), so the
    # two traces are requested directly — no module-global monkeypatching
    a = pe.pallas_chunk_stats(*args, law_oh_i8=True, **kw)
    sa, ha = np.asarray(a[0]), np.asarray(a[1])
    b = pe.pallas_chunk_stats(*args, law_oh_i8=False, **kw)
    sb, hb = np.asarray(b[0]), np.asarray(b[1])

    np.testing.assert_array_equal(ha, hb)
    assert ha.sum() == 4 * pe.TILE_PATHS - 777
    # moment rows don't touch the histogram path at all: bit-identical
    np.testing.assert_array_equal(sa, sb)


def test_law_group_divisors():
    from stock_market_monte_carlo_tpu.ops import pallas_engine as pe
    from stock_market_monte_carlo_tpu.ops.pallas_engine import _law_group

    assert _law_group(1) == 1
    assert _law_group(3) == 1
    assert _law_group(6) == 2
    assert _law_group(16) == min(16, pe.LAW_GROUP)
    assert _law_group(2048) == pe.LAW_GROUP
    assert _law_group(12) == 4


def test_law_group_size_invariance():
    """The grid group size (SMMC_LAW_GROUP) only re-associates the f32
    moment accumulation — streams are seeded per GLOBAL tile, so the
    histogram / min / max / count-below must be bit-identical and the
    moment rows equal to f32-reassociation tolerance across group
    sizes. Guards the env knob (and any future LAW_GROUP retune)
    against accidentally entangling group position with seeding.
    Runs under the TPU-semantics interpreter (hardware-PRNG kernel:
    streams are the documented all-zeros stub off-TPU), so this checks
    grouping/accumulation composition, not statistics."""
    import jax
    import jax.numpy as jnp

    from stock_market_monte_carlo_tpu.ops import pallas_engine as pe
    from stock_market_monte_carlo_tpu.ops import reductions as red

    fit = tlaw.fit_terminal_law(GAUSS, smmc.NoWithdrawal(), 60, 1000.0)
    law_op = jnp.asarray(fit.operand())
    spec = red.HistogramSpec(lo=10.0, hi=1e6, n_bins=4094)
    ntiles = 8
    valid = ntiles * pe.TILE_PATHS - 321
    tile0 = jax.lax.bitcast_convert_type(jnp.uint32(0), jnp.int32)
    iscal = jnp.stack([jnp.int32(12345), tile0, jnp.int32(valid),
                       jnp.int32(spec.n_bins + 2)] + [jnp.int32(0)] * 4)
    fscal = jnp.stack([
        jnp.float32(1000.0), jnp.float32(2000.0),
        jnp.float32(spec.log_lo), jnp.float32(1.0 / spec.width),
        jnp.float32(0.0), jnp.float32(1.0 / tlaw.LAW_ZMAX),
        jnp.float32(0), jnp.float32(0),
    ])
    law2d = law_op.reshape(-1, 1)

    outs = {}
    for group in (1, 2, 8):
        call = pe._build_law_stats_call(
            ntiles // group, group, pe.interpret_mode("gaussian"), True)
        p, h = call(iscal, fscal, law2d)
        stats = np.asarray(
            p.reshape(-1, pe.N_PARTIAL_ROWS, 128).sum(axis=(0, 2)),
            np.float64)
        outs[group] = (stats, np.asarray(h))

    base_s, base_h = outs[1]
    for group in (2, 8):
        s, h = outs[group]
        np.testing.assert_array_equal(h, base_h)
        np.testing.assert_allclose(s[:4], base_s[:4], rtol=5e-6)
        np.testing.assert_array_equal(s[6:], base_s[6:])
    assert base_h.sum() == valid
