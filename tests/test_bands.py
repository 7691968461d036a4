"""Device-side trajectory decimation (engine/bands.py): percentile bands
with O(T * n_bins) host transfer — the reference's keep-data capability
(src/simulations.cpp:139-202) without the O(N*T) memory."""

import numpy as np

import stock_market_monte_carlo_tpu as smmc
from stock_market_monte_carlo_tpu.config import EngineOptions
from stock_market_monte_carlo_tpu.engine.engine import KEY_TILE
from stock_market_monte_carlo_tpu.models.strategies import (
    FixedAmountWithdrawal,
)

GAUSS = smmc.GaussianReturns(mean_pct=0.5, std_pct=10.0 / 12)


def test_bands_match_exact_quantiles():
    """Band values must agree with exact per-month quantiles computed from
    fully materialized trajectories (to within a z-bin width)."""
    n, t = 4 * KEY_TILE, 48
    bands = smmc.simulate_bands(GAUSS, n, t, seed=7,
                                quantile_levels=(0.05, 0.5, 0.95))
    traj = np.asarray(smmc.simulate_paths(GAUSS, n, t, seed=7))
    for qi, q in enumerate((0.05, 0.5, 0.95)):
        exact = np.quantile(traj, q, axis=0)
        got = bands.values[qi]
        np.testing.assert_allclose(got[1:], exact[1:], rtol=5e-3)
    # month 0 is exactly the initial capital
    assert np.allclose(bands.values[:, 0], 1000.0, rtol=1e-3)


def test_bands_mass_and_shapes():
    n, t = KEY_TILE + 777, 12   # ragged
    bands = smmc.simulate_bands(GAUSS, n, t, seed=1, sample_paths=5)
    assert bands.values.shape == (5, t + 1)
    assert bands.sample_paths.shape == (5, t + 1)
    assert bands.month_hist.shape[0] == t + 1
    # every month's histogram holds exactly n paths
    np.testing.assert_array_equal(bands.month_hist.sum(axis=1),
                                  np.full(t + 1, n))


def test_bands_chunk_invariance():
    n, t = 3 * KEY_TILE, 24
    a = smmc.simulate_bands(GAUSS, n, t, seed=5,
                            options=EngineOptions(chunk_paths=KEY_TILE))
    b = smmc.simulate_bands(GAUSS, n, t, seed=5,
                            options=EngineOptions(chunk_paths=4 * KEY_TILE))
    np.testing.assert_array_equal(a.month_hist, b.month_hist)
    np.testing.assert_allclose(a.values, b.values, rtol=1e-12)


def test_bands_with_depleting_withdrawal():
    """Zero-return market with a fixed withdrawal: the median band must
    track the deterministic V0 - t*amount path and hit exactly 0."""
    m = smmc.GaussianReturns(mean_pct=0.0, std_pct=1e-6)
    t = 20
    bands = smmc.simulate_bands(
        m, KEY_TILE, t, initial_capital=100.0,
        strategy=FixedAmountWithdrawal(amount=10.0),
        quantile_levels=(0.5,),
    )
    want = np.maximum(100.0 - 10.0 * np.arange(t + 1), 0.0)
    med = bands.values[0]
    np.testing.assert_allclose(med[:10], want[:10], rtol=2e-2)
    assert np.all(med[11:] == 0.0)   # depleted mass -> exact zero


def test_bands_progress_callback():
    calls = []
    smmc.simulate_bands(
        GAUSS, 2 * KEY_TILE, 6, seed=0,
        options=EngineOptions(chunk_paths=KEY_TILE),
        progress=lambda d, t: calls.append((d, t)),
    )
    assert calls[-1][0] == 2 * KEY_TILE


def test_fused_pallas_bands_composition():
    """The fused Pallas band kernel (ops/pallas_bands.py) through the
    TPU-semantics interpreter: exact per-month mass accounting (every
    month row holds exactly n paths; padding and dead months land in the
    discard cell), ragged chunk, historical model + withdrawal strategy.
    Statistical band parity vs the XLA path runs on hardware
    (tests/test_tpu_only.py::test_pallas_bands_statistical_parity_vs_xla)."""
    from stock_market_monte_carlo_tpu.models.strategies import (
        FixedPercentWithdrawal,
    )

    opts = EngineOptions(backend="pallas", chunk_paths=KEY_TILE)
    h = smmc.HistoricalBootstrap.from_csv()
    n, t = KEY_TILE + 100, 5   # ragged -> masked lanes exercise discard
    b = smmc.simulate_bands(h, n, t, seed=2,
                            strategy=FixedPercentWithdrawal(1.0),
                            options=opts, n_bins=256, sample_paths=0)
    assert b.month_hist.shape == (t + 1, 256 + 2)
    np.testing.assert_array_equal(b.month_hist.sum(axis=1),
                                  np.full(t + 1, n))
    assert np.isfinite(b.values).all()
    # month 0 is the exact v0 point mass
    assert b.month_hist[0].max() == n


def test_fused_pallas_bands_chunk_invariance():
    """Counts must be identical across chunk splits (tile-keyed streams),
    through the Pallas path."""
    h = smmc.HistoricalBootstrap.from_csv()
    n, t = 2 * KEY_TILE, 4
    a = smmc.simulate_bands(
        h, n, t, seed=5, n_bins=256, sample_paths=0,
        options=EngineOptions(backend="pallas", chunk_paths=KEY_TILE),
    )
    b = smmc.simulate_bands(
        h, n, t, seed=5, n_bins=256, sample_paths=0,
        options=EngineOptions(backend="pallas", chunk_paths=2 * KEY_TILE),
    )
    np.testing.assert_array_equal(a.month_hist, b.month_hist)


def test_visualize_bands_cli(tmp_path, monkeypatch):
    from stock_market_monte_carlo_tpu.cli.main import main

    monkeypatch.chdir(tmp_path)
    main(["visualize-bands", "12", "20000", "--model", "gaussian",
          "--target", "1100", "--save", "b.png"])
    assert (tmp_path / "b.png").exists()


def test_bands_sharded_identical_to_single_device(mesh8):
    """Bands over a mesh: per-month histograms psum over ICI; counter
    streams make the counts IDENTICAL to the single-device run (XLA
    backend: full fidelity on the CPU mesh), including a ragged tail."""
    n, t = 2 * KEY_TILE + 777, 18
    a = smmc.simulate_bands(GAUSS, n, t, seed=4, sample_paths=0,
                            options=EngineOptions(chunk_paths=KEY_TILE))
    b = smmc.simulate_bands(GAUSS, n, t, seed=4, sample_paths=0,
                            options=EngineOptions(chunk_paths=KEY_TILE),
                            mesh=mesh8)
    np.testing.assert_array_equal(a.month_hist, b.month_hist)
    np.testing.assert_allclose(a.values, b.values, rtol=1e-12)


def test_bands_sharded_counts_exact_past_f32_range(mesh8):
    """The cross-device count merge must stay exact when one dispatch
    concentrates more than 2^24 paths in a single cell (month 0 puts
    EVERY path at v0). An f32 psum cannot represent the odd total
    2^24 + 7; the int32 merge can."""
    n, t = (1 << 24) + 7, 1
    b = smmc.simulate_bands(GAUSS, n, t, seed=0, sample_paths=0,
                            n_bins=64, mesh=mesh8)
    assert b.month_hist[0].max() == n
    assert b.month_hist.sum(axis=1).tolist() == [n] * (t + 1)


def test_fused_pallas_bands_sharded_composition(mesh8):
    """The fused band kernel under shard_map on the mesh (TPU-semantics
    interpreter off-TPU): mass accounting must hold across devices."""
    from stock_market_monte_carlo_tpu.models.strategies import (
        FixedPercentWithdrawal,
    )

    h = smmc.HistoricalBootstrap.from_csv()
    n, t = 2 * KEY_TILE + 100, 4
    b = smmc.simulate_bands(
        h, n, t, seed=2, strategy=FixedPercentWithdrawal(1.0),
        options=EngineOptions(backend="pallas", chunk_paths=KEY_TILE),
        n_bins=256, sample_paths=0, mesh=mesh8,
    )
    np.testing.assert_array_equal(b.month_hist.sum(axis=1),
                                  np.full(t + 1, n))
