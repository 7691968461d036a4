"""Data-fetch parsing against recorded response shapes (no network).

The transform half of the S&P500 fetcher (ref: python/get_data.py:33-68)
is exercised on DataFrames shaped exactly like yfinance responses — both
the legacy flat-column form and the modern ticker-level MultiIndex form
that once broke the ``Date,returns`` CSV schema — and its output is
round-tripped through the loader the engines consume.
"""

import numpy as np
import pytest

pd = pytest.importorskip("pandas")

from stock_market_monte_carlo_tpu.data.fetch import (  # noqa: E402
    monthly_returns_from_daily,
)
from stock_market_monte_carlo_tpu.data.loader import (  # noqa: E402
    read_historical_returns,
)


def _daily_frame(multiindex: bool):
    """A ^GSPC-shaped daily frame: 3 months of business days, Adj Close
    growing 1% per month deterministically."""
    idx = pd.bdate_range("2021-01-01", "2021-03-31", name="Date")
    month_no = (idx.year - 2021) * 12 + idx.month - 1
    adj = 100.0 * 1.01 ** month_no
    cols = ["Open", "High", "Low", "Close", "Adj Close", "Volume"]
    data = {c: adj for c in cols[:-1]} | {"Volume": np.ones(len(idx))}
    df = pd.DataFrame(data, index=idx)
    df["Close"] = adj * 2.0  # wrong values: must prefer 'Adj Close'
    if multiindex:
        df.columns = pd.MultiIndex.from_product(
            [df.columns, ["^GSPC"]], names=["Price", "Ticker"]
        )
    return df


@pytest.mark.parametrize("multiindex", [False, True])
def test_monthly_returns_schema_and_values(tmp_path, multiindex):
    daily = _daily_frame(multiindex)
    df_daily, df_monthly, returns = monthly_returns_from_daily(daily)
    # schema: single 'returns' column, monthly PeriodIndex named Date,
    # leading NaN row (ref CSV: Date,returns with empty first value)
    assert list(returns.columns) == ["returns"]
    assert returns.index.name == "Date"
    assert np.isnan(returns.iloc[0, 0])
    # deterministic 1%-per-month input -> 1.0 returns
    np.testing.assert_allclose(returns.iloc[1:, 0], 1.0, rtol=1e-9)
    # 'Adj Close' preferred over the poisoned 'Close'
    assert float(df_daily.iloc[0, 0]) == pytest.approx(100.0)

    # the CSV the fetcher writes round-trips through the engine loader
    out = tmp_path / "sp.csv"
    returns.to_csv(out)
    first = out.read_text().splitlines()[:2]
    assert first[0] == "Date,returns"
    assert first[1].endswith(",")           # the leading NaN row
    table = read_historical_returns(str(out))
    assert table.shape == (2,)
    np.testing.assert_allclose(table, 1.0, rtol=1e-6)


def test_close_fallback_when_no_adj_close():
    daily = _daily_frame(False).drop(columns=["Adj Close"])
    _, _, returns = monthly_returns_from_daily(daily)
    np.testing.assert_allclose(returns.iloc[1:, 0], 1.0, rtol=1e-9)
