"""Generator for the vendored synthetic S&P500-like monthly-returns CSV.

The reference's real data file (data/SP500_monthly_returns.csv, produced by
python/get_data.py from Yahoo Finance, 1928-01..2021-12, ~1127 usable rows)
is gitignored upstream and unobtainable here (no network egress). This module
deterministically generates a stand-in with the same schema, the same row
count, and S&P500-like moments (monthly mean ~0.54%, std ~4.8%, mild negative
skew and fat tails via a two-regime mixture), so tests and demos are hermetic.

Run ``python -m stock_market_monte_carlo_tpu.data._synthetic`` to regenerate.
"""

from __future__ import annotations

import numpy as np

# 1928-01 .. 2021-12 monthly, matching get_data.py's date range: 94y * 12mo
# price points whose pct_change leaves N_MONTHS - 1 = 1127 usable returns —
# the reference's row count (and the shmem table size hard-coded in its
# kernels, src/simulations.cu:123).
N_MONTHS = 94 * 12
N_RETURNS = N_MONTHS - 1
SEED = 20260816


def synthetic_monthly_returns(n_months: int = N_RETURNS,
                              seed: int = SEED) -> np.ndarray:
    """Percent monthly returns with S&P500-like moments. Deterministic."""
    rng = np.random.default_rng(seed)
    # Two-regime mixture: calm bull regime + volatile bear regime, with
    # sticky regime persistence — gives fat tails and negative skew like the
    # real series without copying any real data.
    calm = rng.normal(0.95, 3.6, size=n_months)
    crisis = rng.normal(-1.5, 9.5, size=n_months)
    stay = rng.uniform(size=n_months)
    state = np.zeros(n_months, dtype=bool)
    for t in range(1, n_months):
        # ~15% stationary crisis occupancy (entry 3%, exit 17%)
        p_crisis = 0.83 if state[t - 1] else 0.03
        state[t] = stay[t] < p_crisis
    r = np.where(state, crisis, calm)
    return r.astype(np.float64)


def write_csv(path: str) -> None:
    r = synthetic_monthly_returns()
    dates = []
    y, m = 1928, 1
    for _ in range(N_MONTHS):  # first row carries the pct_change NaN
        dates.append(f"{y:04d}-{m:02d}")
        m += 1
        if m == 13:
            m, y = 1, y + 1
    with open(path, "w") as f:
        f.write("Date,returns\n")
        f.write(f"{dates[0]},\n")  # leading NaN row (empty field)
        for d, v in zip(dates[1:], r):
            f.write(f"{d},{v:.16g}\n")


if __name__ == "__main__":
    from stock_market_monte_carlo_tpu.data.loader import SYNTHETIC_CSV

    write_csv(SYNTHETIC_CSV)
    print(f"wrote {SYNTHETIC_CSV}")
