"""Analytic (non-Monte-Carlo) reference distribution for the Gaussian
market — the independent float64 oracle the 1e-3 statistical-parity bar is
measured against.

The final value is V_T = V0 * prod_t (1 + r_t/100) with r_t iid
N(mean_pct, std_pct). log V_T is a T-fold convolution of the single-month
log-growth density

    y = log(a + b z),  z ~ N(0,1),  a = 1 + mean/100, b = std/100
    p(y) = phi((e^y - a)/b) * e^y / b

which this module evaluates exactly on a fine grid and convolves T times
via FFT (characteristic-function power) in float64. Quantiles/moments of
V_T follow to ~1e-6 relative — far below the 1e-3 bar — with no Monte
Carlo noise, so engine statistics can be asserted against a genuinely
independent CPU-reference computation (BASELINE.md north-star tolerance;
the reference itself has no such oracle and eyeballs benchmark printouts,
SURVEY.md section 4).

Validity domain: a/b large enough that P(1 + r/100 <= 0) is negligible
(a/b > 8 says depletion probability < 1e-15; the default market has
a/b ~ 120), so log-growth is well-defined.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence, Tuple

import numpy as np


def log_growth_pdf_grid(mean_pct: float, std_pct: float,
                        n_grid: int = 1 << 14,
                        z_span: float = 14.0):
    """(y, pdf, dy): single-month log-growth density on a uniform y-grid
    covering +/- z_span sigmas of the underlying normal."""
    a = 1.0 + mean_pct / 100.0
    b = std_pct / 100.0
    if a - z_span * b <= 0:
        raise ValueError(
            "log-growth undefined: P(growth <= 0) is non-negligible for "
            f"mean={mean_pct}, std={std_pct}"
        )
    y_lo = np.log(a - z_span * b)
    y_hi = np.log(a + z_span * b)
    y = np.linspace(y_lo, y_hi, n_grid)
    dy = y[1] - y[0]
    ey = np.exp(y)
    z = (ey - a) / b
    pdf = np.exp(-0.5 * z * z) / np.sqrt(2 * np.pi) * ey / b
    pdf /= pdf.sum() * dy
    return y, pdf, dy


@lru_cache(maxsize=16)
def final_value_distribution(mean_pct: float, std_pct: float,
                             n_periods: int, initial_capital: float,
                             n_grid: int = 1 << 14):
    """(values, cdf): exact distribution of V_T on a log grid.

    The T-fold convolution runs as ifft(fft(p)^T) on a grid padded so the
    full T-month support fits without wraparound. Results are cached per
    parameter tuple (the grid-convergence test shows 2^14 vs 2^15 grids
    agree to <3e-5, far below the 1e-3 bar this oracle serves).
    """
    y, pdf, dy = log_growth_pdf_grid(mean_pct, std_pct, n_grid)
    t = n_periods
    # support of the T-fold sum: T * [y_lo, y_hi]; center it
    width_1 = y[-1] - y[0]
    total_width = width_1 * t
    n_total = int(2 ** np.ceil(np.log2(total_width / dy + n_grid)))
    p = np.zeros(n_total)
    p[:n_grid] = pdf * dy  # probability mass per cell
    chf = np.fft.rfft(p)
    # characteristic-function power; magnitudes stay <= 1 so this is stable
    conv = np.fft.irfft(chf ** t, n=n_total)
    conv = np.maximum(conv, 0.0)
    conv /= conv.sum()
    # grid of the sum: starts at t*y[0], spacing dy
    log_v = np.log(initial_capital) + t * y[0] + dy * np.arange(n_total)
    cdf = np.cumsum(conv)
    return np.exp(log_v), cdf


def final_value_quantiles(mean_pct: float, std_pct: float, n_periods: int,
                          initial_capital: float,
                          qs: Sequence[float]) -> np.ndarray:
    values, cdf = final_value_distribution(
        mean_pct, std_pct, n_periods, initial_capital
    )
    out = np.empty(len(qs))
    logv = np.log(values)
    for i, q in enumerate(qs):
        j = int(np.searchsorted(cdf, q))
        j = min(max(j, 1), len(cdf) - 1)
        c0, c1 = cdf[j - 1], cdf[j]
        frac = (q - c0) / (c1 - c0) if c1 > c0 else 0.5
        out[i] = np.exp(logv[j - 1] + frac * (logv[j] - logv[j - 1]))
    return out


def final_value_moments(mean_pct: float, std_pct: float, n_periods: int,
                        initial_capital: float) -> Tuple[float, float]:
    """(mean, std) of V_T, exact in closed form (for cross-checking the
    FFT grid): E[V] = V0 m1^T, E[V^2] = V0^2 (m1^2 + s^2)^T."""
    m1 = 1.0 + mean_pct / 100.0
    s = std_pct / 100.0
    mean = initial_capital * m1 ** n_periods
    second = initial_capital**2 * (m1 * m1 + s * s) ** n_periods
    return mean, float(np.sqrt(second - mean * mean))
