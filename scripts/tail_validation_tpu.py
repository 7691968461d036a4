"""Extreme-tail validation on hardware: 1B-path CLT vs ICDF vs oracle.

Runs the flagship Gaussian config (360 months) at 1e9 paths with BOTH
samplers and compares deep-tail histogram quantiles and P(final < x)
against the deterministic laws (ops/analytic.py): the exact-normal oracle
for ICDF and the exact CLT law for the CLT sampler. 1B paths resolve
p = 1e-5 with ~10k tail hits (rel std err ~1%).

Usage (real TPU, exclusive):  python scripts/tail_validation_tpu.py
Results are appended to the table in RESULTS.md by hand.
"""

import sys
import time

import numpy as np

import jax


def main():
    if jax.default_backend() != "tpu":
        sys.exit("requires the real TPU chip")
    import stock_market_monte_carlo_tpu as smmc
    from stock_market_monte_carlo_tpu.config import EngineOptions
    from stock_market_monte_carlo_tpu.ops import analytic as an

    n, t, v0 = 1_000_000_000, 360, 1000.0
    mean, std = 0.5, 10 / 12
    ps = [1e-5, 1e-4, 1e-3, 0.5, 1 - 1e-3, 1 - 1e-4, 1 - 1e-5]

    print("computing deterministic laws (CF + FFT)...")
    vn, cn = an.clt_final_value_distribution(mean, std, t, v0,
                                             law="normal")
    vc, cc = an.clt_final_value_distribution(mean, std, t, v0)
    q_laws = {
        "icdf": an.quantiles_from_cdf(vn, cn, ps),
        "clt": an.quantiles_from_cdf(vc, cc, ps),
    }
    # target for count-below: the normal law's 1e-4 quantile
    x_tail = float(q_laws["icdf"][1])

    for sampler in ("clt", "icdf"):
        t0 = time.time()
        res = smmc.simulate_stats(
            smmc.GaussianReturns(mean_pct=mean, std_pct=std), n, t,
            initial_capital=v0, seed=20260817,
            target_amount=x_tail,
            options=EngineOptions(gaussian_sampler=sampler,
                                  chunk_paths=2**24),
        )
        el = time.time() - t0
        q_mc = res.quantiles(ps)
        want = q_laws[sampler]
        print(f"\n== {sampler}: 1e9x360 in {el:.2f}s "
              f"({n / el / 1e6:.0f}M paths/s) ==")
        se_note = []
        for p_, w in zip(ps, want):
            got = q_mc[p_]
            # quantile standard error ~ sqrt(p(1-p)/n)/pdf; express the
            # observed deviation relative to the law value
            se_note.append(f"p={p_:9.2e} mc={got:10.2f} law={w:10.2f} "
                           f"rel={(got / w - 1):+.2e}")
        print("\n".join(se_note))
        p_below = res.count_below / n
        law_vals, law_cdf = (vc, cc) if sampler == "clt" else (vn, cn)
        p_law = float(np.interp(x_tail, law_vals, law_cdf))
        print(f"P(final < {x_tail:.1f}): mc={p_below:.3e} "
              f"law={p_law:.3e} ratio={p_below / p_law:.4f} "
              f"(binomial rel se {np.sqrt((1 - p_law) / (p_law * n)):.1%})")


if __name__ == "__main__":
    main()
