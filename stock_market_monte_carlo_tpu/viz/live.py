"""Live visualization — the GUI-replacement surface.

The reference couples a simulation thread to a DearImGui/ImPlot render loop
polling an atomic counter (examples/visualize_returns_cpu.cpp:136-457, and
the two-thread stats+viz variant in visualize_returns_cpu_v2.cpp:184-202).
Here the equivalent is:

- the big statistics run streams device chunks with a live terminal
  progress line (count, rate, ETA — the GUI's progress/FPS text block);
- a capped trajectory run (the reference's max_n_visualisation trick)
  renders a fan chart with target line and final-value histogram to PNG;
- the stats block prints quartiles/mean/std/count-below exactly like the
  GUI's text panel (visualize_returns_cpu.cpp:395-420).

Because count-below and quantiles come from the on-device histogram, any
target amount can be re-queried instantly after the run — the slider
without the window.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def live_visualize(n_months: int, n_simulations: int,
                   model_kind: str = "historical", target: float = 1000.0,
                   seed: int = 0, n_curves: int = 100,
                   save: Optional[str] = None,
                   show: bool = False,
                   overlay_normal: bool = False):
    """``overlay_normal`` adds the CLT normal-pdf curve over the exact
    final-value histogram — what the reference's
    visualize_returns_distribution_gpu_reduceBlock GUI attempted from block
    stats (its header admits "histogram/statistics aren't correct",
    examples/...cpp:183-186); here both the histogram and the overlay are
    exact on-device statistics."""
    import stock_market_monte_carlo_tpu as smmc
    from stock_market_monte_carlo_tpu.engine.progress import TerminalProgress
    from stock_market_monte_carlo_tpu.viz.plots import fan_chart

    if model_kind == "historical":
        model = smmc.HistoricalBootstrap.from_csv()
    else:
        model = smmc.GaussianReturns()

    res = smmc.run(
        model, n_simulations, n_months, initial_capital=1000.0, seed=seed,
        target_amount=target, progress=TerminalProgress(),
        keep_trajectories=min(n_curves, n_simulations),
    )
    print(res.summary())

    # trim the histogram to its occupied range (the spec brackets +/-12
    # sigma; realized mass covers a small slice of that), then decimate
    counts = res.histogram_counts[1:-1]  # interior bins
    edges = res.histogram_spec.edges()
    nz = np.nonzero(counts)[0]
    lo_b, hi_b = (int(nz[0]), int(nz[-1]) + 1) if nz.size else (0, 1)
    counts = counts[lo_b:hi_b]
    edges = edges[lo_b:hi_b + 1]
    k = max(1, len(counts) // 128)
    counts_d = counts[: len(counts) // k * k].reshape(-1, k).sum(axis=1)
    edges_d = edges[:: k][: len(counts_d) + 1]
    normal_curve = None
    if overlay_normal:
        from stock_market_monte_carlo_tpu.ops.normal import normal_pdf

        centers = 0.5 * (edges_d[:-1] + edges_d[1:])
        widths = np.diff(edges_d)
        pdf = np.asarray(normal_pdf(centers, res.mean, res.std))
        normal_curve = (centers, pdf * res.n_paths * widths)

    save = save or "visualize_returns.png"
    fan_chart(
        np.asarray(res.trajectories), target=target,
        histogram=(edges_d, counts_d), save=save,
        title=(f"{model_kind} MC: {n_simulations} sims x {n_months} months "
               f"(drawing {res.trajectories.shape[0]})"),
        show=show, normal_curve=normal_curve,
    )
    return res
