"""Interactive window (viz/gui.InteractiveWindow) — VERDICT r4 item 5.

Parity target: the reference's ImGui window with the target-amount
slider whose change recomputes P(final < target) from retained results
(/root/reference/examples/visualize_returns_cpu.cpp:296-434, recompute
:340-356). Headless-testable by design: on Agg, ``slider.set_val`` fires
the same ``on_changed`` callback a mouse drag does, so these tests
drive a real slider change and assert the recomputed statistics against
the histogram oracle.
"""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

import stock_market_monte_carlo_tpu as smmc
from stock_market_monte_carlo_tpu.ops.reductions import (
    prob_below_from_histogram,
)
from stock_market_monte_carlo_tpu.viz.gui import InteractiveWindow

N, T = 30_000, 36


@pytest.fixture(scope="module")
def window_after_run():
    model = smmc.GaussianReturns()
    win = InteractiveWindow(model, T, target=1000.0, n_curves=7)
    res = smmc.run(model, N, T, seed=3, target_amount=1000.0, stream=win)
    yield win, res
    win.close()


def test_window_builds_and_streams(window_after_run):
    win, res = window_after_run
    assert win.frames >= 1            # at least the final stream redraw
    assert win.last_update is not None
    assert win.last_update.done == N
    assert win.curves_done == 7       # the capped fan was drawn
    assert win.slider is not None


def test_slider_change_recomputes_prob_below(window_after_run):
    """Drive the slider programmatically; the recomputed P(below) must
    equal the histogram oracle at the NEW target, and the displayed
    text must follow."""
    win, res = window_after_run
    u = win.last_update
    for new_target in (500.0, 6022.0, 9000.0):
        win.slider.set_val(new_target)     # fires on_changed == a drag
        # slider quantizes to valstep; compare at the effective value
        eff = win.target
        assert eff == pytest.approx(new_target, abs=win.slider.valstep)
        want = prob_below_from_histogram(u.spec, u.hist, eff)
        assert win.prob_below_target() == pytest.approx(want, abs=0.0)
        txt = win._prob_text.get_text()
        assert f"{100.0 * want:.4f}%" in txt
    # the fan's target line moved with the slider
    assert win._target_line.get_ydata()[0] == win.target


def test_slider_matches_result_prob(window_after_run):
    """At the run's own target the slider recompute equals the engine's
    count_below-based probability (same histogram, same CDF semantics)."""
    win, res = window_after_run
    win.slider.set_val(1000.0)
    p_gui = win.prob_below_target()
    p_res = res.prob_below_amount(win.target)
    assert p_gui == pytest.approx(p_res, abs=1e-12)


def test_gui_cli_flag_headless(tmp_path, capsys):
    """`smmc visualize --gui` end-to-end on Agg: builds the window,
    streams the run through it, never blocks."""
    from stock_market_monte_carlo_tpu.viz.live import live_visualize

    res = live_visualize(
        n_months=12, n_simulations=8192, model_kind="gaussian",
        target=900.0, seed=1, n_curves=5,
        save=str(tmp_path / "fan.png"), live=False, interactive=False,
        gui=True,
    )
    assert res.n_paths == 8192
    out = capsys.readouterr().out
    assert "n_simulations: 8192" in out


def test_demo_window_widgets_drive_recompute():
    """`smmc demo-gui` counterpart of the reference's example_imgui
    stock demo: every widget kind fires its callback programmatically
    and demonstrably changes the live mini-simulation."""
    from stock_market_monte_carlo_tpu.viz.demo import DemoWindow

    win = DemoWindow(seed=1)
    try:
        m0 = win.result.mean
        t0 = win.result.n_periods
        win.slider.set_val(120)            # Slider
        assert win.result.n_periods == 120 != t0
        m1 = win.result.mean
        assert m1 != m0
        win.button.ax.figure.canvas.draw_idle()
        win._on_click(None)                # Button (same entry as a click)
        assert win.clicks == 1 and win.seed == 2
        win.check.set_active(0)            # CheckButtons -> histogram off
        assert win.show_hist is False
        win.radio.set_active(1)            # RadioButtons -> historical
        assert win.model_kind == "historical"
        assert win.result.n_paths == DemoWindow.N_PATHS
    finally:
        win.close()
