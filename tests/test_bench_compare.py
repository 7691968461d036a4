"""Benchmark comparison analysis: Mann-Whitney U test + relative plots
(the reference workflow's benchmark/tools/compare.py + benchmark_compare.py
capabilities, README.md:87-96)."""

import json
import math

import numpy as np
import pytest

from stock_market_monte_carlo_tpu.bench.compare import (
    compare_files,
    mann_whitney_u,
)


def test_u_test_known_value():
    # classic worked example: clearly separated samples
    xs = [1.0, 2.0, 3.0, 4.0, 5.0]
    ys = [6.0, 7.0, 8.0, 9.0, 10.0]
    u, p = mann_whitney_u(xs, ys)
    assert u == 0.0
    assert p < 0.02


def test_u_test_identical_distributions():
    rng = np.random.default_rng(0)
    xs = list(rng.normal(10, 1, 30))
    u, p = mann_whitney_u(xs, xs)
    assert p > 0.9


def test_u_test_tie_handling():
    u, p = mann_whitney_u([1.0, 1.0, 2.0], [1.0, 2.0, 2.0])
    assert 0.0 <= p <= 1.0
    u2, p2 = mann_whitney_u([3.0] * 5, [3.0] * 5)
    assert p2 == 1.0  # zero variance -> no evidence


def _write(path, name, samples, extra=None):
    entries = [
        {"name": name, "run_type": "iteration", "repetition_index": i,
         "real_time": float(t), "time_unit": "s"}
        for i, t in enumerate(samples)
    ]
    entries.append({
        "name": f"{name}_median", "run_type": "aggregate",
        "aggregate_name": "median",
        "real_time": float(np.median(samples)), "time_unit": "s",
    })
    if extra:
        entries.extend(extra)
    path.write_text(json.dumps({"benchmarks": entries}))


def test_compare_files_runs_u_test(tmp_path, capsys):
    rng = np.random.default_rng(1)
    base = tmp_path / "base.json"
    cont = tmp_path / "cont.json"
    _write(base, "mc/360/1000000", rng.normal(1.0, 0.01, 10))
    _write(cont, "mc/360/1000000", rng.normal(0.5, 0.01, 10))
    rows = compare_files(str(base), str(cont),
                         plot_path=str(tmp_path / "cmp.png"))
    out = capsys.readouterr().out
    assert len(rows) == 1
    name, bt, ct, speedup, p = rows[0]
    assert speedup == pytest.approx(2.0, rel=0.1)
    assert p is not None and p < 0.01
    assert "*" in out and "Mann-Whitney" in out
    assert (tmp_path / "cmp.png").exists()


def test_compare_files_single_entry_format(tmp_path):
    """Our legacy single-entry format (real_time_median) still parses."""
    for p, t in ((tmp_path / "a.json", 2.0), (tmp_path / "b.json", 1.0)):
        p.write_text(json.dumps({"benchmarks": [{
            "name": "mc/12/1000", "real_time": t, "real_time_median": t,
            "time_unit": "s", "repetitions": 3,
        }]}))
    rows = compare_files(str(tmp_path / "a.json"), str(tmp_path / "b.json"))
    assert rows[0][3] == pytest.approx(2.0)
    assert rows[0][4] is None  # no samples -> no test


def test_benchmark_google_cli_emits_samples(tmp_path, monkeypatch):
    import sys

    from stock_market_monte_carlo_tpu.cli.main import main

    out = tmp_path / "bench.json"
    main(["benchmark-google", "12", "20000", "--repetitions", "3",
          "--benchmark_out", str(out)])
    data = json.loads(out.read_text())
    iters = [b for b in data["benchmarks"]
             if b.get("run_type") == "iteration"]
    aggs = [b for b in data["benchmarks"]
            if b.get("run_type") == "aggregate"]
    assert len(iters) == 3
    assert {a["aggregate_name"] for a in aggs} == {
        "mean", "median", "stddev"
    }


def test_repetition_files_use_median_not_first_rep(tmp_path):
    """Regression: files with only per-repetition entries (no aggregates)
    must report the sample median, not the first repetition."""
    import numpy as np

    for p, samples in ((tmp_path / "a.json", [9.0, 1.0, 1.1]),
                       (tmp_path / "b.json", [9.0, 1.0, 1.1])):
        entries = [
            {"name": "mc/1/1", "run_type": "iteration",
             "repetition_index": i, "real_time": t, "time_unit": "s"}
            for i, t in enumerate(samples)
        ]
        p.write_text(json.dumps({"benchmarks": entries}))
    rows = compare_files(str(tmp_path / "a.json"), str(tmp_path / "b.json"))
    assert rows[0][1] == pytest.approx(1.1)   # median, not 9.0


def test_time_unit_normalization(tmp_path, capsys):
    """A nanosecond Google-Benchmark file against our seconds file must
    compare in a common unit (speedups were ~1e9x wrong otherwise)."""

    def write(path, unit, scale):
        entries = [
            {"name": "mc", "run_type": "iteration", "repetition_index": i,
             "real_time": (0.5 + 0.01 * i) * scale, "time_unit": unit}
            for i in range(4)
        ]
        path.write_text(json.dumps({"benchmarks": entries}))

    a = tmp_path / "sec.json"
    b = tmp_path / "nsec.json"
    write(a, "s", 1.0)
    write(b, "ns", 1e9)  # identical timings expressed in ns
    compare_files(str(a), str(b))
    out = capsys.readouterr().out
    # identical distributions: speedup ~1.0x, not 1e9x
    assert "1.00x" in out


def test_aggregate_only_entry_skipped(tmp_path, capsys):
    f = tmp_path / "agg.json"
    f.write_text(json.dumps({"benchmarks": [
        {"name": "mc_mean", "run_type": "aggregate",
         "aggregate_name": "mean", "real_time": 1.0, "time_unit": "s"},
        {"name": "ok", "real_time": 2.0, "time_unit": "s",
         "real_time_median": 2.0},
    ]}))
    compare_files(str(f), str(f))
    out = capsys.readouterr().out
    assert "skipped" in out and "ok" in out
