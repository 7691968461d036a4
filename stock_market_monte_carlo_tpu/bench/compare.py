"""Benchmark comparison — the python/benchmark_compare.py equivalent.

Reads two benchmark JSON files (either our ``smmc benchmark-google``
output or Google-Benchmark JSON, both use a ``benchmarks`` list) and prints
a side-by-side table with relative deltas; optionally plots.
"""

from __future__ import annotations

import json
from typing import Optional


def _load(path):
    with open(path) as f:
        data = json.load(f)
    out = {}
    for b in data.get("benchmarks", []):
        name = b.get("name", "?")
        t = b.get("real_time_median", b.get("real_time"))
        out[name] = {
            "time": float(t),
            "unit": b.get("time_unit", "s"),
            "paths_per_second": b.get("paths_per_second"),
        }
    if not out:
        raise SystemExit(f"{path!r} has no benchmarks")
    return out


def compare_files(baseline_path: str, contender_path: str,
                  plot_path: Optional[str] = None):
    base = _load(baseline_path)
    cont = _load(contender_path)
    names = sorted(set(base) | set(cont))
    rows = []
    print(f"{'benchmark':40s} {'baseline':>12s} {'contender':>12s} "
          f"{'speedup':>8s}")
    for n in names:
        b = base.get(n)
        c = cont.get(n)
        if b is None or c is None:
            bt = "--" if b is None else f"{b['time']:.4f}"
            ct = "--" if c is None else f"{c['time']:.4f}"
            print(f"{n:40s} {bt:>12s} {ct:>12s} {'--':>8s}")
            continue
        speedup = b["time"] / c["time"] if c["time"] else float("inf")
        rows.append((n, b["time"], c["time"], speedup))
        print(f"{n:40s} {b['time']:>10.4f}{b['unit']:>2s} "
              f"{c['time']:>10.4f}{c['unit']:>2s} {speedup:>7.2f}x")

    if plot_path and rows:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        names_, bt, ct, _ = zip(*rows)
        x = range(len(rows))
        fig, ax = plt.subplots(figsize=(10, 5))
        ax.bar([i - 0.2 for i in x], bt, width=0.4, label="baseline")
        ax.bar([i + 0.2 for i in x], ct, width=0.4, label="contender")
        ax.set_xticks(list(x))
        ax.set_xticklabels(names_, rotation=30, ha="right")
        ax.set_ylabel("time")
        ax.legend()
        plt.tight_layout()
        plt.savefig(plot_path)
        print(f"saved {plot_path}")
    return rows
