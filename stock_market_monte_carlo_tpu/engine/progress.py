"""Progress reporting for long runs.

The reference couples an ``std::atomic<long>`` counter updated per OpenMP
block (src/simulations.cpp:190,254) to a DearImGui render loop that polls it
(examples/visualize_returns_cpu.cpp:296-434). Here the engine invokes a
callback after every completed device chunk — the chunk dispatch loop is the
atomic counter — and ``TerminalProgress`` renders it as a live terminal line
(the GUI-replacement surface; plotting lives in viz/).
"""

from __future__ import annotations

import sys
import time
from typing import Callable, Optional

# signature: (paths_done, paths_total) -> None
ProgressCallback = Callable[[int, int], None]


class TerminalProgress:
    """Live single-line progress: count, percent, rate, ETA."""

    def __init__(self, stream=None, min_interval_s: float = 0.1):
        self.stream = stream or sys.stderr
        self.min_interval_s = min_interval_s
        self._start: Optional[float] = None
        self._last_print = 0.0
        # overwritten on the first callback (checkpoint resumes report the
        # prior run's paths there); initialized here so any access before
        # the first callback sees 0, not AttributeError
        self._done0 = 0

    def __call__(self, done: int, total: int) -> None:
        now = time.monotonic()
        if self._start is None:
            self._start = now
            # checkpoint resumes report the prior run's paths in the first
            # callback; rate/ETA must count only THIS session's work
            self._done0 = done
        if done < total and now - self._last_print < self.min_interval_s:
            return
        self._last_print = now
        elapsed = now - self._start
        rate = (done - self._done0) / elapsed if elapsed > 0 else 0.0
        eta = (total - done) / rate if rate > 0 else float("inf")
        pct = 100.0 * done / total if total else 100.0
        msg = (
            f"\r{done}/{total} simulations done ({pct:5.1f}%) | "
            f"{rate:,.0f} paths/s | eta {eta:6.1f}s"
        )
        self.stream.write(msg)
        if done >= total:
            self.stream.write("\n")
        self.stream.flush()
