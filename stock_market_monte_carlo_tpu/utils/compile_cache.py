"""Persistent XLA compilation cache — warm-path resume (VERDICT r4 #6).

The round-4 fault drill proved checkpoint resume bit-identical but paid
an 18x latency multiple (resume 111.6 s vs 6.1 s control,
scale_fault_drill.json): a fresh resume process re-compiles its XLA
program through the remote compile service, which additionally suffers
an intermittent per-process first-compile stall (250-710 s observed —
docs/optimization_log.md v23). JAX's persistent compilation cache
serializes compiled executables to disk so a resume process can LOAD
yesterday's executable instead of re-compiling.

Opt-in via ``SMMC_COMPILE_CACHE=<dir>`` (enabled automatically at
package import) or call :func:`enable` directly. Serialization support
depends on the PJRT backend: standard CPU/TPU backends support it; if a
backend refuses, JAX logs and compiles normally — enabling the cache is
never worse than the status quo. The fault-drill script enables it for
the child, resume, and control processes so the drill measures the
warm-resume path (scripts/scale_fault_drill_tpu.py).
"""

from __future__ import annotations

import os
from typing import Optional


def enable(cache_dir: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Returns the directory actually configured, or None when disabled
    (no dir given and ``SMMC_COMPILE_CACHE`` unset). Safe to call more
    than once; the last directory wins.
    """
    cache_dir = cache_dir or os.environ.get("SMMC_COMPILE_CACHE")
    if not cache_dir:
        return None
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache every program: the chunk kernels this serves compile in
    # seconds-to-minutes, far above any write-amortization threshold,
    # and resume latency is the product metric
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir


def enabled_dir() -> Optional[str]:
    import jax

    return jax.config.jax_compilation_cache_dir
