"""Configuration dataclasses for the simulation engine.

The reference's "config system" is positional argv per binary plus hard-coded
constants (reference: examples/benchmark_mc_gpu.cpp:50-61, THREADS_PER_BLOCK
in src/simulations.cu:17, initial_capital=1000 in examples/benchmark_mc_cpu.cpp).
Here configuration is explicit and serializable; the CLI layer maps the
reference's argv conventions onto these dataclasses.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

DEFAULT_INITIAL_CAPITAL = 1000.0
# Gaussian market defaults: 6%/yr mean, 10%/yr std, expressed monthly in
# percent (reference: examples/monte_carlo_simulated.cpp:11-13).
DEFAULT_GAUSSIAN_MEAN_PCT = 6.0 / 12
DEFAULT_GAUSSIAN_STD_PCT = 10.0 / 12


@dataclasses.dataclass(frozen=True)
class EngineOptions:
    """Execution knobs; all have TPU-sensible defaults.

    Tile sizes are fixed by the kernels (8192 paths per exact-sampler tile,
    4096 per CLT tile — ops/pallas_engine.py TILE_PATHS/CLT_P, the moral
    equivalents of the reference's THREADS_PER_BLOCK=256,
    src/simulations.cu:17) and double as the RNG granularity: a tile's
    stream depends only on its *global* index, so results are invariant to
    chunking and sharding.
    """

    # 'auto' picks pallas on TPU, xla elsewhere.
    backend: str = "auto"
    # Paths per single device dispatch; large runs loop over macro-chunks of
    # this size so the host can report progress and stay under HBM limits.
    chunk_paths: int = 2**24
    # Final-value histogram resolution (log-spaced interior bins). The
    # default makes interior + underflow + overflow = 4096 = 64*64, the
    # exact factorization the MXU histogram kernel uses.
    histogram_bins: int = 4094
    # False skips the final-value histogram entirely — the reference's
    # reduceBlock benchmark computes ONLY mean/variance
    # (src/simulations.cu:185-247), so this is the like-for-like mode;
    # the one-hot binning measures ~30 ms per 2^24-path chunk on one v5e.
    # SimulationResult.quantiles()/prob_below_amount() then raise unless
    # keep_final_values captures exact finals.
    histogram: bool = True
    # False skips the per-path withdrawn-total accumulation (reported
    # total_withdrawn becomes 0.0 on every backend). For multiplicative
    # withdrawal strategies under gaussian_sampler="clt"/"clt-prefix"
    # this unlocks the full-speed CLT kernel: the keep fractions fold
    # into the per-block affine constants, so the FINALS of a strategy
    # run are exact and free — only the withdrawn total needs the
    # expensive lane prefix-product that otherwise forces the slower
    # exact-ICDF kernel (0.563 s vs ~0.39 s at 100M x 360).
    track_withdrawn: bool = True
    # When True, compute per-path final values in addition to fused stats
    # (needed for exact quantiles; costs an HBM write of 4 bytes/path).
    keep_final_values: bool = False
    # Gaussian sampling algorithm on the Pallas backend:
    #  - "icdf": inverse-CDF per draw (polynomial erfinv; default)
    #  - "clt":  MXU orthogonal-mix sampler — 128 uniforms mixed through a
    #    random orthogonal matrix per 128-month block (CLT_K=128). Exact
    #    mean/variance/skew. Tail accuracy: the shared-draw block
    #    structure leaves log V_T an excess-kurtosis deficit of ~-0.009
    #    (ops/analytic.clt_block_kurtosis, validated at 1e9 paths on
    #    hardware), so quantiles at p in [0.01, 0.99] are accurate to
    #    <1e-4 but DEEP-tail quantiles pull in ~0.12% at p=1e-3 and
    #    ~0.4% at p=1e-5 — use the default "icdf" (no such deviation)
    #    when tail probabilities beyond ~1e-3 are the quantity of
    #    interest. ~1.4x faster; plain Gaussian compounding only —
    #    strategy runs fall back to "icdf" (which measures faster when
    #    the withdrawn total is tracked) unless track_withdrawn=False,
    #    where the keep-folded plain kernel runs strategies at full CLT
    #    speed.
    #  - "clt-prefix": CLT that also runs percent-withdrawal strategies
    #    in-kernel via a lane prefix-product on 2048-path tiles. Exact
    #    withdrawn totals, but measured SLOWER than the icdf fallback
    #    (1.007 s vs 0.563 s at 100M x 360); explicit opt-in.
    gaussian_sampler: str = "icdf"
    # Terminal-law sampling (ops/terminal_law.py): draw V_T in ONE step
    # from its exact T-fold-convolution law (FFT oracle -> Chebyshev fit
    # of the probit quantile function, evaluated on device by a Clenshaw
    # recurrence) instead of looping T months — ~two orders of magnitude
    # less device work at T=360, sampling the identical distribution to
    # the fit tolerance (measured ~1e-7 log error at T>=12; the fit
    # validates itself and raises when a law is too rough, e.g. a 1-month
    # bootstrap step function). Applies to simulate_stats /
    # simulate_final_values with counter-rng gaussian/historical models
    # and multiplicative strategies (keep > 0; strategy runs need
    # track_withdrawn=False — per-path withdrawn totals are
    # path-dependent and cannot be sampled from the terminal law).
    # Streams are NOT samplewise-comparable to the month-loop engines.
    # The reference has no analog; bench.py headlines this sampler (the
    # framework's fastest exact answer to the reference benchmark task)
    # and keeps the month-loop kernels' like-for-like ratios in extra.
    terminal_law: bool = False
    # (A "hist-clt" cumulant-matched approximate bootstrap sampler was
    # built and measured at 1e9 paths in round 3, then REMOVED: the
    # sliced-rotation exact kernel is both faster — its gather is cheap —
    # and exact, so the approximation had no winning configuration.
    # Full measurements: docs/optimization_log.md v10.)
    # Max chunks fused into ONE device dispatch (a lax.scan over the
    # chunk body) when nothing consumes per-chunk results — the same
    # condition as deferred absorb (no stream/progress/checkpoint/
    # keep_final_values). Each dispatch through a remote-device tunnel
    # pays a measured ~5-8 ms floor even when queued back-to-back
    # (experiments/exp_dispatch_overhead.py), which dominates kernels
    # whose per-chunk device time is smaller (terminal-law: ~4 ms).
    # Fusing emits the identical per-chunk (stats, histogram) rows
    # stacked, so host float64 merges run in the same order on the same
    # f32 values — results are BIT-IDENTICAL to unfused dispatch.
    # A run dispatches full fuse_chunks-length blocks plus ONE exact-
    # length tail block (a run of <= fuse_chunks chunks — e.g. the 100M
    # headline's 6 — is a single device dispatch); at most two scan
    # lengths compile per run and no padded compute is wasted. 0 or 1
    # disables.
    fuse_chunks: int = 64
    # Paths per seed segment. simulate_stats runs larger n_paths as a
    # sequence of segments of this size, each drawing from an
    # independent stream (segment 0 uses the plain seed key — runs at or
    # below one segment are bit-identical to a build without
    # segmentation; segment s >= 1 folds s into the key:
    # engine._seg_root). This lifts the uint32 global-path-offset cap
    # (~4.29e9 paths) that previously forced manual seed splitting: a
    # 1e10-path run is now one call whose statistics merge exactly in
    # float64 on the host, and whose result is invariant to chunk size,
    # fuse_chunks, device count, and checkpoint/resume — the same
    # invariants as within-segment chunking. The default 2^31 keeps the
    # per-segment offset space comfortably inside uint32 for any legal
    # chunk size. Changing it changes the sampled streams of runs larger
    # than one segment (the value is part of the checkpoint fingerprint
    # for such runs); it does NOT affect runs that fit in one segment.
    # Excluded: Sobol models (their documented split mechanism is
    # index_offset over the 2^62 sequence) and reference-parity rng
    # (streams depend only on the global path id, so a fresh segment
    # would REPEAT segment 0's paths — simulate_stats refuses).
    seed_segment_paths: int = 1 << 31
    # Device->host dtype for exported trajectories (run(keep_trajectories),
    # simulate_paths). "bfloat16" halves the transfer bytes — the
    # bottleneck for keepdata exports in tunnel-bound environments
    # (65k x 360 measured transfer-bound, RESULTS.md) — at ~3 decimal
    # digits of per-sample precision: ideal for visualization consumers,
    # wrong for exact-quantile tests. Values are converted back to f32 on
    # the host either way.
    trajectory_dtype: str = "float32"

    def __post_init__(self):
        if self.chunk_paths % 8192 != 0:
            raise ValueError(
                "chunk_paths must be a multiple of 8192 (the RNG/path tile),"
                f" got {self.chunk_paths}"
            )
        if self.chunk_paths > 2**24:
            # Per-device count exactness invariant: path counts and
            # count-below accumulate in f32 on device (per-tile partial
            # rows + in-chunk reductions + the law kernel's VMEM
            # histogram cells). f32 represents every integer only up to
            # 2^24, so one device-chunk must not exceed it — at 2^24 all
            # intermediate partial sums are integers <= 2^24 and hence
            # exact. Cross-device merges (engine device_fn) psum counts
            # in int32 (exact to 2^31) and the host merges in float64,
            # so total run size is unbounded; only the per-dispatch
            # device chunk is capped. (2^25 chunks measured ~3% faster
            # at 100M in the tunnel-bound environment —
            # experiments/exp_law_chunk.py — but break the documented
            # exact-count/chunk-invariance contract.)
            raise ValueError(
                "chunk_paths must be <= 2**24 to keep on-device f32 path "
                f"counts exact, got {self.chunk_paths}"
            )
        if not (0 <= self.fuse_chunks <= 64
                and (self.fuse_chunks & (self.fuse_chunks - 1)) == 0):
            # the cap bounds per-dispatch device occupancy (64 x 2^24 =
            # 1.07e9 paths in one dispatch); power-of-two is kept as a
            # stable public contract (scan lengths are exact-sized per
            # run regardless, see engine's fused-block dispatch)
            raise ValueError(
                "fuse_chunks must be a power of two <= 64 (0/1 disables),"
                f" got {self.fuse_chunks}"
            )
        if (self.seed_segment_paths <= 0
                or self.seed_segment_paths % 8192 != 0):
            # tile alignment keeps segment starts on RNG-tile boundaries
            # for every kernel family (8192/4096/2048 all divide 8192)
            raise ValueError(
                "seed_segment_paths must be a positive multiple of 8192, "
                f"got {self.seed_segment_paths}"
            )
        if self.gaussian_sampler not in ("icdf", "clt", "clt-prefix"):
            raise ValueError(
                "gaussian_sampler must be 'icdf', 'clt', or 'clt-prefix', "
                f"got {self.gaussian_sampler!r}"
            )
        if self.trajectory_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                "trajectory_dtype must be 'float32' or 'bfloat16', "
                f"got {self.trajectory_dtype!r}"
            )


@dataclasses.dataclass(frozen=True)
class SimulationConfig:
    """One Monte Carlo experiment.

    Mirrors the reference entry-point signature (max_n_simulations,
    n_periods, initial_capital, returns-source; reference:
    include/stock_market_monte_carlo/simulations.h:49-87) plus seed and
    withdrawal strategy (the reference's open TODO, README.md:130-133).
    """

    n_paths: int
    n_periods: int
    initial_capital: float = DEFAULT_INITIAL_CAPITAL
    seed: int = 0
    # Below-target probability threshold (the GUI slider / count_below input,
    # reference: examples/visualize_returns_cpu.cpp:121-134). None disables.
    target_amount: Optional[float] = None

    def __post_init__(self):
        if self.n_paths <= 0:
            raise ValueError(f"n_paths must be positive, got {self.n_paths}")
        if self.n_periods <= 0:
            raise ValueError(
                f"n_periods must be positive, got {self.n_periods}"
            )
