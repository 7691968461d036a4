"""Fused Pallas band kernel: per-month trajectory histograms accumulated
INSIDE the month loop.

The XLA bands path (engine/bands.py) simulates a chunk, materializes the
(B, T+1) trajectories in HBM, and scans an XLA one-hot matmul over the
T+1 months — measured 35.1 s for 100M x 360 (RESULTS.md), dominated by
the per-month one-hot materialization traffic. Here the running value is
already in vector registers every month (the same visit the stats kernel
makes, ops/pallas_engine.py), so each month is binned and counted on the
spot: log(total) -> per-month affine bin index -> per-row one-hot pieces
-> one (NHI_PAD, TILE) @ (TILE, 32) NT gemm -> accumulated into a
VMEM-resident (T * NHI_PAD, 32) month-histogram that persists across
grid steps (constant output index_map). Only that ~1.8 MB table crosses
to the host per chunk — the keepdata capability
(src/simulations.cpp:139-202) at reduceBlock-style transfer cost.

Binning matches engine/bands.py's z-grid exactly up to +/-1 ulp at bin
edges (idx = floor(logv * A_t + B_t) + 1 clipped, A/B precomputed per
month on host): single-count edge jitter, the same tolerance the stats
kernel's histogram carries. Streams are the stats kernels' tile-keyed
hardware PRNG streams, so band runs are chunk- and shard-invariant (but
are a DIFFERENT stream family than the XLA threefry bands — parity
checks are statistical, as everywhere between the two backends).

Supported here: gaussian (exact ICDF) and counter-mode historical
(sliced-rotation) models with multiplicative strategies. Everything else
(sobol, reference-rng, fixed_amount) stays on the XLA path.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stock_market_monte_carlo_tpu.ops.pallas_engine import (
    TILE_PATHS,
    TILE_ROWS,
    _SQRT2,
    _erfinv_poly,
    _pad_table,
    _seed_base_i32,
    _sliced_rotation_draw,
    _tile_seed_i32,
    _TileRng,
    _u23_from_bits,
    interpret_mode,
    prng_impl,
)

LO_W = 32  # lanes of the factorized one-hot gemm

# ablation hook for kernel-stage attribution (docs/optimization_log.md):
# "nocount" skips binning+counting, "nogemm" builds one-hots but skips the
# contraction, "nostore" runs the gemm but skips the accumulator RMW
import os

_ABLATE = os.environ.get("SMMC_BANDS_ABLATE", "")
if _ABLATE not in ("", "nocount", "nogemm", "nostore"):
    raise ValueError(
        "SMMC_BANDS_ABLATE must be one of nocount/nogemm/nostore (or "
        f"unset), got {_ABLATE!r}"
    )
if _ABLATE:
    import warnings

    warnings.warn(
        f"SMMC_BANDS_ABLATE={_ABLATE}: band kernels produce intentionally "
        "WRONG counts (attribution timing variant)",
        stacklevel=2,
    )
# indicator dtype for the factorized one-hot gemm: "i8" (default —
# halves the bytes the per-month indicator relayout moves; measured
# 482 vs 574 ms/chunk against the bf16 control in one batch,
# exp_bands_attr.py, and the int32 accumulation is exact to 2^31/cell
# where f32 capped at 2^24) or "bf16" (the original, kept for ablation)
_OH_I8 = os.environ.get("SMMC_BANDS_OH", "i8") == "i8"
_OH_DTYPE = jnp.int8 if _OH_I8 else jnp.bfloat16
_ACC_DTYPE = jnp.int32 if _OH_I8 else jnp.float32


def _nhi_pad(n_cells: int) -> int:
    """Sublane rows of the hi one-hot: ceil(cells/32), padded to 8."""
    nhi = -(-n_cells // LO_W)
    return -(-nhi // 8) * 8


def _build_bands_kernel(kind: str, strategy_kind: str, n_periods: int,
                        n_table_chunks: int, n_cells: int,
                        prng: str = "hw"):
    """Kernel over tiles of TILE_PATHS paths; one grid step per tile.

    Ref layout:
      iscal (SMEM i32 (8,)): seed_base, tile0, valid, n_table, tail_n, -,-,-
      fscal (SMEM f32 (8,)): v0, a, b, -,-,-,-,-
      ab    (SMEM f32 (T, 2)): per-month bin coefficients A_t, B_t
      [table (C,128) f32 VMEM]            historical
      [keep (T,1) f32 SMEM]               percent strategies
      mhist (T*NHI_PAD, LO_W) f32 VMEM out — constant index_map, so the
        block persists across the sequential TPU grid and accumulates;
        zeroed at pid == 0.
    """
    is_hist = kind.endswith("historical")
    has_keep = strategy_kind in ("fixed_percent", "variable_percent")
    nhi_pad = _nhi_pad(n_cells + 1)  # +1: discard cell for masked lanes
    discard = n_cells

    def kernel(*refs):
        it = iter(refs)
        iscal = next(it)
        fscal = next(it)
        ab_ref = next(it)
        table_ref = next(it) if is_hist else None
        keep_ref = next(it) if has_keep else None
        mhist_ref = next(it)

        pid = pl.program_id(0)
        tile = iscal[1] + pid
        v0, a, b = fscal[0], fscal[1], fscal[2]
        rng = _TileRng(_tile_seed_i32(iscal[0], tile), prng)

        rr = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 128), 0)
        ll = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 128), 1)
        local_id = pid * TILE_PATHS + rr * 128 + ll
        mask = local_id < iscal[2]

        @pl.when(pid == 0)
        def _init():
            mhist_ref[:] = jnp.zeros_like(mhist_ref)

        if is_hist:
            rows = [
                jnp.broadcast_to(
                    table_ref[c, :][None, :], (TILE_ROWS, 128)
                )
                for c in range(n_table_chunks)
            ]
            n_i32 = iscal[3]
            tail_n = iscal[4]
            n_valid = jnp.where(
                ll < tail_n, jnp.int32(n_table_chunks),
                jnp.int32(n_table_chunks - 1),
            )

            def growth(t):
                # the shared stream-defining recipe — identical stream to
                # ops/pallas_engine._build_kernel by construction
                return _sliced_rotation_draw(
                    rows, ll, n_valid, n_i32, tail_n, n_table_chunks,
                    rng.bits(ll.shape, key=t),
                )
        else:
            def growth(t):
                u = _u23_from_bits(rng.bits((TILE_ROWS, 128), key=t))
                z = jnp.float32(_SQRT2) * _erfinv_poly(2.0 * u - 1.0)
                return a + b * z

        rio = jax.lax.broadcasted_iota(jnp.int32, (nhi_pad, 128), 0)
        lio = jax.lax.broadcasted_iota(jnp.int32, (LO_W, 128), 0)

        def bin_and_count(t, tc, total):
            # month t's counts (clamped row tc); dead months (t >= T) and
            # masked lanes fall into the discard cell of row tc
            if _ABLATE == "nocount":
                return
            logv = jnp.log(jnp.maximum(total, 1e-37))
            idx = (jnp.floor(logv * ab_ref[tc, 0] + ab_ref[tc, 1])
                   .astype(jnp.int32) + 1)
            idx = jnp.clip(idx, 0, n_cells - 1)
            live = jnp.logical_and(mask, t < n_periods)
            idx = jnp.where(live, idx, discard)
            hi_b = idx >> 5
            lo_b = idx & (LO_W - 1)
            oh_hi = jnp.concatenate(
                [(hi_b[r:r + 1, :] == rio).astype(_OH_DTYPE)
                 for r in range(TILE_ROWS)], axis=1,
            )
            oh_lo = jnp.concatenate(
                [(lo_b[r:r + 1, :] == lio).astype(_OH_DTYPE)
                 for r in range(TILE_ROWS)], axis=1,
            )
            if _ABLATE == "nogemm":
                mhist_ref[0:8, :] = (
                    mhist_ref[0:8, :]
                    + oh_hi[0:8, 0:LO_W].astype(_ACC_DTYPE)
                    + oh_lo[0:8, 0:LO_W].astype(_ACC_DTYPE)
                )
                return
            c = jax.lax.dot_general(
                oh_hi, oh_lo, (((1,), (1,)), ((), ())),
                preferred_element_type=_ACC_DTYPE,
            )
            if _ABLATE == "nostore":
                mhist_ref[0:nhi_pad, :] = mhist_ref[0:nhi_pad, :] + c
                return
            base = tc * nhi_pad
            mhist_ref[pl.ds(base, nhi_pad), :] = (
                mhist_ref[pl.ds(base, nhi_pad), :] + c
            )

        UNROLL = 4
        n_iters = -(-n_periods // UNROLL)
        v0_tile = jnp.full((TILE_ROWS, 128), 1.0, jnp.float32) * v0

        def body(i, total):
            for s in range(UNROLL):
                t = i * UNROLL + s
                tc = jnp.minimum(t, n_periods - 1)
                g = growth(tc)
                if has_keep:
                    g = g * keep_ref[tc, 0]
                new_total = total * g
                total = jnp.where(t < n_periods, new_total, total)
                bin_and_count(t, tc, total)
            return total

        jax.lax.fori_loop(0, n_iters, body, v0_tile)

    return kernel


@lru_cache(maxsize=16)
def _build_bands_call(kind: str, strategy_kind: str, n_periods: int,
                      n_table_chunks: int, n_cells: int, ntiles: int,
                      interpret, prng: str = "hw"):
    kernel = _build_bands_kernel(kind, strategy_kind, n_periods,
                                 n_table_chunks, n_cells, prng)
    nhi_pad = _nhi_pad(n_cells + 1)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # iscal
        pl.BlockSpec(memory_space=pltpu.SMEM),  # fscal
        pl.BlockSpec(memory_space=pltpu.SMEM),  # ab
    ]
    if kind.endswith("historical"):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    if strategy_kind in ("fixed_percent", "variable_percent"):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    out_specs = pl.BlockSpec(
        (n_periods * nhi_pad, LO_W), lambda i: (0, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct(
        (n_periods * nhi_pad, LO_W), _ACC_DTYPE
    )
    return pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )


def bands_supported(model, strategy_kind: str) -> bool:
    return (
        model.kind in ("gaussian", "historical")
        and getattr(model, "rng", "counter") == "counter"
        and strategy_kind in ("none", "fixed_percent", "variable_percent")
    )


# ---------------------------------------------------------------------------
# CDF band mode: per-month counts below K analytically-placed thresholds.
#
# The hist kernel's per-month indicator build is relayout-bound (~70% of
# the kernel, optimization_log v11): concatenating 64 per-row compare
# pieces into (rows, 8192) gemm operands moves ~1 MB/month/tile of VMEM.
# Here month t is reduced to K counts-below instead of an n_bins
# histogram: thr[t, k] = exp(A_t + kk_k * B_t) is affine-in-k in log
# space (a uniform z grid with +/-Z guard rows at fractional k), built
# per month from TWO SMEM scalars with one fma + exp on a (K, 128) vreg
# set; each of the 64 tile rows then broadcast-compares against it and
# accumulates int32 lane-partial counts — no concatenation, no relayout,
# no gemm, and no per-month log of the running totals (the compare is
# monotone, so it runs in value space). Host-side quantile inversion
# interpolates the K-point CDF in probit space (ops/reductions.py:
# cdf_band_quantiles) — exact whenever the sample is lognormal between
# adjacent thresholds, which the per-month values are to CLT accuracy.
# ---------------------------------------------------------------------------

CDF_THRESHOLDS = 32        # default K (multiple of 8; rows of one block)
# VMEM cap for the persistent (T*K, 128) int32 accumulator (~half of the
# ~16 MB/core budget, leaving room for the table + working set)
_CDF_VMEM_CAP = 8 << 20

# count_month implementation (counts are bit-identical across all three;
# measured A/B in docs/optimization_log.md v18 — "rows" wins):
#   "rows"    (default) — the v12 original: 64 per-row broadcast-compares
#     (292 ms / 2^24 chunk; the v12 "~80 ms relayout tax" hypothesis was
#     WRONG — the per-row (1,128)->(K,128) broadcasts are cheap)
#   "roll"    — K sublane rotations of the (64,128) value tile against a
#     reps-tiled threshold block: zero sublane broadcasts but the
#     rotations themselves cost more than the broadcasts (333 ms)
#   "bcast3d" — one (64,K,128) compare + axis-0 reduce, Mosaic's choice
#     (296 ms, within noise of rows)
_CDF_IMPL = os.environ.get("SMMC_BANDS_CDF_IMPL", "rows")
if _CDF_IMPL not in ("roll", "rows", "bcast3d"):
    raise ValueError(
        "SMMC_BANDS_CDF_IMPL must be roll/rows/bcast3d, got "
        f"{_CDF_IMPL!r}"
    )


def _counts_below_tile(tl, thr, n_thr: int, eff_impl: str):
    """(n_thr, 128) int32 lane-partial counts of tl rows below each
    threshold row; tl (TILE_ROWS, 128) f32, thr (n_thr, 128) f32.

    All three implementations produce bit-identical counts (integer sums,
    reassociated only); full-entropy identity is pinned by
    tests/test_bands.py::test_counts_below_tile_impl_identity (plain
    interpret mode, random inputs — the zero-bits PRNG stub of the
    engine-level CPU tests would mask row-permutation bugs here).
    """
    if eff_impl == "roll":
        # Count below via TILE_ROWS-preserving sublane rotations: row r
        # of the rotated tile is tl[(r + s) % 64], compared against a
        # reps-tiled threshold block, so accumulator row r sums
        # [tl[r+s] < thr[r % K]] over s = 0..K-1; folding the reps
        # row-groups then covers every tl row exactly once. Same 256
        # compare-vregs/month as "rows" but zero sublane broadcasts
        # (the v12 relayout tax).
        reps = TILE_ROWS // n_thr
        thr2 = jnp.concatenate([thr] * reps, axis=0)
        acc2 = (tl < thr2).astype(jnp.int32)
        for s in range(1, n_thr):
            rolled = pltpu.roll(tl, TILE_ROWS - s, 0)
            acc2 = acc2 + (rolled < thr2).astype(jnp.int32)
        acc = acc2[0:n_thr]
        for j in range(1, reps):
            acc = acc + acc2[j * n_thr:(j + 1) * n_thr]
        return acc
    if eff_impl == "bcast3d":
        # one (64, K, 128) compare + axis-0 reduce; Mosaic picks the
        # layout/reduction tree
        return jnp.sum(
            (tl[:, None, :] < thr[None, :, :]).astype(jnp.int32), axis=0
        )
    acc = jnp.zeros((n_thr, 128), jnp.int32)
    for r in range(TILE_ROWS):
        acc = acc + (tl[r:r + 1, :] < thr).astype(jnp.int32)
    return acc


def _resolve_cdf_impl(impl, n_thr: int) -> str:
    """Resolve/validate the count_month impl once, at the entry point:
    None -> the env default; "roll" needs the K threshold rows to tile
    TILE_ROWS exactly (K = 8/16/32/64 qualify; cdf_supported guarantees
    K % 8 == 0 but not divisibility, e.g. K = 40 falls back to rows).
    Resolving before the _build_cdf_call lru_cache lookup keeps one cache
    entry per distinct kernel and rejects typo'd impl names that the
    kernel's dispatch would otherwise silently map to "rows"."""
    eff = impl or _CDF_IMPL
    if eff not in ("roll", "rows", "bcast3d"):
        raise ValueError(
            f"cdf count impl must be roll/rows/bcast3d, got {eff!r}"
        )
    if eff == "roll" and TILE_ROWS % n_thr != 0:
        eff = "rows"
    return eff


def _build_cdf_kernel(kind: str, strategy_kind: str, n_periods: int,
                      n_table_chunks: int, n_thr: int, impl: str,
                      prng: str = "hw"):
    """Kernel over tiles of TILE_PATHS paths; one grid step per tile.

    Ref layout matches _build_bands_kernel except:
      fscal[3], fscal[4]: kappa_lo / kappa_hi — the fractional k indices
        that place the under/overflow guard thresholds on the same
        affine-in-k log grid as the interior rows
      ab (SMEM f32 (T, 2)): per-month log-threshold coefficients A_t, B_t
        with log thr[t, k] = A_t + kk_k * B_t
      mcdf (T * n_thr, 128) i32 out — lane-partial counts below each
        threshold; the host (or the wrapper) sums lanes.
    """
    is_hist = kind.endswith("historical")
    has_keep = strategy_kind in ("fixed_percent", "variable_percent")

    def kernel(*refs):
        it = iter(refs)
        iscal = next(it)
        fscal = next(it)
        ab_ref = next(it)
        table_ref = next(it) if is_hist else None
        keep_ref = next(it) if has_keep else None
        mcdf_ref = next(it)

        pid = pl.program_id(0)
        tile = iscal[1] + pid
        v0, a, b = fscal[0], fscal[1], fscal[2]
        rng = _TileRng(_tile_seed_i32(iscal[0], tile), prng)

        rr = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 128), 0)
        ll = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 128), 1)
        local_id = pid * TILE_PATHS + rr * 128 + ll
        mask = local_id < iscal[2]

        @pl.when(pid == 0)
        def _init():
            mcdf_ref[:] = jnp.zeros_like(mcdf_ref)

        if is_hist:
            rows = [
                jnp.broadcast_to(
                    table_ref[c, :][None, :], (TILE_ROWS, 128)
                )
                for c in range(n_table_chunks)
            ]
            n_i32 = iscal[3]
            tail_n = iscal[4]
            n_valid = jnp.where(
                ll < tail_n, jnp.int32(n_table_chunks),
                jnp.int32(n_table_chunks - 1),
            )

            def growth(t):
                # identical stream recipe to _build_bands_kernel /
                # ops/pallas_engine._build_kernel, so hist- and cdf-mode
                # runs with the same seed count the SAME sample
                return _sliced_rotation_draw(
                    rows, ll, n_valid, n_i32, tail_n, n_table_chunks,
                    rng.bits(ll.shape, key=t),
                )
        else:
            def growth(t):
                u = _u23_from_bits(rng.bits((TILE_ROWS, 128), key=t))
                z = jnp.float32(_SQRT2) * _erfinv_poly(2.0 * u - 1.0)
                return a + b * z

        # threshold row indices: interior rows at their integer k, guard
        # rows 0 / n_thr-1 at the fractional kappas (built once per tile)
        kio = jax.lax.broadcasted_iota(jnp.int32, (n_thr, 128), 0)
        kk = kio.astype(jnp.float32)
        kk = jnp.where(kio == 0, fscal[3], kk)
        kk = jnp.where(kio == n_thr - 1, fscal[4], kk)

        def count_month(t, tc, total):
            live = jnp.logical_and(mask, t < n_periods)
            # dead lanes/months to +inf: never below any finite threshold
            tl = jnp.where(live, total, jnp.float32(np.inf))
            thr = jnp.exp(ab_ref[tc, 0] + kk * ab_ref[tc, 1])
            acc = _counts_below_tile(tl, thr, n_thr, impl)
            base = tc * n_thr
            mcdf_ref[pl.ds(base, n_thr), :] = (
                mcdf_ref[pl.ds(base, n_thr), :] + acc
            )

        UNROLL = 4
        n_iters = -(-n_periods // UNROLL)
        v0_tile = jnp.full((TILE_ROWS, 128), 1.0, jnp.float32) * v0

        def body(i, total):
            for s in range(UNROLL):
                t = i * UNROLL + s
                tc = jnp.minimum(t, n_periods - 1)
                g = growth(tc)
                if has_keep:
                    g = g * keep_ref[tc, 0]
                new_total = total * g
                total = jnp.where(t < n_periods, new_total, total)
                count_month(t, tc, total)
            return total

        jax.lax.fori_loop(0, n_iters, body, v0_tile)

    return kernel


@lru_cache(maxsize=16)
def _build_cdf_call(kind: str, strategy_kind: str, n_periods: int,
                    n_table_chunks: int, n_thr: int, ntiles: int,
                    interpret, impl: str, prng: str = "hw"):
    kernel = _build_cdf_kernel(kind, strategy_kind, n_periods,
                               n_table_chunks, n_thr, impl, prng)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # iscal
        pl.BlockSpec(memory_space=pltpu.SMEM),  # fscal
        pl.BlockSpec(memory_space=pltpu.SMEM),  # ab
    ]
    if kind.endswith("historical"):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    if strategy_kind in ("fixed_percent", "variable_percent"):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    out_specs = pl.BlockSpec(
        (n_periods * n_thr, 128), lambda i: (0, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((n_periods * n_thr, 128), jnp.int32)
    return pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )


def cdf_supported(model, strategy_kind: str, n_periods: int,
                  n_thresholds: int = CDF_THRESHOLDS) -> bool:
    """CDF band mode needs the band kernels AND the persistent
    (T*K, 128) int32 accumulator to fit the VMEM budget."""
    return (
        bands_supported(model, strategy_kind)
        and n_thresholds % 8 == 0
        and n_thresholds >= 8
        and n_periods * n_thresholds * 128 * 4 <= _CDF_VMEM_CAP
    )


def pallas_chunk_month_cdf(model, strategy, root_key, v0, path_offset,
                           valid, coef_a, coef_b, kappa_lo, kappa_hi, *,
                           n_periods, chunk_shape_b, n_thresholds,
                           keep=None, impl=None):
    """(T, K) int32 counts-below for months 1..T of one chunk.

    ``coef_a``/``coef_b``: (T,) per-month log-threshold coefficients with
    log thr[t, k] = A_t + kk_k * B_t, kk the integer row index except the
    guard rows 0 / K-1 which sit at ``kappa_lo`` / ``kappa_hi``. Month 0
    (every path at v0) is a host-side constant and not computed here.
    Counts per (threshold, lane) cell stay < 2^31 for any chunk
    (<= TILE_ROWS per tile per month, < 2^25 tiles).
    """
    assert chunk_shape_b % TILE_PATHS == 0, (chunk_shape_b, TILE_PATHS)
    ntiles = chunk_shape_b // TILE_PATHS
    interpret = interpret_mode(model.kind)

    operands = []
    n_table = 0
    n_table_chunks = 0
    if model.kind.endswith("historical"):
        table2d, n_table = _pad_table(model.returns_pct)
        n_table_chunks = int(table2d.shape[0])
        operands.append(table2d)
    if keep is not None:
        operands.append(jnp.asarray(keep, jnp.float32).reshape(-1, 1))

    tail_n = n_table - 128 * (n_table_chunks - 1) if n_table else 0
    iscal = jnp.stack([
        _seed_base_i32(root_key),
        jax.lax.bitcast_convert_type(
            jnp.asarray(path_offset, jnp.uint32) // jnp.uint32(TILE_PATHS),
            jnp.int32,
        ),
        jnp.asarray(valid, jnp.int32),
        jnp.asarray(n_table, jnp.int32),
        jnp.asarray(tail_n, jnp.int32),
        jnp.int32(0), jnp.int32(0), jnp.int32(0),
    ])
    mean = getattr(model, "mean_pct", 0.0)
    std = getattr(model, "std_pct", 0.0)
    fscal = jnp.stack([
        jnp.asarray(v0, jnp.float32),
        1.0 + jnp.asarray(mean, jnp.float32) * 0.01,
        jnp.asarray(std, jnp.float32) * 0.01,
        jnp.float32(kappa_lo), jnp.float32(kappa_hi),
        jnp.float32(0), jnp.float32(0), jnp.float32(0),
    ])
    ab = jnp.stack([
        jnp.asarray(coef_a, jnp.float32), jnp.asarray(coef_b, jnp.float32)
    ], axis=1)

    strategy_kind = strategy.kind if keep is not None else "none"
    call = _build_cdf_call(
        model.kind, strategy_kind, n_periods, n_table_chunks,
        n_thresholds, ntiles, interpret,
        _resolve_cdf_impl(impl, n_thresholds), prng_impl(),
    )
    mcdf = call(iscal, fscal, ab, *operands)
    return mcdf.reshape(n_periods, n_thresholds, 128).sum(axis=2)


def pallas_chunk_month_hist(model, strategy, root_key, v0, path_offset,
                            valid, coef_a, coef_b, *, n_periods,
                            chunk_shape_b, n_bins, keep=None):
    """(T, n_bins+2) month-histogram counts for months 1..T of one chunk.

    ``coef_a``/``coef_b``: (T,) per-month bin coefficients with
    idx = clip(floor(logv * A_t + B_t) + 1, 0, n_bins+1) reproducing
    engine/bands.py's z-grid. Month 0 (every path at v0) is a host-side
    constant and not computed here.
    """
    assert chunk_shape_b % TILE_PATHS == 0, (chunk_shape_b, TILE_PATHS)
    ntiles = chunk_shape_b // TILE_PATHS
    n_cells = n_bins + 2
    nhi_pad = _nhi_pad(n_cells + 1)
    interpret = interpret_mode(model.kind)

    operands = []
    n_table = 0
    n_table_chunks = 0
    if model.kind.endswith("historical"):
        table2d, n_table = _pad_table(model.returns_pct)
        n_table_chunks = int(table2d.shape[0])
        operands.append(table2d)
    if keep is not None:
        operands.append(jnp.asarray(keep, jnp.float32).reshape(-1, 1))

    tail_n = n_table - 128 * (n_table_chunks - 1) if n_table else 0
    iscal = jnp.stack([
        _seed_base_i32(root_key),
        jax.lax.bitcast_convert_type(
            jnp.asarray(path_offset, jnp.uint32) // jnp.uint32(TILE_PATHS),
            jnp.int32,
        ),
        jnp.asarray(valid, jnp.int32),
        jnp.asarray(n_table, jnp.int32),
        jnp.asarray(tail_n, jnp.int32),
        jnp.int32(0), jnp.int32(0), jnp.int32(0),
    ])
    mean = getattr(model, "mean_pct", 0.0)
    std = getattr(model, "std_pct", 0.0)
    fscal = jnp.stack([
        jnp.asarray(v0, jnp.float32),
        1.0 + jnp.asarray(mean, jnp.float32) * 0.01,
        jnp.asarray(std, jnp.float32) * 0.01,
        jnp.float32(0), jnp.float32(0), jnp.float32(0), jnp.float32(0),
        jnp.float32(0),
    ])
    ab = jnp.stack([
        jnp.asarray(coef_a, jnp.float32), jnp.asarray(coef_b, jnp.float32)
    ], axis=1)

    strategy_kind = strategy.kind if keep is not None else "none"
    call = _build_bands_call(
        model.kind, strategy_kind, n_periods, n_table_chunks, n_cells,
        ntiles, interpret, prng_impl(),
    )
    mhist = call(iscal, fscal, ab, *operands)
    return mhist.reshape(n_periods, nhi_pad * LO_W)[:, :n_cells]
