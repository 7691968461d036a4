"""Fused Pallas simulation kernels — the TPU analog of the reference's
optimized CUDA path (src/simulations.cu:112-247), redesigned for the VPU/MXU.

One grid step simulates a *tile* of 8192 paths held entirely in vector
registers: per month it draws random bits from the TPU hardware PRNG (or
folds Sobol direction numbers), maps them to a return, and compounds — no
HBM traffic inside the month loop. This is what the reference's
shared-memory returns table + per-thread xorshift kernel
(src/simulations.cu:123-150) becomes when "shared memory" is VMEM/registers
and "a thread" is a vector lane.

Per tile the kernel also emits partial statistic rows (sum, sum², sum³,
sum⁴, min, max, count-below, withdrawn — each lane-reduced to (1,128)), the
exact-merge upgrade of the reduceBlock per-block mean/variance kernel
(src/simulations.cu:185-247), plus a per-tile (64,64) final-value histogram
accumulated on the MXU as a factorized one-hot matmul rather than a
scatter (``histogram=False`` in EngineOptions skips it — the reference's
reduceBlock computes only mean/variance). Final values still go to HBM
once (4 B/path) for keep_finals/bands consumers.

Reproducibility: the hardware PRNG is seeded per tile from
(seed, global_tile_index) with the same SplitMix finalizer as
ops/rng.tile_seed, so tiles are independent streams and results are
invariant to chunking and sharding. Gaussian inverse-CDF sampling uses a
branch-free erfinv polynomial; uniforms take the top 23 bits of each draw
as (cnt+0.5)/2^23, which keeps u strictly inside (0,1) at float32.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stock_market_monte_carlo_tpu.ops import histogram as hist_ops

TILE_ROWS = 64
TILE_PATHS = TILE_ROWS * 128  # == ops.rng.KEY_TILE: one RNG tile per grid step

_SQRT2 = 1.4142135623730951
_U23 = float(2.0**-23)

# stat row indices in the per-tile partials block
_ROWS = ("sum", "sum_sq", "sum_cube", "sum_quart", "min", "max",
         "count_below", "withdrawn")
N_PARTIAL_ROWS = len(_ROWS)


def interpret_mode(kind: str, rng_mode: str = "counter"):
    """Interpret-mode selector for a kernel family.

    ``False`` on real TPU hardware (compiled Mosaic). Elsewhere:

    - Sobol kernels and the reference-parity PRNG kernel fold their
      streams arithmetically (no hardware PRNG), so plain interpret mode
      executes them with FULL fidelity — sharded runs on the virtual CPU
      mesh reproduce the exact per-path values.
    - The hardware-PRNG kernels (counter-mode historical/Gaussian, CLT)
      need the TPU-semantics interpreter (``pltpu.InterpretParams``):
      ``prng_random_bits`` there is a deterministic all-zeros stub (a
      documented TODO in jax's interpret_pallas_call.py), so values are
      degenerate-but-defined — the full dataflow, masking, strategy,
      histogram and shard_map composition still execute and can be
      checked for single-vs-multi-device identity.
    """
    if jax.default_backend() == "tpu":
        return False
    if kind.startswith("sobol") or rng_mode == "reference":
        return True
    if prng_impl() == "arith":
        # the arithmetic counter stream needs no hardware PRNG — plain
        # interpret mode executes the counter-mode kernels with FULL
        # fidelity (nonzero, sharding-invariant bits) on CPU
        return True
    return pltpu.InterpretParams()


def prng_impl() -> str:
    """Bit source for the counter-mode kernels.

    - ``"hw"`` (default): the TPU hardware PRNG
      (``pltpu.prng_seed``/``prng_random_bits``) — the production
      stream; off-TPU it only runs under the TPU-semantics interpreter
      whose ``prng_random_bits`` is an all-zeros stub.
    - ``"arith"`` (``SMMC_PRNG_IMPL=arith``): `_arith_bits` — a counter
      stream computed with plain int32 vector math, deterministic in
      (tile seed, draw key, element position) ONLY. It therefore runs
      with full fidelity everywhere (plain interpret on CPU, compiled
      Mosaic on TPU) and must be bit-identical under any sharding /
      chunking — the stream that proves the PRODUCTION kernels' seeding
      path (`_tile_seed_i32` keying, masking, merge) produces nonzero
      sharded == single-device results (tests/test_pallas_mesh.py),
      closing the zeros-stub gap of the hw interpreter.

    NOT the same stream as "hw" (the hardware generator is opaque), so
    the value is resolved per kernel build, participates in every
    builder/engine cache key, and tags the checkpoint fingerprint
    (engine.simulate_stats) to refuse cross-impl resume.
    """
    impl = os.environ.get("SMMC_PRNG_IMPL", "hw")
    if impl not in ("hw", "arith"):
        raise ValueError(
            f"SMMC_PRNG_IMPL must be 'hw' or 'arith', got {impl!r}")
    return impl


def _arith_bits(seed_i32, key_i32, shape):
    """int32 bits for the "arith" impl: splitmix-style finalizer over
    (tile seed, draw key) then per-element position — same finalizer
    constants as `_tile_seed_i32`. Pure int32 vector math (mul/xor/
    logical shift), so the stream is identical on every backend."""
    h = _tile_seed_i32(seed_i32, key_i32)
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    x = h + (r * jnp.int32(shape[-1]) + c) * jnp.int32(-1640531527)
    x = (x ^ _shr(x, 16)) * jnp.int32(-2048144789)
    x = (x ^ _shr(x, 13)) * jnp.int32(-1028477387)
    return x ^ _shr(x, 16)


class _TileRng:
    """Per-tile bit source used by every counter-mode kernel.

    "hw": construction seeds the hardware PRNG; ``bits`` maps straight
    to ``pltpu.prng_random_bits`` (the jaxpr is identical to the
    pre-wrapper kernels, so the remote Mosaic cache stays valid).
    "arith": ``bits`` hashes (seed, draw key, position); ``key`` — the
    month/block index — keys draws made inside ``lax`` loops where a
    Python call counter would freeze at trace time. hw ignores ``key``
    (its stream is sequential by construction)."""

    def __init__(self, seed_i32, impl: str):
        self._arith = impl == "arith"
        self._seed = seed_i32
        self._calls = 0
        if not self._arith:
            pltpu.prng_seed(seed_i32)

    def bits(self, shape, key=None):
        if not self._arith:
            return pltpu.prng_random_bits(shape)
        k = jnp.int32(self._calls) if key is None else key
        self._calls += 1
        return _arith_bits(self._seed, k, shape)


def _erfinv_poly(x):
    """Branch-free single-precision erfinv (same polynomial as
    ops/normal.erfinv_f32, inlined for the kernel)."""
    w = -jnp.log1p(-(x * x))
    wc = w - 2.5
    p = jnp.float32(2.81022636e-08)
    for c in (3.43273939e-07, -3.5233877e-06, -4.39150654e-06,
              0.00021858087, -0.00125372503, -0.00417768164,
              0.246640727, 1.50140941):
        p = jnp.float32(c) + p * wc
    wt = jnp.sqrt(w) - 3.0
    q = jnp.float32(-0.000200214257)
    for c in (0.000100950558, 0.00134934322, -0.00367342844,
              0.00573950773, -0.0076224613, 0.00943887047,
              1.00167406, 2.83297682):
        q = jnp.float32(c) + q * wt
    return jnp.where(w < 5.0, p, q) * x


def _u23_from_bits(bits_i32):
    """Top 23 bits -> u = (cnt + 0.5) * 2^-23, strictly inside (0,1).

    23 bits (not 24) so that 2u-1 = +/-(1 - 2^-23) stays representable below
    1.0f — at 24 bits the extreme code rounds to exactly 1.0 and the ICDF
    blows up.
    """
    cnt = jax.lax.shift_right_logical(bits_i32, 9)
    return (cnt.astype(jnp.float32) + 0.5) * jnp.float32(_U23)


def _shr(x, n):
    return jax.lax.shift_right_logical(x, jnp.int32(n))


def _tile_seed_i32(seed_base_i32, tile_i32):
    """SplitMix finalizer over (seed, tile) — bit-identical to
    ops/rng.tile_seed but in int32 (scalar bitcasts don't lower in Mosaic;
    int32 mul/xor/logical-shift have the same bit semantics as uint32)."""
    x = (seed_base_i32 * jnp.int32(-1640531527)) ^ tile_i32  # 0x9E3779B9
    x = (x ^ _shr(x, 16)) * jnp.int32(-2048144789)           # 0x85EBCA6B
    x = (x ^ _shr(x, 13)) * jnp.int32(-1028477387)           # 0xC2B2AE35
    return x ^ _shr(x, 16)


def _pcg_hash_i32(x):
    """rand_pcg as int32 vector math (reference src/simulations.cu:62-67;
    the hash-of-input form — see ops/rng.pcg_hash)."""
    amt = jax.lax.shift_right_logical(x, jnp.int32(28)) + jnp.int32(4)
    word = (jax.lax.shift_right_logical(x, amt) ^ x) * jnp.int32(277803737)
    return jax.lax.shift_right_logical(word, jnp.int32(22)) ^ word


def _xorshift_i32(y):
    """Liao xorshift step (reference src/simulations.cu:70-76)."""
    y = y ^ (y << jnp.int32(11))
    y = y ^ jax.lax.shift_right_logical(y, jnp.int32(7))
    return y ^ jax.lax.shift_right_logical(y, jnp.int32(12))


def _bootstrap_idx_exact_i32(st, n_i32):
    """idx = floor(n * u32 / 2^32) via 16-bit split (exact for n < 2^15);
    integer form of the reference's float mapping (src/simulations.cu:148).
    Matches ops/rng.bootstrap_index_exact bit for bit. ``n_i32`` may be a
    scalar or a per-lane vector (values < 2^15)."""
    h = jax.lax.shift_right_logical(st, jnp.int32(16))
    lo = st & jnp.int32(0xFFFF)
    return jax.lax.shift_right_logical(
        n_i32 * h + jax.lax.shift_right_logical(n_i32 * lo, jnp.int32(16)),
        jnp.int32(16),
    )


def _sliced_rotation_draw(rows, ll, n_valid, n_i32, tail_n, k_chunks,
                          w_bits, ablate=""):
    """One month's sliced-rotation bootstrap draw — THE stream-defining
    recipe, shared by the stats kernel (_build_kernel) and the fused band
    kernel (ops/pallas_bands.py) so their streams can never fork. Any
    change here changes every historical counter-mode stream: bump the
    streams tag in engine.simulate_stats' fingerprint and update the
    numpy replica in tests/test_rng.py.

    ONE within-row gather per path-month instead of ceil(n_table/128):
    each lane plays two independent roles from one PRNG word W.

      Source role (lane s): chunk c'_s uniform over the n_s valid chunks
      of column s (n_s = K for s < tail_n else K-1), drawn from the
      wrap-around residual r = W*n (independent of floor(n*W/2^32) to
      ~n/2^32); combined[s] = G[c'_s, s] by a chain of K chunk-row
      selects (no gathers; padding is never selected because c'_s < n_s).

      Dest role (lane l): idx = floor(n*W/2^32). With probability
      tail_n/n (flag: idx < tail_n) gather column w = idx (uniform over
      the tall columns); otherwise gather at a per-row random rotation
      w = (l + b_r) & 127.

    Exactness (any n): P(w=j) = 1/n + (n-tail_n)/(128n) = K/n for
    j < tail_n, (K-1)/n otherwise; times P(c'_j = c) = 1/n_j gives
    P(entry) = 1/n uniformly. Rotation makes row-mates collision-free,
    so the cross-path joint is slightly SUB-iid (pair collision ~7.9e-4
    vs iid 8.9e-4 at n=1127) — estimator variance is never inflated. The
    reference kernel's recipe costs the full chunk scan and is kept in
    rng='reference' parity mode (src/simulations.cu:144-150).

    ``w_bits`` is the month's PRNG word, drawn by the caller's _TileRng
    immediately before the call (same op position as the old in-function
    ``pltpu.prng_random_bits``, so the "hw" jaxpr — and the remote
    Mosaic cache — is unchanged); passing it in lets the arithmetic
    counter stream (prng_impl "arith") reuse this exact recipe.

    ``ablate`` keeps the roofline stage-attribution hooks
    (experiments/exp_hist_roofline.py): each variant is statistically
    WRONG and exists only for timing deltas.
    """
    if ablate == "nodraw":
        return rows[0]
    if ablate == "drawonly":
        return 1.0 + w_bits.astype(jnp.float32) * 1e-12
    # source: combined[s] = G[c'_s, s]
    r_res = w_bits * n_i32               # wrap mul == low 32 bits
    cprime = _bootstrap_idx_exact_i32(r_res, n_valid)
    comb = rows[0]
    if ablate != "nosource":
        for c in range(1, k_chunks):
            comb = jnp.where(cprime == c, rows[c], comb)
    # dest: column choice
    idx_dest = _bootstrap_idx_exact_i32(w_bits, n_i32)
    b_row = w_bits[:, 0:1] & jnp.int32(127)
    w_rot = (ll + b_row) & jnp.int32(127)
    w_col = jnp.where(idx_dest < tail_n, idx_dest, w_rot)
    if ablate == "nogather":
        return comb + w_col.astype(jnp.float32) * 1e-12
    return jnp.take_along_axis(comb, w_col, axis=1)


def _kernel_bin_indices(values, mask, log_lo, inv_w, hb):
    """Log-space bin index for the in-kernel MXU histograms.

    MUST stay bit-compatible with ops/reductions.HistogramSpec.bin_index
    (used by the XLA odd-bin fallback and every histogram query): interior
    bins clip to [1, hb-1], values below the lower edge map to 0, masked
    padding maps to hb (discarded by the one-hot build / the [:hb] slice).
    The one intentional delta: the underflow test compares logv < log_lo
    rather than v < lo — identical except ±1 ulp at the exact bin edge,
    where CDF-level jitter of one count is accepted by the parity tests.
    """
    logv = jnp.log(jnp.maximum(values, 1e-37))
    raw = jnp.floor((logv - log_lo) * inv_w).astype(jnp.int32) + 1
    bins = jnp.clip(raw, 1, hb - 1)
    bins = jnp.where(logv < log_lo, 0, bins)
    return jnp.where(mask, bins, hb)


def _build_kernel(kind: str, strategy_kind: str, n_periods: int,
                  n_table_chunks: int, rng_mode: str = "counter",
                  sobol_deep: bool = False, with_hist: bool = True,
                  ablate: str = "", impl: str = "hw"):
    """Kernel specialized on (model kind, strategy kind, horizon).

    Ref layout (inputs then outputs):
      iscal (SMEM i32 (8,)): seed_base, tile0, valid, n_table, tail_n,
                             sobol_off_lo, sobol_off_hi, n_hist_total
      fscal (SMEM f32 (8,)): v0, a, b, amount, target, hist_log_lo,
                             hist_inv_width, moment_shift
      [table (C,128) f32 VMEM]                    historical kinds
      [dir (T,32) i32 SMEM, shift (T,1) i32 SMEM] sobol kinds
      [keep (T,1) f32 SMEM]                       percent strategies
      finals (TILE_ROWS,128) f32 VMEM out
      partials (N_PARTIAL_ROWS,128) f32 VMEM out
      hist (64,64) f32 VMEM out — in-kernel MXU histogram (the XLA
        one-hot epilogue on HBM finals measured 29-37 ms per 2^24 chunk;
        in-kernel the same counts cost ~1/3 of that: the one-hots stay in
        VMEM and their latency hides under the month loop's VPU work)
    """
    is_sobol = kind.startswith("sobol")
    is_hist = kind.endswith("historical")
    has_keep = strategy_kind in ("fixed_percent", "variable_percent")
    is_fixed_amt = strategy_kind == "fixed_amount"

    def kernel(*refs):
        it = iter(refs)
        iscal = next(it)
        fscal = next(it)
        table_ref = next(it) if is_hist else None
        dir_ref = next(it) if is_sobol else None
        shift_ref = next(it) if is_sobol else None
        keep_ref = next(it) if has_keep else None
        finals_ref = next(it)
        partials_ref = next(it)
        hist_ref = next(it) if with_hist else None

        pid = pl.program_id(0)
        tile = iscal[1] + pid
        v0, a, b = fscal[0], fscal[1], fscal[2]
        amount, target = fscal[3], fscal[4]
        n_table_f = iscal[3].astype(jnp.float32)

        if not is_sobol and rng_mode != "reference":
            # reference-parity mode derives its xorshift streams from the
            # global path id arithmetically and never touches the hardware
            # PRNG — skipping the seed keeps that kernel runnable with
            # full fidelity under plain interpret mode on CPU
            rng = _TileRng(_tile_seed_i32(iscal[0], tile), impl)
        else:
            rng = None

        # local path ids within the chunk: tile-major, row-major
        rr = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 128), 0)
        ll = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 128), 1)
        local_id = pid * TILE_PATHS + rr * 128 + ll

        if is_sobol:
            # global sequence position -> gray code, folded per dimension
            # (int32 bit-ops, same patterns as uint32)
            gid = tile * jnp.int32(TILE_PATHS) + (rr * 128 + ll)
            if sobol_deep:
                # 64-bit sequence index (i8_sobol depth, reference
                # include/sobol/sobol.cpp:14191): base offset words in
                # iscal[5:7]; carry via unsigned compare in int32
                off_lo, off_hi = iscal[5], iscal[6]
                lo = off_lo + gid
                sgn = jnp.int32(-2147483648)
                carry = ((lo ^ sgn) < (off_lo ^ sgn)).astype(jnp.int32)
                hi = off_hi + carry
                glo = lo ^ (_shr(lo, 1) | (hi << jnp.int32(31)))
                ghi = hi ^ _shr(hi, 1)
            else:
                glo = gid ^ _shr(gid, 1)
                ghi = None

        def sobol_acc(t):
            acc = jnp.zeros((TILE_ROWS, 128), jnp.int32)
            for bit in range(32):
                d = dir_ref[t, bit]
                take = (_shr(glo, bit) & jnp.int32(1)) > 0
                acc = jnp.where(take, acc ^ d, acc)
            if sobol_deep:
                for bit in range(32):
                    d = dir_ref[t, 32 + bit]
                    take = (_shr(ghi, bit) & jnp.int32(1)) > 0
                    acc = jnp.where(take, acc ^ d, acc)
            return acc ^ shift_ref[t, 0]

        def uniforms(t):
            if not is_sobol:
                return _u23_from_bits(rng.bits((TILE_ROWS, 128), key=t))
            return _u23_from_bits(sobol_acc(t))

        if is_hist:
            # chunk rows broadcast once, loop-invariant (VMEM-resident)
            rows = [
                jnp.broadcast_to(
                    table_ref[c, :][None, :], (TILE_ROWS, 128)
                )
                for c in range(n_table_chunks)
            ]

        def table_lookup(idx):
            within = idx & 127
            chunk = jax.lax.shift_right_logical(idx, 7)
            val = jnp.zeros((TILE_ROWS, 128), jnp.float32)
            for c in range(n_table_chunks):
                g = jnp.take_along_axis(rows[c], within, axis=1)
                val = jnp.where(chunk == c, g, val)
            return val

        # kernel-stage attribution for the roofline analysis
        # (experiments/exp_hist_roofline.py): "nosource" drops the
        # source-role chunk selection (always rows[0] — WRONG stats),
        # "nogather" drops the within-row gather, "drawonly" maps bits
        # straight to a growth factor, "nodraw" uses a constant growth.
        # Each variant is a fresh process+compile; results are invalid
        # statistically and exist only for timing deltas. The value
        # arrives as an explicit builder arg (read from SMMC_HIST_ABLATE
        # at the pallas_chunk_stats call site) so it participates in the
        # lru caches and a mid-process env change can never hand back a
        # stale kernel under the wrong label.
        _hist_ablate = ablate

        if is_hist and not is_sobol and rng_mode == "counter":
            # "Sliced rotation" bootstrap — recipe, exactness proof, and
            # stream contract live on _sliced_rotation_draw (shared with
            # the fused band kernel so the streams can never fork).
            n_i32 = iscal[3]
            tail_n = iscal[4]
            k_chunks = n_table_chunks
            n_valid = jnp.where(
                ll < tail_n, jnp.int32(k_chunks), jnp.int32(k_chunks - 1)
            )

            def growth(t):
                # the month index keys only the "arith" stream (hw is
                # sequential and ignores it)
                return _sliced_rotation_draw(
                    rows, ll, n_valid, n_i32, tail_n, k_chunks,
                    rng.bits(ll.shape, key=t), ablate=_hist_ablate,
                )
        else:
            def growth(t):
                if is_hist:
                    # sobol-historical (the only kind reaching here with
                    # is_hist): the EXACT integer index map on the raw
                    # Sobol word — bit-identical to the XLA path
                    # (ops/rng.bootstrap_index_exact), where a float
                    # u*n map flipped indices at +-1-ulp boundaries
                    return table_lookup(
                        _bootstrap_idx_exact_i32(sobol_acc(t), iscal[3])
                    )
                u = uniforms(t)
                z = jnp.float32(_SQRT2) * _erfinv_poly(2.0 * u - 1.0)
                return a + b * z

        def apply_strategy(t, total, wsum, gfac):
            grown = total * gfac
            if strategy_kind == "none":
                return grown, wsum
            if has_keep:
                keep = keep_ref[t, 0]
                new = grown * keep
                return new, wsum + (grown - new)
            if is_fixed_amt:
                new = jnp.maximum(grown - amount, 0.0)
                return new, wsum + (grown - new)
            raise AssertionError(strategy_kind)

        v0_tile = jnp.full((TILE_ROWS, 128), 1.0, jnp.float32) * v0
        w0_tile = jnp.zeros((TILE_ROWS, 128), jnp.float32)

        # Partial unroll: processing UNROLL months per fori iteration lets
        # Mosaic overlap the next month's PRNG draw / gathers with the
        # current month's arithmetic (~15% measured on the CLT kernel).
        # Months beyond the horizon are masked out of both value and
        # withdrawal state.
        UNROLL = 8  # 16 measured slower for the sliced historical kernel (0.585 vs 0.545 s)
        n_iters = -(-n_periods // UNROLL)
        # when the horizon fills the unroll exactly (e.g. 360 = 45*8),
        # every unrolled month is live: the dead-month select pair and the
        # index clamp are provably no-ops and are elided
        exact_fit = n_periods % UNROLL == 0

        def guarded_step(t, total, wsum, gfac):
            if exact_fit:
                return apply_strategy(t, total, wsum, gfac)
            tc = jnp.minimum(t, n_periods - 1)
            new_total, new_wsum = apply_strategy(tc, total, wsum, gfac)
            live = t < n_periods
            return (jnp.where(live, new_total, total),
                    jnp.where(live, new_wsum, wsum))

        if rng_mode == "reference":
            # the reference GPU kernel's exact recipe per global path id:
            # state0 = rand_pcg(id + 1), one xorshift per month
            # (src/simulations.cu:140-150)
            gid = tile * jnp.int32(TILE_PATHS) + (rr * 128 + ll)
            n_i32 = iscal[3]

            def body_ref(i, carry):
                total, wsum, st = carry
                for s in range(UNROLL):
                    t = i * UNROLL + s
                    st_new = _xorshift_i32(st)
                    # freeze the stream on padded months so draw counts
                    # match the reference exactly
                    st = (st_new if exact_fit
                          else jnp.where(t < n_periods, st_new, st))
                    gfac = table_lookup(
                        _bootstrap_idx_exact_i32(st, n_i32)
                    )
                    total, wsum = guarded_step(t, total, wsum, gfac)
                return total, wsum, st

            total, wsum, _ = jax.lax.fori_loop(
                0, n_iters, body_ref,
                (v0_tile, w0_tile, _pcg_hash_i32(gid + jnp.int32(1))),
            )
        else:
            def body(i, carry):
                total, wsum = carry
                for s in range(UNROLL):
                    t = i * UNROLL + s
                    # clamp the month index for table-indexed reads (sobol
                    # direction rows, keep factors); the guard masks the
                    # padded months' effects
                    tc = t if exact_fit else jnp.minimum(t, n_periods - 1)
                    total, wsum = guarded_step(t, total, wsum, growth(tc))
                return total, wsum

            total, wsum = jax.lax.fori_loop(
                0, n_iters, body, (v0_tile, w0_tile)
            )

        finals_ref[:] = total

        mask = local_id < iscal[2]
        # moments accumulate on total/v0, centered about the analytic
        # shift in fscal[7] (engine.analytic_moment_shift): f32 sums of
        # x^4 overflow past ~3e38 at large initial capital, and centering
        # keeps the variance extraction well-conditioned; the host merge
        # restores raw sums and absolute units in float64 (engine._absorb)
        inv0 = 1.0 / v0
        tot_s = total * inv0
        f = jnp.where(mask, tot_s - fscal[7], 0.0)
        f2 = f * f

        def rowsum(x):
            return jnp.sum(x, axis=0, keepdims=True)

        partials_ref[:] = jnp.concatenate([
            rowsum(f),
            rowsum(f2),
            rowsum(f2 * f),
            rowsum(f2 * f2),
            jnp.min(jnp.where(mask, tot_s, jnp.inf), axis=0, keepdims=True),
            jnp.max(jnp.where(mask, tot_s, -jnp.inf), axis=0,
                    keepdims=True),
            rowsum(jnp.where(mask & (total < target), 1.0, 0.0)),
            rowsum(jnp.where(mask, wsum * inv0, 0.0)),
        ], axis=0)

        if not with_hist:
            # stats-only mode: the reference's reduceBlock computes only
            # mean/variance (src/simulations.cu:185-247) — skipping the
            # binning + one-hot contraction saves ~30 ms per 2^24 chunk
            return
        # In-kernel histogram on the (TILE_ROWS,128) layout. The one-hot
        # matmul needs the tile's bins as ONE row so the contraction runs
        # over all TILE_PATHS at once (64 per-row mini-gemms measured as
        # slow as the XLA epilogue; a (P,1)-column standalone kernel was
        # worse still, 52.6 ms/2^24, and a (64,128)->(8192,1) reshape does
        # not lower in Mosaic). Concatenating the 64 row-slices along the
        # LANE axis is the relayout-free flatten: 64 VMEM copies produce
        # flat (1, 8192), and both one-hots build from it directly in the
        # transposed (64, P) orientation, so the single big contraction is
        # a native NT gemm. hb (= n_bins+2) arrives at runtime in
        # iscal[7]: real bins clip to [0, hb-1], padding maps to hb,
        # whose counts land past position hb-1 of the flattened (4096,)
        # block (hb==4096: hi=64 has no one-hot row) — the host-side
        # [:hb] slice drops them either way.
        hb = iscal[7]
        bins = _kernel_bin_indices(total, mask, fscal[5], fscal[6], hb)
        hi_b = bins >> 6
        lo_b = bins & 63
        rio = jax.lax.broadcasted_iota(jnp.int32, (64, 128), 0)
        # per-row broadcast-compares produce full-height (64,128) pieces
        # (all at sublane offset 0, unlike (1,128) bin slices, which
        # Mosaic refuses to lane-concat); gluing the PIECES along lanes
        # yields the (64, TILE_PATHS) transposed one-hots directly
        oh_hi_t = jnp.concatenate(
            [(hi_b[r:r + 1, :] == rio).astype(jnp.bfloat16)
             for r in range(TILE_ROWS)], axis=1,
        )
        oh_lo_t = jnp.concatenate(
            [(lo_b[r:r + 1, :] == rio).astype(jnp.bfloat16)
             for r in range(TILE_ROWS)], axis=1,
        )
        hist_ref[:] = jax.lax.dot_general(
            oh_hi_t, oh_lo_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return kernel


# ---------------------------------------------------------------------------
# CLT "turbo" Gaussian sampler.
#
# Instead of one inverse-CDF per (path, month), a tile draws a (P, K) block
# of 16-bit uniforms and mixes it through a fixed random orthogonal matrix Q
# on the MXU: z = u @ Q. Each z column is a weighted sum of K i.i.d.
# uniforms — exactly mean 0 / variance 1 / zero skew, with excess kurtosis
# -1.2/K per month that is further suppressed by the T-month convolution of
# the compound product. Q is *random* orthogonal (not Hadamard: the Walsh
# closure H_ij H_ik = H_{i,j^k} creates 4th-order cross-moments between
# months of a block — measured as a K-proportional variance deficit — which
# a generic orthogonal matrix does not have). Q is stored in bf16 and the
# per-column scale correction sqrt(12)/||q_col||_bf16 restores unit variance
# exactly.
#
# Layout is path-per-row (P, K): months of a block live in lanes, so the
# final-value histogram one-hots are (P, 64) matmuls with no relayout, and
# the whole tile's histogram is accumulated on the MXU in-kernel.
# ---------------------------------------------------------------------------

CLT_P = 4096        # paths per CLT tile (plain compounding)
CLT_TS = 1     # tiles per grid step (plain kernel). TS=2 measured a
#                15% win on raw repeated pallas calls (60.0 vs 70.3 ms
#                per 2^24 chunk, same session) but was NEUTRAL-TO-WORSE
#                through the engine's pipelined dispatch (0.413 s vs the
#                0.383-0.393 s TS=1 control, ~3% machine drift adjusted)
#                — the larger per-step output blocks cost more grid-level
#                overlap than the per-step fixed cost they save. Streams
#                are per-tile, so any TS gives bit-identical results.
#                RE-MEASURED under the v14 deferred-absorb dispatch
#                (experiments/exp_clt_ts.py, 2026-08-18): TS=2 no longer
#                even fits the default 16MB scoped-VMEM stack (18.26M —
#                the kernel grew centered sums + the MXU histogram since
#                the original probe); with vmem_limit_bytes=28M it
#                compiles but the K=6-batched device time is WORSE
#                (53.95 vs 39.61 ms/chunk same-batch, results
#                bit-identical). TS=1 stays.
CLT_P_STRATEGY = 2048  # paths per tile with withdrawal strategies —
#                       P=4096 blows the 16 MB scoped-VMEM limit with
#                       either prefix implementation (22 MB with the
#                       roll chain's ~7 live (P,K) buffers; re-probed
#                       23.85 MB with the MXU log-prefix, whose f32
#                       matmul stack dominates); halving P fits
CLT_K = 128    # months per block = mixing dimension

# sha256 of the vendored _clt_q128.npy bytes (the CLT sample stream's
# defining constant — see _clt_qmatrix)
_CLT_Q128_SHA256 = (
    "b8f8958ee25e0a8a4c30671c945a3d87cb71a666292d0ae5dee9353161e36907"
)


@lru_cache(maxsize=4)
def _clt_qmatrix(k: int):
    """(Q_bf16, colscale_base, colshift_base).

    The kernel feeds *uncentered* bf16 counts straight into the matmul and
    folds the centering and scaling into per-column constants:

        z_j = (cnt @ Q)_j * colscale_j - colshift_j

    where the constants are the EXACT affine map making z mean-0/var-1 for
    cnt uniform over [0, 2^16) (see the in-body derivation: E[cnt] is
    32767.5, not 2^15, and Var picks up the discrete (1 - 2^-32) factor).
    All constants use the f64 column sums/norms of the bf16-rounded Q.
    (Feeding the raw signed words with no shift — u-1/2 = w*2^-32
    exactly — measured SLOWER, 0.39 s vs 0.36 s: the full-range
    int32->bf16 convert costs more than shift + narrow convert.)
    """
    import os

    import ml_dtypes

    # Q is VENDORED (bf16 bit pattern, 32 KB): np.linalg.qr's output is
    # LAPACK-implementation-dependent (Householder sign/rounding), which
    # would break the machine-portable determinism the counter-based RNG
    # promises — a checkpoint written under OpenBLAS must resume under MKL
    # bit-identically. Regenerate (new stream!) with:
    #   python -c "import numpy as np, ml_dtypes;
    #     q,_ = np.linalg.qr(np.random.default_rng(0x51C7)
    #                        .standard_normal((128,128)));
    #     np.save('stock_market_monte_carlo_tpu/ops/_clt_q128.npy',
    #             q.astype(ml_dtypes.bfloat16).view(np.uint16))"
    assert k == 128, k
    qpath = os.path.join(os.path.dirname(__file__), "_clt_q128.npy")
    with open(qpath, "rb") as f:
        raw = f.read()
    import hashlib

    digest = hashlib.sha256(raw).hexdigest()
    if digest != _CLT_Q128_SHA256:
        # a corrupted or casually regenerated Q silently changes every CLT
        # sample stream without tripping the streams3 checkpoint tag — fail
        # loudly instead (regeneration is a deliberate act: update BOTH the
        # file and this digest, and bump the streams tag in engine.py)
        raise RuntimeError(
            f"_clt_q128.npy sha256 mismatch: got {digest}, expected "
            f"{_CLT_Q128_SHA256}. The vendored CLT mixing matrix defines "
            "the sample stream; if it was regenerated on purpose, update "
            "_CLT_Q128_SHA256 and bump the engine checkpoint streams tag."
        )
    import io

    bits = np.load(io.BytesIO(raw))
    q_bf16 = bits.view(ml_dtypes.bfloat16)
    q_f64 = q_bf16.astype(np.float64)
    colnorm = np.sqrt((q_f64 ** 2).sum(axis=0))
    colsum = q_f64.sum(axis=0)
    # exact affine constants for u = cnt*2^-16 - 1/2, cnt uniform over
    # [0, 2^16): E[u] = -2^-17 (NOT zero — E[cnt] = 32767.5) and
    # Var(u) = (1 - 2^-32)/12, so
    #   z_j = (cnt@Q)_j * colscale_j - colshift_j
    # with s = sqrt(12/(1-2^-32)) has exactly mean 0 / variance 1.
    s_corr = np.sqrt(12.0 / (1.0 - 2.0**-32))
    colscale = (2.0**-16 * s_corr / colnorm).astype(np.float32)
    colshift = (32767.5 * 2.0**-16 * s_corr * colsum
                / colnorm).astype(np.float32)
    return np.asarray(q_bf16), colscale[None, :], colshift[None, :]


def clt_prefix_impl() -> str:
    """Which exclusive-prefix implementation the clt-prefix strategy
    kernel traces: 'mxu' (default — log-space prefix as one strictly-
    lower-triangular (128,128) f32 matmul; 100M x 360 fixed-percent
    0.77 s, withdrawn rel err 1.7e-6) or 'roll' (the 7-step Hillis-
    Steele roll chain it replaced; 1.04 s, 4.8e-6, same session —
    experiments/exp_clt_prefix_mxu.py). The PRNG stream is identical
    either way; only float rounding of the withdrawn total differs, so
    the checkpoint fingerprint carries this tag (engine.simulate_stats)
    to refuse cross-implementation resume."""
    import os as _os2

    impl = _os2.environ.get("SMMC_CLT_PREFIX", "mxu")
    if impl not in ("mxu", "roll"):
        # an unrecognized value (typo, wrong case) must not silently
        # select a fallback implementation with different withdrawn-total
        # rounding under a mislabeled checkpoint tag
        raise ValueError(
            f"SMMC_CLT_PREFIX must be 'mxu' or 'roll', got {impl!r}"
        )
    return impl


def hist_ablate_mode() -> str:
    """The historical-kernel ablation mode from SMMC_HIST_ABLATE —
    roofline-attribution variants that compute WRONG statistics
    (experiments/exp_hist_roofline.py). Validated here, warned loudly,
    and passed as an explicit builder arg so it keys every kernel cache;
    engine.simulate_stats refuses to checkpoint while one is active."""
    import os as _os3

    mode = _os3.environ.get("SMMC_HIST_ABLATE", "")
    if mode not in ("", "nodraw", "drawonly", "nosource", "nogather"):
        raise ValueError(
            "SMMC_HIST_ABLATE must be one of nodraw/drawonly/nosource/"
            f"nogather (or unset), got {mode!r}"
        )
    if mode:
        import warnings

        warnings.warn(
            f"SMMC_HIST_ABLATE={mode}: historical-kernel statistics are "
            "intentionally WRONG (roofline timing variant)",
            stacklevel=2,
        )
    return mode


def clt_finals_free() -> bool:
    """Whether the statsonly/MXU-hist CLT path skips the per-path finals
    output entirely (SMMC_CLT_FINALSFREE=1) — the v15 law-kernel trade
    applied to the CLT kernel: identical PRNG streams and moment/histogram
    contract, no (P,1) finals block per grid step. Keyed into every
    builder/engine cache like the other env-resolved trace knobs."""
    return os.environ.get("SMMC_CLT_FINALSFREE", "0") == "1"


def _build_clt_kernel(n_periods: int, n_hist_total: int,
                      with_strategy: bool = False,
                      with_hist: bool = True,
                      keep_fold: bool = False,
                      prefix_impl: str = "mxu",
                      impl: str = "hw",
                      finals_free: bool = False):
    """``with_strategy`` enables multiplicative withdrawal strategies at
    CLT speed: per-month keep fractions fold into the per-block (1,K)
    affine constants (finals are free), and the per-path withdrawn total
    comes from an exclusive lane prefix product per block — by default a
    log-space strictly-lower-triangular MXU matmul (clt_prefix_impl) —
    the reference has no withdrawal support at all (README.md:130-133
    TODO)."""
    P = CLT_P_STRATEGY if with_strategy else CLT_P
    K = CLT_K
    nblocks = -(-n_periods // K)

    TS = 1 if with_strategy else CLT_TS

    def kernel(*refs):
        it = iter(refs)
        iscal, fscal, q_ref, cs_ref, sh_ref = (next(it) for _ in range(5))
        keep_ref = next(it) if (with_strategy or keep_fold) else None
        finals_ref = None if finals_free else next(it)
        partials_ref = next(it)
        hist_ref = next(it) if with_hist else None
        pid = pl.program_id(0)
        a, b, target = fscal[1], fscal[2], fscal[4]
        v0 = fscal[0]
        log_lo, inv_w = fscal[5], fscal[6]
        q = q_ref[:]

        # growth = a + b*z = (a - b*colshift) + (cnt@Q) * (b*colscale).
        # The tail-month mask (months beyond the horizon contribute growth
        # factor 1) is folded into the per-block (1,K) constants — dead
        # columns get cs=0, arow=1 — so the hot loop has no per-element
        # iota compare/select at all.
        col1 = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)

        def block_consts(j):
            live = col1 < (n_periods - j * K)
            if keep_fold:
                # multiplicative strategy at plain-CLT speed: growth*keep
                # = k*(a + b*z) — the per-month keep fraction scales BOTH
                # affine constants, so the hot loop is unchanged and the
                # strategy finals are exact (only the withdrawn total,
                # not tracked in this mode, would need a prefix)
                k_row = keep_ref[j, :][None, :]
                return (jnp.where(live, k_row * (a - sh_ref[:] * b), 1.0),
                        jnp.where(live, k_row * (cs_ref[:] * b), 0.0))
            return (jnp.where(live, a - sh_ref[:] * b, 1.0),
                    jnp.where(live, cs_ref[:] * b, 0.0))

        def draw_mix(rng, j):
            # one full-tile draw + one full-tile matmul per block (a
            # row-half split to encourage VPU/MXU overlap measured SLOWER:
            # 0.375 s vs 0.357 s — Mosaic schedules the big ops better).
            bits = rng.bits((P, K), key=j)
            cnt = jax.lax.shift_right_logical(bits, 16)
            zraw = jax.lax.dot_general(
                cnt.astype(jnp.bfloat16), q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            arow_j, cs_j = block_consts(j)
            return arow_j + zraw * cs_j

        hacc = jnp.zeros((64, 64), jnp.float32) if with_hist else None
        for s_idx in range(TS):
            tile = iscal[1] + pid * TS + s_idx
            rng = _TileRng(_tile_seed_i32(iscal[0], tile), impl)
            if not with_strategy:
                def body(j, prod, rng=rng):
                    return prod * draw_mix(rng, j)

                prod = jnp.ones((P, K), jnp.float32)
                if nblocks <= 16:
                    # fully unroll: gives Mosaic freedom to overlap the
                    # next block's PRNG draw with the current block's MXU
                    # mix (an explicit draw-ahead reorder of the same
                    # dataflow measured SLOWER — 0.443 s vs 0.374 s — the
                    # list scheduler prefers this order)
                    for j in range(nblocks):
                        prod = body(j, prod)
                else:
                    prod = jax.lax.fori_loop(0, nblocks, body, prod)
                # (an MXU matvec for this lane-sum measured neutral —
                # 0.365 s vs 0.357 s — the VPU reduction is not the
                # bottleneck)
                finals = v0 * jnp.exp(
                    jnp.sum(jnp.log(prod), axis=1, keepdims=True)
                )
                wsum = jnp.zeros((P, 1), jnp.float32)
            else:
                _prefix_impl = prefix_impl
                if _prefix_impl == "mxu":
                    # strictly-lower-triangular ones: (y @ L)[p, c] =
                    # sum_{d<c} y[p, d] — the exclusive prefix-sum as ONE
                    # MXU matmul (f32 inputs: Mosaic's multi-pass f32
                    # matmul keeps ~1e-6 relative accuracy, vs bf16's
                    # ~4e-3 which would blow the withdrawn-total bars)
                    l_r = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
                    l_c = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
                    l_strict = (l_r < l_c).astype(jnp.float32)
                carry = jnp.full((P, 1), 1.0, jnp.float32)
                wsum = jnp.zeros((P, 1), jnp.float32)
                for j in range(nblocks):
                    g_raw = draw_mix(rng, j)         # dead cols -> 1
                    k_row = keep_ref[j, :][None, :]  # dead cols padded 1
                    gk = g_raw * k_row
                    if _prefix_impl == "mxu":
                        # log-space exclusive prefix product on the MXU:
                        # excl = exp(log(gk) @ L). The 1e-37 clamp keeps
                        # a keep=0 month finite (-inf would NaN the
                        # matmul via -inf * 0); depleted paths then read
                        # ~1e-34 instead of exactly 0. Negative growth
                        # never reaches here: extreme-volatility models
                        # (a <= 16b, the mix's z bound) are routed to
                        # ICDF by engine._effective_sampler.
                        y = jnp.log(jnp.maximum(gk, 1e-37))
                        excl = jnp.exp(jax.lax.dot_general(
                            y, l_strict, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ))
                        incl = None  # carry comes from excl's last lane
                    else:
                        # inclusive lane prefix product of gk
                        # (Hillis-Steele over the 128 month lanes)
                        incl = gk
                        d = 1
                        while d < K:
                            rolled = pltpu.roll(incl, d, 1)
                            incl = incl * jnp.where(col1 >= d, rolled,
                                                    1.0)
                            d *= 2
                        # exclusive prefix: shift by one lane, lane 0 -> 1
                        excl = jnp.where(
                            col1 >= 1, pltpu.roll(incl, 1, 1), 1.0
                        )
                    # withdrawn in month (j,c) is grown*(1-k) with
                    # grown = v0*carry*excl*g; sum lanes first, scale by
                    # the (P,1) carry after — avoids a full (P,K) grown
                    # buffer
                    s_j = jnp.sum(
                        excl * g_raw * (1.0 - k_row), axis=1,
                        keepdims=True
                    )
                    wsum = wsum + (v0 * carry) * s_j
                    if incl is None:
                        carry = carry * (excl[:, K - 1:K]
                                         * gk[:, K - 1:K])
                    else:
                        carry = carry * incl[:, K - 1:K]
                finals = v0 * carry
            if not finals_free:
                finals_ref[s_idx * P:(s_idx + 1) * P, :] = finals

            rows = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
            mask = ((pid * TS + s_idx) * P + rows) < iscal[2]
            # v0-normalized moments centered about fscal[7] (see the
            # exact kernel's note)
            inv0 = 1.0 / v0
            fin_s = finals * inv0
            f = jnp.where(mask, fin_s - fscal[7], 0.0)
            f2 = f * f
            s1 = jnp.sum(f)
            s2 = jnp.sum(f2)
            s3 = jnp.sum(f2 * f)
            s4 = jnp.sum(f2 * f2)
            mn = jnp.min(jnp.where(mask, fin_s, jnp.inf))
            mx = jnp.max(jnp.where(mask, fin_s, -jnp.inf))
            cb = jnp.sum(jnp.where(mask & (finals < target), 1.0, 0.0))
            wd = jnp.sum(jnp.where(mask, wsum * inv0, 0.0))

            # assemble the (N_PARTIAL_ROWS, 128) partials block: scalars
            # live in lane 0; min/max rows pad with +/-inf so the
            # cross-tile reduction stays correct
            r_io = jax.lax.broadcasted_iota(
                jnp.int32, (N_PARTIAL_ROWS, 128), 0
            )
            l_io = jax.lax.broadcasted_iota(
                jnp.int32, (N_PARTIAL_ROWS, 128), 1
            )
            out = jnp.where(r_io == 4, jnp.inf,
                            jnp.where(r_io == 5, -jnp.inf, 0.0))
            lane0 = l_io == 0
            for r_idx, val in ((0, s1), (1, s2), (2, s3), (3, s4),
                               (4, mn), (5, mx), (6, cb), (7, wd)):
                out = jnp.where(lane0 & (r_io == r_idx), val, out)
            partials_ref[
                s_idx * N_PARTIAL_ROWS:(s_idx + 1) * N_PARTIAL_ROWS, :
            ] = out

            if not with_hist:
                continue  # stats-only mode (reference reduceBlock parity)
            # in-kernel MXU histogram:
            # counts[h,l] = sum_p oh_hiT[h,p]*oh_lo[p,l] — a natural
            # (64,P)@(P,64) matmul, no operand transposes
            bins = _kernel_bin_indices(finals, mask, log_lo, inv_w,
                                       n_hist_total)
            bins_t = jax.lax.transpose(bins, (1, 0))  # (1,P) one vreg row
            k_col = jax.lax.broadcasted_iota(jnp.int32, (64, P), 0)
            k_io = jax.lax.broadcasted_iota(jnp.int32, (P, 64), 1)
            # bf16 one-hots (int8 measured SLOWER here: the int8 lowering
            # on this Mosaic version costs more than the MXU rate
            # doubling saves)
            oh_hi_t = ((bins_t >> 6) == k_col).astype(jnp.bfloat16)
            oh_lo = ((bins & 63) == k_io).astype(jnp.bfloat16)
            hacc = hacc + jax.lax.dot_general(
                oh_hi_t, oh_lo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if with_hist:
            hist_ref[:] = hacc

    return kernel


@lru_cache(maxsize=32)
def _build_clt_call(n_periods: int, n_hist_total: int, ntiles: int,
                    interpret: bool, with_strategy: bool = False,
                    with_hist: bool = True, keep_fold: bool = False,
                    prefix_impl: str = "mxu", impl: str = "hw",
                    finals_free: bool = False):
    kernel = _build_clt_kernel(n_periods, n_hist_total, with_strategy,
                               with_hist, keep_fold, prefix_impl, impl,
                               finals_free)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    if with_strategy or keep_fold:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # keep rows
    p_tile = CLT_P_STRATEGY if with_strategy else CLT_P
    ts = 1 if with_strategy else CLT_TS
    assert ntiles % ts == 0, (ntiles, ts)
    out_specs = [
        pl.BlockSpec((ts * N_PARTIAL_ROWS, 128), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((ntiles * N_PARTIAL_ROWS, 128), jnp.float32),
    ]
    if not finals_free:
        out_specs.insert(0, pl.BlockSpec((ts * p_tile, 1),
                                         lambda i: (i, 0),
                                         memory_space=pltpu.VMEM))
        out_shape.insert(0, jax.ShapeDtypeStruct((ntiles * p_tile, 1),
                                                 jnp.float32))
    if with_hist:
        out_specs.append(pl.BlockSpec((64, 64), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((ntiles // ts * 64, 64),
                                              jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=(ntiles // ts,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )


@lru_cache(maxsize=64)
def _build_pallas_call(kind: str, strategy_kind: str, n_periods: int,
                       n_table_chunks: int, ntiles: int, interpret: bool,
                       rng_mode: str = "counter", sobol_deep: bool = False,
                       with_hist: bool = True, ablate: str = "",
                       impl: str = "hw"):
    kernel = _build_kernel(kind, strategy_kind, n_periods, n_table_chunks,
                           rng_mode, sobol_deep, with_hist, ablate, impl)
    is_sobol = kind.startswith("sobol")
    is_hist = kind.endswith("historical")
    has_keep = strategy_kind in ("fixed_percent", "variable_percent")

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # iscal
        pl.BlockSpec(memory_space=pltpu.SMEM),  # fscal
    ]
    if is_hist:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    if is_sobol:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    if has_keep:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))

    out_specs = [
        pl.BlockSpec((TILE_ROWS, 128), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((N_PARTIAL_ROWS, 128), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((ntiles * TILE_ROWS, 128), jnp.float32),
        jax.ShapeDtypeStruct((ntiles * N_PARTIAL_ROWS, 128), jnp.float32),
    ]
    if with_hist:
        out_specs.append(pl.BlockSpec((64, 64), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((ntiles * 64, 64),
                                              jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )


def _pad_table(returns_pct: jax.Array):
    """(C,128) growth-factor table: (100+r)/100, zero padded."""
    n = returns_pct.shape[0]
    c = -(-n // 128)
    g = (jnp.float32(100.0) + returns_pct.astype(jnp.float32)) * 0.01
    flat = jnp.zeros((c * 128,), jnp.float32).at[:n].set(g)
    return flat.reshape(c, 128), n


def _seed_base_i32(root_key):
    kd = jax.random.key_data(root_key).astype(jnp.uint32).ravel()
    return jax.lax.bitcast_convert_type(
        kd[0] ^ (kd[-1] * jnp.uint32(0x6C62272E)), jnp.int32
    )


# ---------------------------------------------------------------------------
# Terminal-law kernel (ops/terminal_law.py): one draw per PATH.
#
# V = scale * exp(Chebyshev(z / Z_MAX)) with z from the same
# 23-bit-uniform -> polynomial-erfinv pipeline as the exact ICDF kernel.
# The kernel is model- and horizon-independent — the law arrives as a
# runtime SMEM coefficient operand, so ONE Mosaic compile serves every
# market, horizon, v0 and keep schedule (a per-config compile would cost
# minutes through the remote compile service for a kernel whose entire
# math is ~150 VPU ops/path).
# ---------------------------------------------------------------------------

_LAW_STREAM_XOR = 0x1A37  # disjoint stream family from the month kernels


def _build_law_kernel(with_hist: bool, impl: str = "hw"):
    """Ref layout:
      iscal (SMEM i32 (8,)): seed_base, tile0, valid, hb, 0, 0, 0, 0
      fscal (SMEM f32 (8,)): v0, target, hist_log_lo, hist_inv_width,
                             moment_shift, inv_zmax, 0, 0
      law (SMEM f32 (LAW_OP_LEN, 1)): [scale, c_0 .. c_{LAW_D-1}]
      finals (TILE_ROWS,128) / partials (N_PARTIAL_ROWS,128)
      [hist (64,64)] outs — same contracts as _build_kernel.
    """
    from stock_market_monte_carlo_tpu.ops.terminal_law import LAW_D

    def kernel(*refs):
        it = iter(refs)
        iscal = next(it)
        fscal = next(it)
        law_ref = next(it)
        finals_ref = next(it)
        partials_ref = next(it)
        hist_ref = next(it) if with_hist else None

        pid = pl.program_id(0)
        tile = iscal[1] + pid
        rng = _TileRng(_tile_seed_i32(iscal[0], tile), impl)
        rr = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 128), 0)
        ll = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 128), 1)
        local_id = pid * TILE_PATHS + rr * 128 + ll

        u = _u23_from_bits(rng.bits((TILE_ROWS, 128)))
        z = jnp.float32(_SQRT2) * _erfinv_poly(2.0 * u - 1.0)
        # u23 keeps |z| <= ~5.54 < LAW_CLAMP by construction; no clamp
        s = z * fscal[5]
        two_s = 2.0 * s
        b1 = jnp.zeros((TILE_ROWS, 128), jnp.float32)
        b2 = jnp.zeros((TILE_ROWS, 128), jnp.float32)
        for k in range(LAW_D - 1, 0, -1):
            b0 = two_s * b1 - b2 + law_ref[1 + k, 0]
            b2 = b1
            b1 = b0
        total = law_ref[0, 0] * jnp.exp(s * b1 - b2 + law_ref[1, 0])
        finals_ref[:] = total

        # stats epilogue — same contract as _build_kernel's (which stays
        # byte-identical to preserve its Mosaic cache); withdrawn row 0
        mask = local_id < iscal[2]
        inv0 = 1.0 / fscal[0]
        tot_s = total * inv0
        f = jnp.where(mask, tot_s - fscal[4], 0.0)
        f2 = f * f

        def rowsum(x):
            return jnp.sum(x, axis=0, keepdims=True)

        partials_ref[:] = jnp.concatenate([
            rowsum(f),
            rowsum(f2),
            rowsum(f2 * f),
            rowsum(f2 * f2),
            jnp.min(jnp.where(mask, tot_s, jnp.inf), axis=0,
                    keepdims=True),
            jnp.max(jnp.where(mask, tot_s, -jnp.inf), axis=0,
                    keepdims=True),
            rowsum(jnp.where(mask & (total < fscal[1]), 1.0, 0.0)),
            jnp.zeros((1, 128), jnp.float32),
        ], axis=0)

        if not with_hist:
            return
        # in-kernel MXU histogram — same lane-concat one-hot scheme and
        # rationale as _build_kernel (see the comment there)
        hb = iscal[3]
        bins = _kernel_bin_indices(total, mask, fscal[2], fscal[3], hb)
        hi_b = bins >> 6
        lo_b = bins & 63
        rio = jax.lax.broadcasted_iota(jnp.int32, (64, 128), 0)
        oh_hi_t = jnp.concatenate(
            [(hi_b[r:r + 1, :] == rio).astype(jnp.bfloat16)
             for r in range(TILE_ROWS)], axis=1,
        )
        oh_lo_t = jnp.concatenate(
            [(lo_b[r:r + 1, :] == rio).astype(jnp.bfloat16)
             for r in range(TILE_ROWS)], axis=1,
        )
        hist_ref[:] = jax.lax.dot_general(
            oh_hi_t, oh_lo_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return kernel


@lru_cache(maxsize=8)
def _build_law_call(ntiles: int, interpret, with_hist: bool,
                    impl: str = "hw"):
    kernel = _build_law_kernel(with_hist, impl)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # iscal
        pl.BlockSpec(memory_space=pltpu.SMEM),  # fscal
        pl.BlockSpec(memory_space=pltpu.SMEM),  # law operand
    ]
    out_specs = [
        pl.BlockSpec((TILE_ROWS, 128), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((N_PARTIAL_ROWS, 128), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((ntiles * TILE_ROWS, 128), jnp.float32),
        jax.ShapeDtypeStruct((ntiles * N_PARTIAL_ROWS, 128), jnp.float32),
    ]
    if with_hist:
        out_specs.append(pl.BlockSpec((64, 64), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((ntiles * 64, 64),
                                              jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )


# Stats-only variant (optimization_log v15): when nothing reads per-path
# finals, the kernel above wastes ~10x its arithmetic on HBM writes —
# 64 MB/chunk of finals plus 32 MB of per-tile (64,64) histogram rows at
# the default 2^24 chunk — and pays per-grid-step overhead on a 2048-step
# grid whose body is only ~150 VPU ops. This kernel:
#   * never writes finals;
#   * processes LAW_GROUP logical 8192-path tiles per grid step, each
#     re-seeded with its own global tile index, so the PRNG bit stream is
#     IDENTICAL to the finals kernel's (same family as
#     experiments/exp_grid_overhead.py's grouped variant);
#   * emits ONE (8,128) partials row per grid step (group-reduced in
#     registers — the group tree also keeps f32 summation error at the
#     ungrouped kernel's level);
#   * accumulates the MXU histogram into a single (64,64) VMEM block that
#     persists across grid steps (constant index_map, zeroed at pid == 0
#     — the ops/pallas_bands.py pattern); counts are integers <= 2^24,
#     exact in f32 BECAUSE chunk_paths is capped at 2^24 (config.py —
#     a cell accumulates at most one chunk's worth of paths).
# HBM output traffic per 2^24-path chunk: 104 MB -> 528 KB.

# Logical 8192-path tiles per grid step of the finals-free law kernel.
# More tiles per step amortize the per-grid-step overhead (~44 us/step:
# the 5.6 ms/chunk do-nothing floor at 128 steps, optimization_log v15)
# over more work at the cost of a longer unrolled body. 16 was the v15
# choice; 32 measured ~17% faster under clean back-to-back fresh-process
# min-of-5 timing (0.0895 vs 0.1075 s at 100M x 360, identical
# statistics — optimization_log v23/v24; the v20 "fresh-process stall"
# that blocked this flip was a service-side per-process first-compile
# stall, not the kernel). The env knob remains for measurement
# (experiments/exp_law_group.py). Seeding is per-global-tile either
# way, so the group size cannot change any sampled stream — only f32
# association of the moment rows (counts/min/max/histogram stay exact).
LAW_GROUP = int(os.environ.get("SMMC_LAW_GROUP", "32"))
if LAW_GROUP < 1 or (LAW_GROUP & (LAW_GROUP - 1)) != 0:
    raise ValueError(f"SMMC_LAW_GROUP must be a power of two, got {LAW_GROUP}")
# Practical ceiling: the group-64 body took 6m41 to compile on XLA CPU
# and group-32 already outgrows the remote Mosaic cache's cross-process
# reuse (fresh processes stall >10 min re-waiting on the compile
# service, optimization_log v20) — larger bodies are compile-time traps,
# not throughput.
if LAW_GROUP > 64:
    raise ValueError(
        f"SMMC_LAW_GROUP={LAW_GROUP} exceeds the practical ceiling (64): "
        "the unrolled kernel body scales with the group and very large "
        "bodies stall fresh-process Mosaic compiles (optimization_log v20)")

# Indicator dtype for the law stats kernel's factorized one-hot gemm.
# "i8" (default) quarters the one-hot bytes vs bf16 and accumulates the
# dot in int32 — the same trade ops/pallas_bands.py measured at 482 vs
# 574 ms/chunk for its per-month histogram. Counts stay <= 2^24/cell
# (config.chunk_paths cap), so the int32 -> f32 cast at the hist_ref
# write is exact and the output contract is unchanged. "bf16" keeps the
# original trace byte-identical (ablation control; its Mosaic cache
# stays valid). The finals law kernel (_build_law_kernel) keeps bf16:
# it is off the headline path and its cache is expensive to rebuild.
_LAW_OH_I8 = os.environ.get("SMMC_LAW_OH", "i8") == "i8"


def _build_law_stats_kernel(with_hist: bool, group: int, oh_i8: bool,
                            impl: str = "hw"):
    """Finals-free terminal-law kernel: same SMEM operands as
    _build_law_kernel; outs are one (N_PARTIAL_ROWS,128) partials row per
    grid step and (with_hist) a single accumulated (64,64) histogram.
    ``oh_i8`` selects the one-hot/accumulator dtype pair explicitly (the
    module default is _LAW_OH_I8) so tests can A/B the two traces without
    monkeypatching globals."""
    from stock_market_monte_carlo_tpu.ops.terminal_law import LAW_D

    oh_dtype = jnp.int8 if oh_i8 else jnp.bfloat16
    acc_dtype = jnp.int32 if oh_i8 else jnp.float32

    def kernel(*refs):
        it = iter(refs)
        iscal = next(it)
        fscal = next(it)
        law_ref = next(it)
        partials_ref = next(it)
        hist_ref = next(it) if with_hist else None

        pid = pl.program_id(0)
        rr = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 128), 0)
        ll = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 128), 1)
        rio = jax.lax.broadcasted_iota(jnp.int32, (64, 128), 0)
        inv0 = 1.0 / fscal[0]

        if with_hist:
            @pl.when(pid == 0)
            def _init():
                hist_ref[:] = jnp.zeros_like(hist_ref)

        zrow = jnp.zeros((1, 128), jnp.float32)
        s1 = s2 = s3 = s4 = cb = zrow
        mn = jnp.full((1, 128), jnp.inf, jnp.float32)
        mx = jnp.full((1, 128), -jnp.inf, jnp.float32)
        hist_acc = (jnp.zeros((64, 64), acc_dtype) if with_hist
                    else None)

        def rowsum(x):
            return jnp.sum(x, axis=0, keepdims=True)

        for g in range(group):
            tile_local = pid * group + g
            rng = _TileRng(
                _tile_seed_i32(iscal[0], iscal[1] + tile_local), impl)
            u = _u23_from_bits(rng.bits((TILE_ROWS, 128)))
            z = jnp.float32(_SQRT2) * _erfinv_poly(2.0 * u - 1.0)
            # u23 keeps |z| <= ~5.54 < LAW_CLAMP by construction; no clamp
            s = z * fscal[5]
            two_s = 2.0 * s
            b1 = jnp.zeros((TILE_ROWS, 128), jnp.float32)
            b2 = jnp.zeros((TILE_ROWS, 128), jnp.float32)
            for k in range(LAW_D - 1, 0, -1):
                b0 = two_s * b1 - b2 + law_ref[1 + k, 0]
                b2 = b1
                b1 = b0
            total = law_ref[0, 0] * jnp.exp(s * b1 - b2 + law_ref[1, 0])

            local_id = tile_local * TILE_PATHS + rr * 128 + ll
            mask = local_id < iscal[2]
            tot_s = total * inv0
            f = jnp.where(mask, tot_s - fscal[4], 0.0)
            f2 = f * f
            s1 = s1 + rowsum(f)
            s2 = s2 + rowsum(f2)
            s3 = s3 + rowsum(f2 * f)
            s4 = s4 + rowsum(f2 * f2)
            mn = jnp.minimum(
                mn, jnp.min(jnp.where(mask, tot_s, jnp.inf), axis=0,
                            keepdims=True))
            mx = jnp.maximum(
                mx, jnp.max(jnp.where(mask, tot_s, -jnp.inf), axis=0,
                            keepdims=True))
            cb = cb + rowsum(jnp.where(mask & (total < fscal[1]), 1.0, 0.0))

            if with_hist:
                hb = iscal[3]
                bins = _kernel_bin_indices(total, mask, fscal[2], fscal[3],
                                           hb)
                hi_b = bins >> 6
                lo_b = bins & 63
                oh_hi_t = jnp.concatenate(
                    [(hi_b[r:r + 1, :] == rio).astype(oh_dtype)
                     for r in range(TILE_ROWS)], axis=1,
                )
                oh_lo_t = jnp.concatenate(
                    [(lo_b[r:r + 1, :] == rio).astype(oh_dtype)
                     for r in range(TILE_ROWS)], axis=1,
                )
                hist_acc = hist_acc + jax.lax.dot_general(
                    oh_hi_t, oh_lo_t, (((1,), (1,)), ((), ())),
                    preferred_element_type=acc_dtype,
                )

        partials_ref[:] = jnp.concatenate(
            [s1, s2, s3, s4, mn, mx, cb, zrow], axis=0)
        if with_hist:
            # exact: per-cell counts <= chunk_paths <= 2^24 fit f32
            hist_ref[:] += hist_acc.astype(jnp.float32)

    return kernel


@lru_cache(maxsize=16)
def _build_law_stats_call(nsteps: int, group: int, interpret,
                          with_hist: bool, oh_i8: bool = _LAW_OH_I8,
                          impl: str = "hw"):
    kernel = _build_law_stats_kernel(with_hist, group, oh_i8, impl)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # iscal
        pl.BlockSpec(memory_space=pltpu.SMEM),  # fscal
        pl.BlockSpec(memory_space=pltpu.SMEM),  # law operand
    ]
    out_specs = [
        pl.BlockSpec((N_PARTIAL_ROWS, 128), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((nsteps * N_PARTIAL_ROWS, 128), jnp.float32),
    ]
    if with_hist:
        out_specs.append(pl.BlockSpec((64, 64), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((64, 64), jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )


def _law_group(ntiles: int) -> int:
    """Largest power-of-two divisor of ``ntiles`` capped at LAW_GROUP."""
    g = 1
    while g < LAW_GROUP and ntiles % (2 * g) == 0:
        g *= 2
    return g


def _law_chunk_stats(law_op, root_key, v0, path_offset, valid, target,
                     shift, *, chunk_shape_b, spec, keep_finals,
                     with_hist, oh_i8=None):
    """Terminal-law chunk: same output contract as pallas_chunk_stats.
    ``oh_i8=None`` uses the module default (_LAW_OH_I8); tests pass an
    explicit bool to A/B the int8 vs bf16 one-hot traces."""
    from stock_market_monte_carlo_tpu.ops.terminal_law import LAW_ZMAX

    assert chunk_shape_b % TILE_PATHS == 0, (chunk_shape_b, TILE_PATHS)
    ntiles = chunk_shape_b // TILE_PATHS
    interpret = interpret_mode("gaussian")
    hb = spec.n_bins + 2
    mxu_hist = with_hist and hb % 64 == 0 and hb <= 4096

    tile0 = jax.lax.bitcast_convert_type(
        jnp.asarray(path_offset, jnp.uint32) // jnp.uint32(TILE_PATHS),
        jnp.int32,
    )
    iscal = jnp.stack([
        _seed_base_i32(root_key) ^ jnp.int32(_LAW_STREAM_XOR),
        tile0, jnp.asarray(valid, jnp.int32), jnp.int32(hb),
        jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
    ])
    fscal = jnp.stack([
        jnp.asarray(v0, jnp.float32),
        jnp.asarray(target, jnp.float32),
        jnp.float32(spec.log_lo), jnp.float32(1.0 / spec.width),
        jnp.asarray(shift, jnp.float32),
        jnp.float32(1.0 / LAW_ZMAX),
        jnp.float32(0), jnp.float32(0),
    ])
    law2d = jnp.asarray(law_op, jnp.float32).reshape(-1, 1)

    # finals-free fast path: identical PRNG streams, no 4 B/path HBM
    # write, grouped grid (see _build_law_stats_kernel). Runs whenever
    # nothing consumes per-path finals; the non-MXU histogram epilogue is
    # the one consumer that still needs them.
    if not keep_finals and (mxu_hist or not with_hist):
        group = _law_group(ntiles)
        call = _build_law_stats_call(
            ntiles // group, group, interpret, mxu_hist,
            _LAW_OH_I8 if oh_i8 is None else oh_i8, prng_impl())
        outs = call(iscal, fscal, law2d)
        p = outs[0].reshape(ntiles // group, N_PARTIAL_ROWS, 128)
        stats = jnp.concatenate([
            jnp.asarray(valid, jnp.float32)[None],
            jnp.sum(p[:, 0:4], axis=(0, 2)),
            jnp.min(p[:, 4])[None],
            jnp.max(p[:, 5])[None],
            jnp.sum(p[:, 6])[None],
            jnp.sum(p[:, 7])[None],
        ])
        if mxu_hist:
            hist = outs[1].reshape(-1)[:hb]
        else:
            hist = jnp.zeros((hb,), jnp.float32)
        return stats, hist

    call = _build_law_call(ntiles, interpret, mxu_hist, prng_impl())
    outs = call(iscal, fscal, law2d)
    finals2d, partials = outs[0], outs[1]

    p = partials.reshape(ntiles, N_PARTIAL_ROWS, 128)
    stats = jnp.concatenate([
        jnp.asarray(valid, jnp.float32)[None],
        jnp.sum(p[:, 0:4], axis=(0, 2)),
        jnp.min(p[:, 4])[None],
        jnp.max(p[:, 5])[None],
        jnp.sum(p[:, 6])[None],
        jnp.sum(p[:, 7])[None],
    ])
    if mxu_hist:
        hist = jnp.sum(
            outs[2].reshape(ntiles, 64, 64), axis=0
        ).reshape(-1)[:hb]
    elif with_hist:
        finals = finals2d.reshape(-1)
        lane = jnp.arange(chunk_shape_b, dtype=jnp.int32)
        idx = spec.bin_index(finals)
        idx = jnp.where(lane < valid, idx, hb)
        hist = hist_ops.histogram_counts(idx, hb)
    else:
        hist = jnp.zeros((hb,), jnp.float32)
    if keep_finals:
        return stats, hist, finals2d.reshape(-1)
    return stats, hist


def _clt_chunk_stats(model, strategy, root_key, v0, path_offset, valid,
                     target, shift=jnp.float32(0.0), *, n_periods,
                     chunk_shape_b, spec, keep_finals,
                     with_hist=True, keep_fold=False):
    """CLT-sampler chunk (Gaussian, multiplicative strategies): same
    output contract as chunk_stats. ``keep_fold`` runs a multiplicative
    strategy through the PLAIN compounding kernel with the keep fractions
    folded into the block constants (track_withdrawn=False mode)."""
    with_strategy = strategy.kind != "none" and not keep_fold
    p_tile = CLT_P_STRATEGY if with_strategy else CLT_P
    ts = 1 if with_strategy else CLT_TS
    assert chunk_shape_b % (p_tile * ts) == 0, (chunk_shape_b, p_tile, ts)
    hb = spec.n_bins + 2
    mxu_hist = with_hist and hb % 64 == 0 and hb <= 4096
    ntiles = chunk_shape_b // p_tile
    interpret = interpret_mode(model.kind)

    q, colscale, colshift = _clt_qmatrix(CLT_K)
    a = 1.0 + jnp.asarray(model.mean_pct, jnp.float32) * 0.01
    b = jnp.asarray(model.std_pct, jnp.float32) * 0.01
    tile0 = jax.lax.bitcast_convert_type(
        jnp.asarray(path_offset, jnp.uint32) // jnp.uint32(p_tile),
        jnp.int32
    )
    iscal = jnp.stack([
        _seed_base_i32(root_key) ^ jnp.int32(0x11C7),  # own stream family
        tile0, jnp.asarray(valid, jnp.int32),
        jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
    ])
    fscal = jnp.stack([
        jnp.asarray(v0, jnp.float32), a, b, jnp.float32(0),
        jnp.asarray(target, jnp.float32),
        jnp.float32(spec.log_lo), jnp.float32(1.0 / spec.width),
        jnp.asarray(shift, jnp.float32),
    ])
    operands = [iscal, fscal, q, colscale, colshift]
    if with_strategy or keep_fold:
        from stock_market_monte_carlo_tpu.engine.engine import _keep_factors

        nblocks = -(-n_periods // CLT_K)
        keep = jnp.ones((nblocks * CLT_K,), jnp.float32)
        keep = keep.at[:n_periods].set(_keep_factors(strategy, n_periods))
        operands.append(keep.reshape(nblocks, CLT_K))
    # finals-free fast path (SMMC_CLT_FINALSFREE=1): same streams and
    # stats/hist contract, no (P,1) finals output — the v15 law-kernel
    # trade applied to CLT; only valid when nothing consumes finals
    finals_free = (clt_finals_free() and not keep_finals
                   and (mxu_hist or not with_hist))
    call = _build_clt_call(n_periods, hb, ntiles, interpret, with_strategy,
                           mxu_hist, keep_fold, clt_prefix_impl(),
                           prng_impl(), finals_free)
    outs = call(*operands)
    if finals_free:
        finals2d, partials = None, outs[0]
        outs = (None,) + tuple(outs)  # keep hist at outs[2]
    else:
        finals2d, partials = outs[0], outs[1]

    p = partials.reshape(ntiles, N_PARTIAL_ROWS, 128)
    stats = jnp.concatenate([
        jnp.asarray(valid, jnp.float32)[None],
        jnp.sum(p[:, 0:4], axis=(0, 2)),
        jnp.min(p[:, 4])[None],
        jnp.max(p[:, 5])[None],
        jnp.sum(p[:, 6])[None],
        jnp.sum(p[:, 7])[None],
    ])
    if mxu_hist:
        hist = jnp.sum(
            outs[2].reshape(ntiles // ts, 64, 64), axis=0
        ).reshape(-1)[:hb]
    elif with_hist:
        finals = finals2d.reshape(-1)
        lane = jnp.arange(chunk_shape_b, dtype=jnp.int32)
        idx = spec.bin_index(finals)
        idx = jnp.where(lane < valid, idx, hb)
        hist = hist_ops.histogram_counts(idx, hb)
    else:
        hist = jnp.zeros((hb,), jnp.float32)
    if keep_finals:
        return stats, hist, finals2d.reshape(-1)
    return stats, hist


def pallas_chunk_stats(model, strategy, root_key, scramble_key, v0,
                       path_offset, valid, target, shift=jnp.float32(0.0),
                       *, n_periods, chunk_shape_b, spec, keep_finals,
                       sampler="icdf", with_hist=True, law_oh_i8=None):
    """Drop-in replacement for engine.chunk_stats on TPU (same contract)."""
    if sampler == "law":
        # terminal-law sampling: scramble_key carries the (LAW_OP_LEN,)
        # law operand (see engine.chunk_stats / ops/terminal_law.py)
        return _law_chunk_stats(
            scramble_key, root_key, v0, path_offset, valid, target,
            shift, chunk_shape_b=chunk_shape_b, spec=spec,
            keep_finals=keep_finals, with_hist=with_hist, oh_i8=law_oh_i8,
        )
    # the engine passes the EFFECTIVE sampler (engine._effective_sampler):
    # "clt" = plain CLT tiles; "clt-prefix" = the lane-prefix strategy
    # kernel on 2048-path tiles (explicit opt-in — measured slower than
    # the exact ICDF kernel for strategy runs: 1.007 s vs 0.563 s at
    # 100M x 360 fixed-percent)
    if (sampler in ("clt", "clt-prefix", "clt-nw")
            and model.kind == "gaussian"
            and strategy.kind in ("none", "fixed_percent",
                                  "variable_percent")):
        return _clt_chunk_stats(
            model, strategy, root_key, v0, path_offset, valid, target,
            shift, n_periods=n_periods, chunk_shape_b=chunk_shape_b,
            spec=spec, keep_finals=keep_finals, with_hist=with_hist,
            keep_fold=(sampler == "clt-nw"),
        )
    assert chunk_shape_b % TILE_PATHS == 0, (chunk_shape_b, TILE_PATHS)
    ntiles = chunk_shape_b // TILE_PATHS
    kind = model.kind
    strategy_kind = strategy.kind
    interpret = interpret_mode(kind, getattr(model, "rng", "counter"))

    seed_base = _seed_base_i32(root_key)
    tile0 = jax.lax.bitcast_convert_type(
        jnp.asarray(path_offset, jnp.uint32) // jnp.uint32(TILE_PATHS),
        jnp.int32,
    )

    mean = getattr(model, "mean_pct", 0.0)
    std = getattr(model, "std_pct", 0.0)
    a = 1.0 + jnp.asarray(mean, jnp.float32) * 0.01
    b = jnp.asarray(std, jnp.float32) * 0.01

    amount = jnp.float32(0.0)
    if strategy_kind == "fixed_amount":
        amount = jnp.asarray(strategy.amount, jnp.float32)

    operands = []
    n_table_chunks = 0
    n_table = 0
    if kind.endswith("historical"):
        table2d, n_table = _pad_table(model.returns_pct)
        n_table_chunks = int(table2d.shape[0])
        operands.append(table2d)
    if kind.startswith("sobol"):
        from stock_market_monte_carlo_tpu.ops.sobol import digital_shift

        direction = jnp.asarray(model.direction, jnp.uint32)[:n_periods]
        operands.append(
            jax.lax.bitcast_convert_type(direction, jnp.int32)
        )
        dshift = digital_shift(scramble_key, n_periods)
        operands.append(
            jax.lax.bitcast_convert_type(dshift, jnp.int32).reshape(-1, 1)
        )
    if strategy_kind in ("fixed_percent", "variable_percent"):
        from stock_market_monte_carlo_tpu.engine.engine import _keep_factors

        keep = _keep_factors(strategy, n_periods).reshape(-1, 1)
        operands.append(keep)

    index_offset = int(getattr(model, "index_offset", 0))
    sobol_deep = kind.startswith("sobol") and index_offset != 0
    tail_n = n_table - 128 * (n_table_chunks - 1) if n_table else 0
    hb = spec.n_bins + 2
    # the in-kernel MXU histogram needs the 64x64 factorization; other
    # bin counts keep the pre-v7 XLA one-hot epilogue over the finals
    mxu_hist = with_hist and hb % 64 == 0 and hb <= 4096
    iscal = jnp.stack([
        seed_base, tile0, jnp.asarray(valid, jnp.int32),
        jnp.asarray(n_table, jnp.int32),
        jnp.asarray(tail_n, jnp.int32),
        jnp.int32(np.int32(np.uint32(index_offset & 0xFFFFFFFF))),
        jnp.int32(np.int32(np.uint32(index_offset >> 32))),
        jnp.int32(hb),
    ])
    fscal = jnp.stack([
        jnp.asarray(v0, jnp.float32), a, b, amount,
        jnp.asarray(target, jnp.float32),
        jnp.float32(spec.log_lo), jnp.float32(1.0 / spec.width),
        jnp.asarray(shift, jnp.float32),
    ])

    call = _build_pallas_call(
        kind, strategy_kind, n_periods, n_table_chunks, ntiles, interpret,
        getattr(model, "rng", "counter"), sobol_deep, mxu_hist,
        ablate=hist_ablate_mode(), impl=prng_impl(),
    )
    outs = call(iscal, fscal, *operands)
    finals2d, partials = outs[0], outs[1]

    p = partials.reshape(ntiles, N_PARTIAL_ROWS, 128)
    sums = jnp.sum(p[:, 0:4], axis=(0, 2))
    mn = jnp.min(p[:, 4])
    mx = jnp.max(p[:, 5])
    cb = jnp.sum(p[:, 6])
    wd = jnp.sum(p[:, 7])
    stats = jnp.concatenate([
        jnp.asarray(valid, jnp.float32)[None],
        sums, mn[None], mx[None], cb[None], wd[None],
    ])

    if mxu_hist:
        hist = jnp.sum(
            outs[2].reshape(ntiles, 64, 64), axis=0
        ).reshape(-1)[:hb]
    elif with_hist:
        finals = finals2d.reshape(-1)
        lane = jnp.arange(chunk_shape_b, dtype=jnp.int32)
        idx = spec.bin_index(finals)
        idx = jnp.where(lane < valid, idx, hb)
        hist = hist_ops.histogram_counts(idx, hb)
    else:
        hist = jnp.zeros((hb,), jnp.float32)

    if keep_finals:
        return stats, hist, finals2d.reshape(-1)
    return stats, hist
