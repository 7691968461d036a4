"""Headline benchmark: 100M paths x 360 months, simulated and reduced to
moments + count-below + a 4096-bin final-value histogram on device.

The reference's benchmark table (README.md:66-75) is measured in
*historical-bootstrap* mode: the reduceBlock kernel samples the S&P table
and runs 100M x 360 in 0.13 s on an RTX 3070 (mean/var only — no
histogram, no count-below, no extrema).

The headline here is the framework's fastest EXACT answer to that same
task: the terminal-law sampler (ops/terminal_law.py) draws each path's
V_T in one step from the exact T-fold-convolution law of the bootstrap
month loop (Chebyshev quantile fit of the FFT law, ~1e-7 log error;
cross-validated against the month-loop sampler at 1e9 paths to ~2e-4 on
quantiles down to p = 1e-5 — scripts/bootstrap_law_validation_tpu.py).
Same statistical task, same output law, ~60x less device arithmetic.
``vs_baseline`` is that rate over the 3070 reduceBlock's 769.2M paths/s.

The month-loop engines — the structurally like-for-like comparison (one
draw + one compound per path-month, exactly what the reference kernel
does) — are timed alongside; their ratios are in ``extra`` under
``vs_baseline_month_loop*``.

Prints ONE JSON line.
Usage: python bench.py [n_paths] [n_periods] [--mesh N]

``--mesh N`` runs every workload sharded over an N-device 1-D "paths"
mesh (parallel/mesh.paths_mesh) — the one-command path to the v5e-8
north-star row when real multi-chip hardware exists. The JSON then
reports ``n_chips = N`` and per-chip rates. The plumbing is validated
end-to-end on the virtual 8-device CPU mesh (tests/test_bench_mesh.py;
numbers there are meaningless, shape and fields are the contract).
Device-time/roofline instrumentation is single-chip-only and is skipped
under a mesh or a non-TPU backend.
"""

import json
import sys
import time

import jax

BASELINE_PATHS_PER_S = 100_000_000 / 0.13  # RTX 3070 reduceBlock (README)

# --- calibrated roofline model constants (measured; see the cited logs) ---
# historical sliced-rotation kernel: modeled ~38 arithmetic el-ops + one
# within-row lane gather (~14 op-equivalents at the calibrated rate) per
# path-month (docs/optimization_log.md v8c)
HIST_MODEL_OP_EQ = 52.0
# CLT chain class floor per 2^24 chunk (docs/optimization_log.md v22):
# mixing-matmul part is MXU-bound (3 x 3.53 ms at 79% of peak); the rest
# (draws, shifts, prod, log/exp, histogram) is VPU-bound and rescaled by
# today's calibrated VPU rate vs the v22 calibration day's 4.05e12
CLT_FLOOR_MXU_MS = 10.6
CLT_FLOOR_VPU_MS = {"clt": 17.4, "clt_statsonly": 8.4}
V8C_VPU_RATE = 4.05e12  # el-ops/s, clean-process calibration (v8c addendum)


def _require_live_backend(timeout_s: float = 180.0):
    """Fail fast with a diagnostic JSON line if device discovery hangs.

    The axon tunnel can wedge (observed 2026-08-17: jax.devices() blocks
    forever); a clean error record beats an indefinite hang in an
    automated bench run. 180 s comfortably covers the ~20-40 s first
    initialization."""
    import threading

    out = {}

    def probe():
        try:
            out["backend"] = jax.default_backend()
            out["n"] = len(jax.devices())
        except Exception as e:  # a fast-failing backend also needs the
            out["error"] = f"{type(e).__name__}: {e}"  # diagnostic line

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    err = (f"device discovery hung for {timeout_s:.0f}s (tunnel down?)"
           if t.is_alive() else out.get("error"))
    if err:
        print(json.dumps({
            "metric": "paths_per_sec_per_chip_360mo_historical_exact_law_hist",
            "value": 0.0, "unit": "paths/s/chip", "vs_baseline": 0.0,
            "extra": {"error": err},
        }), flush=True)
        raise SystemExit(2)
    return out


def _device_times(n_periods, chunk_paths=2**24, k=6, reps=3):
    """Honest per-chunk device time for the production chunk kernels.

    Method (experiments/exp_dispatch_overhead.py): dispatch K chunks
    back-to-back and force ONE combined scalar fetch — the 15-25 ms
    tunnel round-trip is paid once and amortized, so batched/K is the
    device cost; isolated-minus-batched is the dispatch/tunnel tax.
    These fields make round-over-round comparisons survive the 5-25%
    daily wall-clock drift (RESULTS.md caveat): device ms/chunk moves
    only when the kernel changes. All kernels were just compiled by the
    timed runs, so this adds no compile risk. The do-nothing dispatch
    floor (same 128-step grid as the law kernel, zero math) gives
    ``*_floor_fraction`` = how close each kernel sits to pure dispatch
    cost."""
    import jax.numpy as jnp

    import stock_market_monte_carlo_tpu as smmc
    from stock_market_monte_carlo_tpu.config import EngineOptions
    from stock_market_monte_carlo_tpu.engine import engine as eng
    from stock_market_monte_carlo_tpu.models.strategies import NoWithdrawal
    from stock_market_monte_carlo_tpu.ops import terminal_law as tlaw

    g = smmc.GaussianReturns()
    h = smmc.HistoricalBootstrap.from_csv()
    strat = NoWithdrawal()
    root = jax.random.key(1)
    scr = jax.random.fold_in(root, 0x50B0)
    law_op_h = jnp.asarray(
        tlaw.fit_terminal_law(h, strat, n_periods, 1000.0).operand())
    nbins = EngineOptions().histogram_bins
    spec_g = eng.make_histogram_spec(g, strat, n_periods, 1000.0, nbins)
    spec_h = eng.make_histogram_spec(h, strat, n_periods, 1000.0, nbins)

    def mk(model, sampler, with_hist, key2, spec):
        fn = eng._get_chunk_fn(
            (model.kind, getattr(model, "rng", "counter")), strat.kind,
            n_periods, chunk_paths, spec, False, None, "pallas", sampler,
            with_hist,
        )

        def call(offset):
            return fn(model, strat, root, key2, jnp.float32(1000.0),
                      jnp.uint32(offset), jnp.int32(chunk_paths),
                      jnp.float32(jnp.inf), jnp.float32(0.0))

        return call

    calls = {
        "law_hist": mk(h, "law", True, law_op_h, spec_h),
        "law_statsonly": mk(h, "law", False, law_op_h, spec_h),
        "historical": mk(h, "icdf", True, scr, spec_h),
        "clt": mk(g, "clt", True, scr, spec_g),
        "clt_statsonly": mk(g, "clt", False, scr, spec_g),
    }

    def force(outs):
        return float(sum(jnp.sum(jnp.asarray(o[0]).ravel()[:8])
                         for o in outs))

    out = {"method": (f"batched K={k} dispatches + one forcing fetch "
                      "(experiments/exp_dispatch_overhead.py)")}
    floor_ms = None
    try:
        # do-nothing Pallas kernel on the law kernel's 128-step grid:
        # the pure dispatch floor (compiled in seconds — no math body)
        sys.path.insert(0, __file__.rsplit("/", 1)[0])
        from experiments.exp_grid_overhead import _make
        toy = jax.jit(_make("const", 16))
        iscal = jnp.array([12345, 0, 0, 0, 0, 0, 0, 0], jnp.int32)
        force([toy(iscal)[1:]])  # warm (finals output is slot 0 here)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            force([toy(iscal)[1:] for _ in range(k)])
            best = min(best, time.perf_counter() - t0)
        floor_ms = best * 1000 / k
        out["dispatch_floor_ms_per_chunk"] = round(floor_ms, 2)
    except Exception as e:  # floor is best-effort instrumentation
        out["dispatch_floor_error"] = f"{type(e).__name__}: {e}"

    for name, call in calls.items():
        force([call(0)])  # warm
        iso = bat = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            force([call(0)])
            iso = min(iso, time.perf_counter() - t0)
        for _ in range(reps):
            t0 = time.perf_counter()
            force([call(i * chunk_paths) for i in range(k)])
            bat = min(bat, time.perf_counter() - t0)
        ms = bat * 1000 / k
        out[f"{name}_ms_per_chunk"] = round(ms, 2)
        out[f"{name}_dispatch_tax_ms"] = round(iso * 1000 - ms, 2)
        if floor_ms:
            out[f"{name}_floor_fraction"] = round(floor_ms / ms, 3)

    # --- fused whole-run device time: the headline minus the tunnel ------
    # One fused scan-of-6 dispatch IS the 100M run (round 5); timing K
    # of them back-to-back with one forcing fetch amortizes the fetch
    # round trip, so this is the honest device cost of the whole
    # headline — what a tunnel-free local host would approach. Tracked
    # so the "remaining wall is one fetch round trip" claim stays a
    # number (optimization_log v28).
    try:
        g6 = -(-100_000_000 // chunk_paths)
        fn6 = eng._get_chunk_fn(
            ("historical", "counter"), strat.kind, n_periods, chunk_paths,
            spec_h, False, None, "pallas", "law", True, fuse_g=g6,
        )
        import numpy as _np

        offs = jnp.asarray(
            _np.uint32(chunk_paths) * _np.arange(g6, dtype=_np.uint32))
        vals = jnp.asarray(_np.minimum(
            _np.int64(100_000_000)
            - _np.int64(chunk_paths) * _np.arange(g6, dtype=_np.int64),
            chunk_paths).astype(_np.int32))

        def run6():
            return fn6(h, strat, root, law_op_h, jnp.float32(1000.0),
                       offs, vals, jnp.float32(jnp.inf), jnp.float32(0.0))

        force([run6()])  # warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            force([run6() for _ in range(k)])
            best = min(best, time.perf_counter() - t0)
        out["law_hist_fused_100m_device_ms"] = round(best * 1000 / k, 2)
    except Exception as e:
        out["fused_run_error"] = f"{type(e).__name__}: {e}"

    # --- per-round calibrated roofline (VERDICT r4 item 3) ---------------
    # Re-measure the machine's sustained serial-chain VPU rate each round
    # with the v8c calibration kernel pair (experiments/exp_hist_roofline.
    # make_calib_call; Mosaic-cached after their first compile), then
    # emit fraction-of-roofline per production kernel so the "85% of the
    # wall" claims are tracked numbers, not log prose.
    try:
        from experiments.exp_hist_roofline import make_calib_call

        cal = {}
        for n_ops in (16, 48):
            callc = jax.jit(make_calib_call(n_ops, n_periods, chunk_paths))
            iscal = jnp.asarray([123], jnp.int32)
            force([(callc(iscal),)])  # warm
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                force([(callc(iscal),) for _ in range(k)])
                best = min(best, time.perf_counter() - t0)
            cal[n_ops] = best * 1000 / k
        out["calib16_ms"] = round(cal[16], 2)
        out["calib48_ms"] = round(cal[48], 2)
        # marginal rate over the 32 extra chained ops/month
        vpu_rate = (chunk_paths * n_periods * 32.0
                    / ((cal[48] - cal[16]) / 1000.0))
        out["vpu_rate_el_ops_per_s"] = float(f"{vpu_rate:.3e}")
        hist_pred_ms = (HIST_MODEL_OP_EQ * chunk_paths * n_periods
                        / vpu_rate * 1000.0)
        out["historical_predicted_ms_per_chunk"] = round(hist_pred_ms, 2)
        if out.get("historical_ms_per_chunk"):
            out["historical_roofline_fraction"] = round(
                hist_pred_ms / out["historical_ms_per_chunk"], 3)
        scale = V8C_VPU_RATE / vpu_rate
        for kname, vpu_ms in CLT_FLOOR_VPU_MS.items():
            floor = CLT_FLOOR_MXU_MS + vpu_ms * scale
            out[f"{kname}_class_floor_ms"] = round(floor, 2)
            meas = out.get(f"{kname}_ms_per_chunk")
            if meas:
                out[f"{kname}_roofline_fraction"] = round(floor / meas, 3)
    except Exception as e:  # roofline is best-effort instrumentation
        out["roofline_error"] = f"{type(e).__name__}: {e}"
    return out


def main():
    # the guard must run before the package import — importing the
    # package initializes the backend and hangs the same way
    _require_live_backend()
    global smmc, EngineOptions
    import stock_market_monte_carlo_tpu as smmc
    from stock_market_monte_carlo_tpu.config import EngineOptions

    argv = list(sys.argv[1:])
    mesh_n = None
    if "--mesh" in argv:
        i = argv.index("--mesh")
        mesh_n = int(argv[i + 1])
        del argv[i:i + 2]
    n_paths = int(argv[0]) if len(argv) > 0 else 100_000_000
    n_periods = int(argv[1]) if len(argv) > 1 else 360

    mesh = None
    if mesh_n is not None and mesh_n > 1:
        from stock_market_monte_carlo_tpu.parallel.mesh import paths_mesh

        mesh = paths_mesh(mesh_n)
    n_chips = 1 if mesh is None else mesh.size

    def timed(model, sampler="icdf", reps=3, histogram=True,
              terminal_law=False, chunk_paths=2**24, n_override=None):
        # 2^24 is the largest chunk the exact-count invariant allows
        # (config.py: on-device f32 counts stay exact integers); 2^25
        # measured ~3% faster for the law kernel in this tunnel-bound
        # environment (experiments/exp_law_chunk.py) but is rejected
        opts = EngineOptions(chunk_paths=chunk_paths,
                             gaussian_sampler=sampler,
                             histogram=histogram,
                             terminal_law=terminal_law)
        n_run = n_paths if n_override is None else n_override
        # warmup at the FULL run shape: compiles the chunk kernel AND the
        # fused-scan program the timed reps dispatch (a run of
        # <= fuse_chunks chunks is ONE device dispatch — round 5), so no
        # rep pays compile
        smmc.simulate_stats(model, n_run, n_periods, seed=1,
                            target_amount=2000.0, options=opts, mesh=mesh)
        best, res, rep_times = None, None, []
        for _ in range(reps):  # min-of-N absorbs tunnel jitter (~10%;
            # post-compile processes read 30-40% high — see optimization_log)
            t0 = time.perf_counter()
            res = smmc.simulate_stats(
                model, n_run, n_periods, seed=7, target_amount=2000.0,
                options=opts, mesh=mesh,
            )
            dt = time.perf_counter() - t0
            rep_times.append(round(dt, 4))
            best = dt if best is None else min(best, dt)
        all_reps.append(rep_times)
        return best, res

    all_reps = []  # per-engine rep times: machine-variance evidence
    hist_model = smmc.HistoricalBootstrap.from_csv()

    # --- headline: terminal-law historical, full stats + histogram ------
    # law runs finish in ~0.05 s, so their min-of-N is dominated by the
    # ~20-35 ms tunnel round-trip jitter (per-rep swings of +-30 ms
    # observed) — 9 reps (costs under a second total and stabilizes the
    # headline around its ~41-48 ms fixed+device floor)
    t_law_h, res_law_h = timed(hist_model, terminal_law=True, reps=9)
    t_law_so, _ = timed(hist_model, terminal_law=True, histogram=False,
                        reps=9)
    gauss = smmc.GaussianReturns()
    t_law_g, res_law_g = timed(gauss, terminal_law=True, reps=9)

    # --- 1e9-path law row: the many-chunk regime where fused dispatch
    #     (EngineOptions.fuse_chunks) amortizes the ~5-8 ms per-dispatch
    #     tunnel floor over 60 chunks (blocks 32+16+8+4) — the rate here
    #     is the framework's sustained throughput, vs the 100M headline
    #     which carries ~60-80 ms of fixed per-call cost --------------------
    t_law_1e9 = None
    if n_paths == 100_000_000:  # only for the standard workload
        t_law_1e9, _ = timed(hist_model, terminal_law=True, reps=2,
                             n_override=1_000_000_000)

    # --- month-loop engines (structurally like-for-like with the
    #     reference kernel: one draw + one compound per path-month) ------
    t_hist, res_hist = timed(hist_model)
    # histogram=False matches the reference reduceBlock's actual contract
    # (mean/variance only, src/simulations.cu:185-247) — the strict
    # like-for-like workload
    t_hist_so, _ = timed(hist_model, histogram=False)
    t_icdf, res = timed(gauss)
    t_clt, res_clt = timed(gauss, "clt")
    t_clt_so, _ = timed(gauss, "clt", histogram=False)

    # honest device-time instrumentation (drift-proof comparisons):
    # best-effort — the headline must never die on it. Single-chip
    # TPU-only: under a mesh the per-chunk-fn plumbing differs, and on
    # CPU the pallas interpreters make the numbers meaningless.
    if mesh is None and jax.default_backend() == "tpu":
        try:
            device_time = _device_times(n_periods)
        except Exception as e:
            device_time = {"error": f"{type(e).__name__}: {e}"}
    else:
        device_time = {"skipped": "mesh or non-tpu backend"}

    law_rate = n_paths / t_law_h / n_chips
    hist_rate = n_paths / t_hist / n_chips
    gauss_rate = n_paths / min(t_icdf, t_clt) / n_chips

    analytic_mean = (1000.0
                     * (1 + float(gauss.mean_pct) / 100.0) ** n_periods)
    rel_err = abs(res.mean - analytic_mean) / analytic_mean
    rel_err_clt = abs(res_clt.mean - analytic_mean) / analytic_mean
    rel_err_law = abs(res_law_g.mean - analytic_mean) / analytic_mean

    print(json.dumps({
        "metric": "paths_per_sec_per_chip_360mo_historical_exact_law_hist",
        "value": round(law_rate, 1),
        "unit": "paths/s/chip",
        # the framework's fastest exact answer to the reference benchmark
        # task (historical bootstrap, full stats + 4096-bin histogram) vs
        # the 3070's 0.13 s mean/var-only reduceBlock
        "vs_baseline": round(law_rate / BASELINE_PATHS_PER_S, 4),
        "extra": {
            "n_paths": n_paths,
            "n_periods": n_periods,
            "sampler": "terminal_law (exact T-fold-convolution bootstrap "
                       "law; validated vs the FFT oracle at 1e9 paths)",
            "elapsed_s_historical_terminal_law": round(t_law_h, 4),
            "elapsed_s_historical_terminal_law_statsonly": round(
                t_law_so, 4),
            "elapsed_s_gaussian_terminal_law": round(t_law_g, 4),
            "terminal_law_mean": round(res_law_h.mean, 2),
            # sustained many-chunk rate (60 fused chunks amortize the
            # per-dispatch floor and the fixed per-call tunnel cost)
            **({} if t_law_1e9 is None else {
                "elapsed_s_historical_terminal_law_1e9": round(
                    t_law_1e9, 4),
                "terminal_law_1e9_paths_per_sec": round(
                    1_000_000_000 / t_law_1e9, 1),
            }),
            # month-loop engines: the structurally like-for-like rows
            # (per-month draw + compound, as the reference kernel does)
            "elapsed_s_historical_month_loop": round(t_hist, 4),
            "vs_baseline_month_loop": round(
                hist_rate / BASELINE_PATHS_PER_S, 4),
            # stats-only = the reference reduceBlock's exact contract
            # (mean/var, no histogram/count-below surface beyond target)
            "elapsed_s_historical_month_loop_statsonly": round(t_hist_so, 4),
            "vs_baseline_month_loop_statsonly": round(
                (n_paths / t_hist_so / n_chips) / BASELINE_PATHS_PER_S, 4
            ),
            "elapsed_s_gaussian_icdf": round(t_icdf, 4),
            "elapsed_s_gaussian_clt": round(t_clt, 4),
            "elapsed_s_gaussian_clt_statsonly": round(t_clt_so, 4),
            "gaussian_month_loop_paths_per_sec_per_chip": round(
                gauss_rate, 1),
            "vs_baseline_gaussian_month_loop_best": round(
                gauss_rate / BASELINE_PATHS_PER_S, 4
            ),
            "n_chips": n_chips,  # devices USED (engine is single-device
            #                      without a mesh); visible devices may
            #                      be more

            "backend": jax.default_backend(),
            "historical_mean": round(res_hist.mean, 2),
            "gaussian_mean": round(res.mean, 2),
            "gaussian_std": round(res.std, 2),
            "mean_rel_err_vs_analytic_icdf": float(f"{rel_err:.2e}"),
            "mean_rel_err_vs_analytic_clt": float(f"{rel_err_clt:.2e}"),
            "mean_rel_err_vs_analytic_terminal_law": float(
                f"{rel_err_law:.2e}"),
            # drift-separable per-kernel device time (ms/chunk, batched
            # method) + dispatch-floor fraction: compare THESE round over
            # round; wall clock carries 5-25% daily tunnel/machine drift
            "device_time": device_time,
            # raw per-rep wall times, order: law hist, law stats-only,
            # law gaussian, law 1e9 (standard workload only), historical
            # month-loop, historical stats-only, icdf, clt, clt
            # stats-only — tunnel/machine variance is visible here (see
            # docs/optimization_log.md)
            "rep_times_s": all_reps,
        },
    }))


if __name__ == "__main__":
    main()
