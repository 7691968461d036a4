"""Golden pins for the arithmetic counter stream (SMMC_PRNG_IMPL=arith).

The arith stream is the framework's cross-platform determinism surface:
pure int32 vector math keyed by (tile seed, draw key, element position),
so the PRNG bits are identical on every backend. These goldens freeze
the stream (a change to `_arith_bits`, `_tile_seed_i32`, draw keying, or
the kernels' draw order shows up here as a hard failure), and
tests/test_tpu_only.py::test_arith_stream_matches_cpu_golden re-checks
the same values on the real chip — CPU-vs-TPU cross-backend
reproducibility of the production kernel bodies.

Bitwise equality is pinned only for the HISTORICAL kernel (its month
loop is gather/select/multiply — elementwise IEEE ops with identical
results on every backend). CLT and terminal-law route through exp/log
and the MXU matmul, whose lowerings legitimately differ per backend;
those pin CPU-exact values here and carry relative bars on hardware.
"""

import numpy as np
import pytest

import stock_market_monte_carlo_tpu as smmc
from stock_market_monte_carlo_tpu.config import EngineOptions

# (name, model-kw, n_periods, head4, probes{idx: value}, f64 sum)
N = 8192 + 777
GOLDEN = {
    "historical": dict(
        t=7,
        head=[1084.7064, 1232.139, 1078.0762, 1086.5796],
        probes={1000: 1001.9213, 8192: 1077.0131, -1: 853.8689},
        total=9334839.723266602,
    ),
    "clt": dict(
        t=7,
        head=[1001.21185, 1041.5238, 1029.5404, 1031.0122],
        probes={1000: 1034.0186, 8192: 1024.9257, -1: 1055.2952},
        total=9286861.409606934,
    ),
    "law": dict(
        t=360,
        head=[5511.935, 4408.6226, 6044.3296, 4697.5986],
        probes={1000: 6796.618, 8192: 7023.9424, -1: 6741.3413},
        total=53977445.838378906,
    ),
}


def _finals(name, monkeypatch):
    monkeypatch.setenv("SMMC_PRNG_IMPL", "arith")
    kw = {}
    if name == "historical":
        model = smmc.HistoricalBootstrap.from_csv()
    else:
        model = smmc.GaussianReturns()
        if name == "clt":
            kw["gaussian_sampler"] = "clt"
        else:
            kw["terminal_law"] = True
    opts = EngineOptions(backend="pallas", chunk_paths=8192, **kw)
    return np.asarray(smmc.simulate_final_values(
        model, N, GOLDEN[name]["t"], seed=12, options=opts))


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_arith_stream_golden_cpu(name, monkeypatch):
    g = GOLDEN[name]
    f = _finals(name, monkeypatch)
    assert f.shape == (N,)
    np.testing.assert_array_equal(f[:4], np.float32(g["head"]))
    for idx, val in g["probes"].items():
        assert f[idx] == np.float32(val), (idx, f[idx])
    assert float(np.sum(f, dtype=np.float64)) == pytest.approx(
        g["total"], rel=1e-12)
