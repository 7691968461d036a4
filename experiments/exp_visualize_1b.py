"""VERDICT item 4 done-evidence: the live dashboard updates DURING a
1B-path run on the real chip (frames captured to a file)."""
import io
import jax
import stock_market_monte_carlo_tpu as smmc
from stock_market_monte_carlo_tpu.config import EngineOptions
from stock_market_monte_carlo_tpu.viz.live import LiveDashboard

assert jax.default_backend() == "tpu"
out = io.StringIO()
dash = LiveDashboard(out=out, min_interval_s=0.05)
opts = EngineOptions(chunk_paths=2**24, gaussian_sampler="clt")
smmc.simulate_stats(smmc.GaussianReturns(), 2**24, 360, seed=1,
                    options=opts)  # warm
res = smmc.simulate_stats(
    smmc.GaussianReturns(), 1_000_000_000, 360, seed=7,
    target_amount=2000.0, options=opts, stream=dash,
)
frames = dash.frames
text = out.getvalue()
print(f"frames rendered during run: {frames}")
assert frames >= 10, "dashboard must update repeatedly during the run"
assert "100.0%" in text
# show the last frame
print(text.strip().rsplit("paths ", 1)[-1][:400])
print("elapsed:", res.elapsed_s)
