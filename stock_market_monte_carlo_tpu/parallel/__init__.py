from stock_market_monte_carlo_tpu.parallel.mesh import (
    paths_mesh,
    device_count,
)

__all__ = ["paths_mesh", "device_count"]
