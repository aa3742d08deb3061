"""Device-aware batch planning for risk workloads.

TPU analog of the reference's JetsonOptimizer
(ref: jetson_optimization.py:174-775: optimal batch/tile size from device
memory profile, batched risk assessment, perf benchmark). On TPU the
decisions are batch size vs HBM and padding to lane multiples.
"""
from __future__ import annotations

import time
from typing import Optional

import numpy as np

from njw_tpu.platform.device import DeviceCaps, detect


class TPUOptimizer:
    """ref shape: JetsonOptimizer (jetson_optimization.py:174)."""

    def __init__(self, caps: Optional[DeviceCaps] = None,
                 memory_fraction: float = 0.5):
        self.caps = caps or detect()
        self.memory_fraction = memory_fraction

    def optimal_batch_size(self, bytes_per_item: int,
                           max_batch: int = 1 << 22) -> int:
        """Largest lane-aligned batch that fits the HBM budget
        (ref: optimal batch sizing, jetson_optimization.py:237-281)."""
        budget = self.caps.hbm_gb * 1e9 * self.memory_fraction
        if self.caps.hbm_gb == 0:  # CPU fallback
            budget = 4e9 * self.memory_fraction
        n = int(budget // max(bytes_per_item, 1))
        n = min(n, max_batch)
        return max((n // 128) * 128, 128)

    def optimal_tile_size(self, n_points: int) -> int:
        """Grid tile edge aligned to the (8, 128) register tile."""
        side = int(np.sqrt(max(n_points, 1)))
        return max(min((side // 128) * 128, 1024), 128)

    def batched_risk_assessment(self, portfolio, model, batch_size:
                                Optional[int] = None) -> dict:
        """Assess a large portfolio in device-sized batches
        (ref: batched risk assessment, jetson_optimization.py:420-472)."""
        assets = portfolio.assets
        if not assets:
            return {}
        bs = batch_size or self.optimal_batch_size(8 * 4)
        out = {}
        for i in range(0, len(assets), bs):
            chunk = assets[i:i + bs]
            x = np.asarray([a.x for a in chunk], np.float32)
            y = np.asarray([a.y for a in chunk], np.float32)
            scores = model.assess_risk(x, y)
            out.update({a.id: float(s) for a, s in zip(chunk, scores)})
        return out

    def benchmark(self, portfolio, model, n_repeats: int = 3) -> dict:
        """ref: performance benchmark, jetson_optimization.py:753."""
        t0 = time.perf_counter()
        for _ in range(n_repeats):
            self.batched_risk_assessment(portfolio, model)
        elapsed = (time.perf_counter() - t0) / n_repeats
        n = len(portfolio.assets)
        return {
            "assets": n,
            "seconds_per_pass": elapsed,
            "assets_per_second": n / max(elapsed, 1e-12),
            "device": self.caps.generation,
        }
