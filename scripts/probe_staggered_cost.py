"""Explain the staggered C-grid 2048^2 falloff (r5 capability row:
0.44 ms/step at 1024^2 -> 5.18 at 2048^2, a 3x rate drop) via XLA cost
analysis of the compiled step at both sizes: if bytes-accessed/point
jumps, XLA stopped fusing the roll chain (materialized concatenates),
i.e. an HBM-traffic cliff, not a compute one.

Usage: python scripts/probe_staggered_cost.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass

    from njw_tpu.weather import SimConfig, Simulation

    for n in (1024, 2048):
        cfg = SimConfig(grid_width=n, grid_height=n, dt=0.01,
                        grid_type="staggered", coriolis_f=1e-4,
                        backend="xla")
        sim = Simulation.from_config(cfg, "vortex", strength=1.0)
        # one compiled 10-step chunk: cost analysis is per-invocation
        lowered = sim._run_chunk.lower(sim._carry, sim.state, 10)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        bytes_step = float(ca.get("bytes accessed", 0.0)) / 10.0
        flops_step = float(ca.get("flops", 0.0)) / 10.0
        rec = {
            "grid": n,
            "bytes_per_point_per_step": round(bytes_step / (n * n), 1),
            "flops_per_point_per_step": round(flops_step / (n * n), 1),
            "hbm_GB_per_step": round(bytes_step / 1e9, 3),
        }
        # quick differential for context (same chunked method as the row)
        s0 = sim.state

        def once(k):
            sim.state = s0
            t0 = time.perf_counter()
            sim.step(k)
            _ = np.asarray(sim.state.h[:4, :4])
            return time.perf_counter() - t0

        once(50), once(100)
        rec["ms_per_step"] = round(
            sorted((once(100) - once(50)) / 50 * 1e3 for _ in range(3))[1],
            4)
        rec["effective_GBps"] = round(
            bytes_step / (rec["ms_per_step"] / 1e3) / 1e9, 1)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
