"""TPU measurement: PE fused stage kernel vs XLA at BASELINE configs 4/5.

Differential timing (t(2N) - t(N), D2H-hard-synced) per CLAUDE.md: this
backend's block_until_ready can report early and per-invocation overhead
is ~tens of ms, so each config compiles TWO scan lengths (N, 2N) of the
SAME jitted chunk and reports the difference.

Usage: python scripts/measure_pe.py [--config 4|5|both] [--steps N]
Prints one JSON line per measurement.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(nx, ny, L, steps, backend="pallas"):
    import jax
    import numpy as np

    from njw_tpu.weather import SimConfig, Simulation

    dt = 20.0
    cfg = SimConfig(model="primitive", grid_width=nx, grid_height=ny,
                    num_levels=L, dx=1e5, dy=1e5, dt=dt,
                    coriolis_f=1e-4, backend=backend)
    sim = Simulation.from_config(cfg, "baroclinic", u_jet=10.0, perturb=0.5)

    def sync():
        _ = np.asarray(sim.state.ps[:4, :4])

    def run(n):
        t0 = time.perf_counter()
        sim.step(n)
        sync()
        return time.perf_counter() - t0

    run(steps)            # compile N
    run(2 * steps)        # compile 2N
    t1 = run(steps)
    t2 = run(2 * steps)
    ms_per_step = (t2 - t1) / steps * 1e3
    pts = nx * ny * L
    assert bool(np.isfinite(np.asarray(sim.state.ps)).all())
    print(json.dumps({
        "config": f"PE {nx}x{ny}x{L} rk4 {backend}",
        "stepper": sim.stepper.name,
        "ms_per_step": round(ms_per_step, 3),
        "cell_points_per_s": round(pts / (ms_per_step / 1e3), 0),
        "t_N_s": round(t1, 3), "t_2N_s": round(t2, 3), "steps": steps,
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="both")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--xla", action="store_true",
                    help="also measure the XLA path")
    args = ap.parse_args()

    if args.config in ("4", "both"):
        measure(512, 512, 20, args.steps)
        if args.xla:
            measure(512, 512, 20, args.steps, backend="xla")
    if args.config in ("5", "both"):
        measure(2048, 2048, 40, max(args.steps // 4, 5))


if __name__ == "__main__":
    main()
