#!/usr/bin/env python
"""Shallow-water demo (ref parity:
src/weather-sim/python/examples/shallow_water_example.py:40-80): run a
vortex, save plots + animation.

    python examples/shallow_water_example.py --width 256 --steps 500 \
        --method rk4 --initial vortex --animate --output-dir out/
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os


def compare_methods(args):
    """Integrator study: same IC, every method; reports wall time,
    stability, and L2 divergence from the rk4 solution (the BASELINE
    oracle discipline applied across methods)."""
    import json

    import numpy as np

    from njw_tpu.weather import SimConfig, Simulation

    methods = ["euler", "rk2", "rk4", "adams_bashforth", "semi_implicit"]
    results = {}
    ref_h = None
    for m in ["rk4"] + [x for x in methods if x != "rk4"]:
        cfg = SimConfig(grid_width=args.width, grid_height=args.height,
                        dt=args.dt, integration_method=m,
                        boundary_condition=args.bc, coriolis_f=1e-4)
        sim = Simulation.from_config(cfg, args.initial, strength=2.0)
        sim.step(args.steps)
        h = np.asarray(sim.state.h)
        finite = bool(np.isfinite(h).all())
        if m == "rk4":
            ref_h = h
        results[m] = {
            "stable": finite,
            "ms_per_step": round(sim.metrics.total_time_ms
                                 / max(sim.metrics.num_steps, 1), 4),
            "l2_vs_rk4": (round(float(np.sqrt(((h - ref_h) ** 2).mean())),
                                6) if finite and ref_h is not None
                          else None),
        }
    print(json.dumps(results, indent=2))
    return 0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--dt", type=float, default=0.01)
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--method", default="rk4")
    p.add_argument("--initial", default="vortex")
    p.add_argument("--backend", default="auto")
    p.add_argument("--output-dir", default="./output")
    p.add_argument("--animate", action="store_true")
    p.add_argument("--bc", default="periodic",
                   choices=["periodic", "clamped", "outflow", "reflective"])
    p.add_argument("--grid-type", default="cartesian",
                   choices=["cartesian", "staggered"])
    p.add_argument("--compare-methods", action="store_true",
                   help="run euler/rk2/rk4/ab2/semi-implicit on the same "
                        "IC and report stability + divergence from rk4")
    args = p.parse_args()

    if args.compare_methods:
        return compare_methods(args)

    from njw_tpu.viz import (
        animate_simulation, visualize_height, visualize_velocity,
        visualize_vorticity,
    )
    from njw_tpu.weather import SimConfig, Simulation

    os.makedirs(args.output_dir, exist_ok=True)
    cfg = SimConfig(grid_width=args.width, grid_height=args.height,
                    dt=args.dt, integration_method=args.method,
                    backend=args.backend, coriolis_f=1e-4,
                    boundary_condition=args.bc, grid_type=args.grid_type)
    sim = Simulation.from_config(cfg, args.initial, strength=2.0)
    sim.run(args.steps, output_interval=max(args.steps // 25, 1))

    import numpy as np

    visualize_height(np.asarray(sim.state.h),
                     path=os.path.join(args.output_dir, "height.png"))
    visualize_velocity(np.asarray(sim.state.u), np.asarray(sim.state.v),
                       path=os.path.join(args.output_dir, "velocity.png"))
    visualize_vorticity(np.asarray(sim.state.u), np.asarray(sim.state.v),
                        path=os.path.join(args.output_dir, "vorticity.png"))
    if args.animate:
        animate_simulation(sim.snapshots, "h",
                           path=os.path.join(args.output_dir, "height.gif"))
    print(sim.metrics.as_dict())


if __name__ == "__main__":
    main()
