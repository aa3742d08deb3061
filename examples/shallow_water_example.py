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
    args = p.parse_args()

    from njw_tpu.viz import (
        animate_simulation, visualize_height, visualize_velocity,
        visualize_vorticity,
    )
    from njw_tpu.weather import SimConfig, Simulation

    os.makedirs(args.output_dir, exist_ok=True)
    cfg = SimConfig(grid_width=args.width, grid_height=args.height,
                    dt=args.dt, integration_method=args.method,
                    backend=args.backend, coriolis_f=1e-4)
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
