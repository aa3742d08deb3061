#!/usr/bin/env python
"""LJ-fluid MD demo (ref parity: src/molecular-dynamics/python/
lj_fluid_example.py): equilibrate a fluid with a Berendsen thermostat and
plot energy history + final configuration."""
import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-atoms", type=int, default=512)
    p.add_argument("--density", type=float, default=0.8)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--output-dir", default="./output")
    args = p.parse_args()

    from njw_tpu.md import MDSimulation, create_lj_fluid
    from njw_tpu.viz import plot_energy_history, plot_particles_3d

    os.makedirs(args.output_dir, exist_ok=True)
    state, topo, lj = create_lj_fluid(args.num_atoms, density=args.density,
                                      T0=args.temperature)
    sim = MDSimulation(state, topo, lj, dt=0.002, thermostat="berendsen",
                       T0=args.temperature)
    times, ke, pe, tot = [], [], [], []

    def record(s):
        e = s.energies()
        times.append(s.time)
        ke.append(e["kinetic"])
        pe.append(e["potential"])
        tot.append(e["total"])

    sim.run(args.steps, callback=record,
            callback_interval=max(args.steps // 50, 1))
    plot_energy_history(times, {"kinetic": ke, "potential": pe,
                                "total": tot},
                        path=os.path.join(args.output_dir, "energy.png"))
    plot_particles_3d(np.asarray(sim.state.pos),
                      path=os.path.join(args.output_dir, "final.png"))
    print({"T": sim.temperature(), **sim.performance_metrics()})


if __name__ == "__main__":
    main()
