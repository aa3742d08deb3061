#!/usr/bin/env python
"""N-body study (ref parity: src/nbody_sim python examples): evolve a
galaxy model, track energy conservation, and — at large N — compare the
O(N^2) direct/MXU force path against the particle-mesh (PM) and P3M
solvers for both accuracy and speed.

    python examples/nbody_example.py --num-particles 20000 --steps 200
    python examples/nbody_example.py --num-particles 200000 \
        --force-method pm --pm-mesh 128 --steps 50
    python examples/nbody_example.py --compare-forces --num-particles 20000
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def compare_forces(args):
    """Speed of pm/p3m vs the direct O(N^2) path at the same N, plus a
    two-particle Newton accuracy sweep across separations — the same
    methodology as tests/test_nbody.py::TestP3M. (Direct computes
    free-space gravity; PM/P3M compute PERIODIC gravity, so bulk force
    vectors are not directly comparable — the pairwise sweep at r << box
    is the physically meaningful accuracy check.)"""
    from njw_tpu.nbody import create_random_system
    from njw_tpu.nbody.forces import accelerations
    from njw_tpu.nbody.pm import p3m_accelerations, pm_accelerations

    sys_ = create_random_system(args.num_particles, box_size=1.0,
                                seed=args.seed)
    pos, mass = sys_.pos, sys_.mass

    def timed(fn):
        np.asarray(fn())          # compile + warm
        t0 = time.perf_counter()
        np.asarray(fn())
        return time.perf_counter() - t0

    t_direct = timed(lambda: accelerations(sys_, method="direct"))
    t_pm = timed(lambda: pm_accelerations(pos, mass, mesh=args.pm_mesh,
                                          box=1.0, G=1.0))
    t_p3m = timed(lambda: p3m_accelerations(pos, mass, mesh=args.pm_mesh,
                                            box=1.0, G=1.0))

    # accuracy: two particles at separation r, vs Newton 1/r^2
    sweep = []
    cell = 1.0 / args.pm_mesh
    for r_cells in (1.0, 1.3, 2.0, 4.0, 8.0):
        r = r_cells * cell
        pp = np.array([[0.5 - r / 2, 0.5, 0.5],
                       [0.5 + r / 2, 0.5, 0.5]], np.float32)
        mm = np.ones(2, np.float32)
        newton = 1.0 / r ** 2
        a_pm = abs(float(pm_accelerations(pp, mm,
                                          mesh=args.pm_mesh)[0, 0]))
        a_p3m = abs(float(p3m_accelerations(pp, mm,
                                            mesh=args.pm_mesh)[0, 0]))
        sweep.append({"separation_cells": r_cells,
                      "pm_over_newton": round(a_pm / newton, 3),
                      "p3m_over_newton": round(a_p3m / newton, 3)})

    print(json.dumps({
        "n": args.num_particles, "mesh": args.pm_mesh,
        "seconds": {"direct": round(t_direct, 4), "pm": round(t_pm, 4),
                    "p3m": round(t_p3m, 4)},
        "speedup_vs_direct": {"pm": round(t_direct / max(t_pm, 1e-9), 2),
                              "p3m": round(t_direct / max(t_p3m, 1e-9),
                                           2)},
        "pairwise_accuracy_sweep": sweep,
        "note": "P3M ~1.0 x Newton from ~1.3 cells; plain PM is soft "
                "below ~2 cells (the Ewald-split short-range fix)",
    }, indent=2))
    return 0


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num-particles", type=int, default=10_000)
    p.add_argument("--system", default="galaxy",
                   choices=["galaxy", "random", "solar"])
    p.add_argument("--integrator", default="leapfrog",
                   choices=["euler", "leapfrog", "verlet", "rk4"])
    p.add_argument("--force-method", default="auto",
                   choices=["auto", "direct", "mxu", "pm", "p3m"])
    p.add_argument("--pm-mesh", type=int, default=128)
    p.add_argument("--dt", type=float, default=0.001)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--softening", type=float, default=0.01)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compare-forces", action="store_true")
    p.add_argument("--output-dir", default="./output")
    args = p.parse_args()

    if args.compare_forces:
        return compare_forces(args)

    from njw_tpu.nbody import (
        NBodySimulation, create_galaxy_model, create_random_system,
        create_solar_system,
    )
    from njw_tpu.viz import plot_particles_3d

    os.makedirs(args.output_dir, exist_ok=True)
    maker = {"galaxy": create_galaxy_model, "random": create_random_system,
             "solar": lambda n, **kw: create_solar_system()}[args.system]
    system = maker(args.num_particles, seed=args.seed) \
        if args.system != "solar" else maker(0)

    kw = {}
    if args.force_method in ("pm", "p3m"):
        kw = {"pm_mesh": args.pm_mesh, "pm_box": 1.0}
    sim = NBodySimulation(system, integrator=args.integrator, dt=args.dt,
                          force_method=args.force_method, **kw)
    e0 = float(sim.diagnostics()["total_energy"])
    energies = []
    n_rec = max(args.steps // 20, 1)
    for _ in range(0, args.steps, n_rec):
        sim.step(n_rec)
        energies.append(float(sim.diagnostics()["total_energy"]))
    e1 = energies[-1]

    plot_particles_3d(np.asarray(sim.system.pos),
                      path=os.path.join(args.output_dir, "final.png"))
    report = {"system": args.system, "n": int(sim.system.pos.shape[0]),
              "integrator": args.integrator,
              "force_method": args.force_method,
              "steps": args.steps,
              "energy_initial": e0, "energy_final": e1,
              "energy_drift": abs(e1 - e0) / max(abs(e0), 1e-12),
              **{k: float(v) for k, v in
                 sim.performance_metrics().items()
                 if isinstance(v, (int, float))}}
    print(json.dumps(report))


if __name__ == "__main__":
    main()
