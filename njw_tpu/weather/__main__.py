"""CLI: python -m njw_tpu.weather  (also: python -m weather_sim)

Mirrors the reference demo's argument surface
(ref: src/weather-sim/python/examples/shallow_water_example.py:40-80:
width/height/dt/steps/method/initial/backend/output) on the TPU framework.
"""
from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="njw_tpu.weather",
        description="TPU-native weather stencil solver (SWE / barotropic / "
        "primitive equations)",
    )
    p.add_argument("--model", default="shallow_water",
                   choices=["shallow_water", "barotropic", "primitive"])
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--levels", type=int, default=1)
    p.add_argument("--dx", type=float, default=1.0)
    p.add_argument("--dy", type=float, default=1.0)
    p.add_argument("--dt", type=float, default=0.01)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument(
        "--method", default="rk4",
        choices=["euler", "rk2", "rk4", "adams_bashforth", "semi_implicit"],
    )
    p.add_argument("--si-order", type=int, default=1, choices=[1, 2],
                   help="semi_implicit only: 1=CN, 2=predictor-corrector "
                        "(stable explicit advection at several-x-CFL dt)")
    p.add_argument("--initial", default="vortex")
    p.add_argument("--bc", default="periodic",
                   choices=["periodic", "clamped", "outflow", "reflective"])
    p.add_argument("--grid-type", default="cartesian",
                   choices=["cartesian", "staggered", "spherical_harmonic",
                            "icosahedral"],
                   help="cartesian = collocated A-grid; staggered = "
                        "Arakawa C-grid (Sadourny enstrophy-conserving); "
                        "spherical_harmonic = global spectral core on a "
                        "Gaussian grid (width must be 2x height); "
                        "icosahedral = global 10-panel finite-volume core "
                        "(height = cells per rhombus edge, power of 2)")
    p.add_argument("--mountain-height", type=float, default=0.0,
                   help="gaussian orography peak (geopotential m^2/s^2); "
                        "primitive model only")
    p.add_argument("--nest-patch", default=None, metavar="Y0,Y1,X0,X1",
                   help="two-way nested refinement patch in coarse-cell "
                        "indices (half-open; shallow_water model only)")
    p.add_argument("--nest-ratio", type=int, default=2,
                   help="space/time refinement ratio for --nest-patch")
    p.add_argument("--coriolis", type=float, default=0.0)
    p.add_argument("--beta", type=float, default=0.0)
    p.add_argument("--viscosity", type=float, default=0.0)
    p.add_argument("--backend", default="auto",
                   choices=["auto", "xla", "pallas"])
    p.add_argument("--output-interval", type=int, default=0,
                   help="snapshot interval in steps (0 = no snapshots)")
    p.add_argument("--output", default=None,
                   help="write final state + snapshots to this .npz")
    p.add_argument("--output-format", default=None,
                   choices=["csv", "npz", "vtk", "netcdf"],
                   help="write per-interval snapshots via an output "
                        "manager into --output-dir")
    p.add_argument("--output-dir", default="./output")
    p.add_argument("--device-info", action="store_true",
                   help="print device info and exit")
    p.add_argument("--validate", action="store_true",
                   help="run the device path against the NumPy oracle "
                        "(allclose check) and exit")
    p.add_argument("--json", action="store_true",
                   help="print metrics as one JSON line")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from njw_tpu.weather import SimConfig, Simulation

    if args.device_info:
        from njw_tpu.platform import get_device_info

        print(json.dumps(get_device_info()))
        return 0

    if args.validate:
        return _validate(args)

    cfg = SimConfig(
        model=args.model, grid_width=args.width, grid_height=args.height,
        num_levels=args.levels, dx=args.dx, dy=args.dy, dt=args.dt,
        integration_method=args.method, boundary_condition=args.bc, grid_type=args.grid_type,
        coriolis_f=args.coriolis, beta=args.beta, viscosity=args.viscosity,
        backend=args.backend, max_steps=args.steps,
        output_interval=args.output_interval, si_order=args.si_order,
    )
    if args.model == "primitive" and args.initial == "vortex":
        args.initial = "baroclinic"  # PE default (vortex is SWE-only)
    if args.grid_type == "spherical_harmonic" and args.initial == "vortex":
        # Cartesian ICs have no spherical meaning; pick the canonical one.
        args.initial = ("rossby_haurwitz" if args.model == "barotropic"
                        else "williamson2")
    sim_kw = {}
    if args.mountain_height > 0.0:
        if args.model != "primitive":
            print("error: --mountain-height requires --model primitive",
                  file=sys.stderr)
            return 2
        import numpy as np

        y, x = np.mgrid[0:args.height, 0:args.width].astype(np.float32)
        cy, cx = (args.height - 1) / 2, (args.width - 1) / 2
        sy, sx = max(args.height / 8, 1), max(args.width / 8, 1)
        sim_kw["orography"] = args.mountain_height * np.exp(
            -(((y - cy) / sy) ** 2 + ((x - cx) / sx) ** 2))
    if args.nest_patch is not None:
        if args.model != "shallow_water" or args.grid_type != "cartesian":
            print("error: --nest-patch requires --model shallow_water on "
                  "the cartesian grid", file=sys.stderr)
            return 2
        from njw_tpu.weather.nested import make_nested_sim

        patch = tuple(int(t) for t in args.nest_patch.split(","))
        sim = make_nested_sim(Simulation, cfg, args.initial,
                              patch=patch, ratio=args.nest_ratio, **sim_kw)
    else:
        sim = Simulation.from_config(cfg, args.initial, **sim_kw)
    callback = None
    if args.output_format:
        from njw_tpu.weather.output import OutputConfig, attach_output

        _, callback = attach_output(
            sim, OutputConfig(path=args.output_dir,
                              format=args.output_format))
    # Warm-up/compile outside the timed region, then reset metrics.
    sim.step(1)
    sim.metrics.reset() if hasattr(sim.metrics, "reset") else None
    sim.metrics.total_time_ms = sim.metrics.compute_time_ms = 0.0
    sim.metrics.num_steps = 0
    sim.run(args.steps - 1, output_interval=args.output_interval,
            callback=callback)

    m = sim.metrics.as_dict()
    if args.json:
        print(json.dumps(m))
    else:
        print(f"model={args.model} grid={args.width}x{args.height} "
              f"method={args.method} steps={args.steps}")
        for k, v in m.items():
            print(f"  {k}: {v:,.3f}" if isinstance(v, float) else f"  {k}: {v}")

    if args.output:
        import numpy as np

        payload = {f"final_{k}": v for k, v in
                   (sim.output_fn(sim.state) if sim.output_fn else {}).items()}
        np.savez_compressed(args.output,
                            **{k: np.asarray(v) for k, v in payload.items()})
        print(f"wrote {args.output}")
    return 0


def _validate(args) -> int:
    """Device-vs-oracle allclose check (the BASELINE correctness bar,
    run on demand from the CLI)."""
    import numpy as np

    from njw_tpu.weather import SimConfig, Simulation, make_initial_state
    from njw_tpu.weather.grid import GridSpec
    from njw_tpu.weather.oracle import SWEOracle

    if args.method not in ("euler", "rk2", "rk4", "adams_bashforth"):
        # semi_implicit has no matching oracle integrator; comparing it
        # against an RK4 oracle run would spuriously fail (ADVICE r1)
        print(json.dumps({"error": f"--validate does not support "
                          f"--method {args.method}: the oracle integrates "
                          "explicitly; use euler/rk2/rk4/adams_bashforth"}))
        return 2

    n = min(args.width, 128)
    steps = min(args.steps, 200)
    grid = GridSpec(nx=n, ny=n, bc=args.bc)
    s0 = make_initial_state(args.initial, grid, strength=2.0) \
        if args.initial == "vortex" else make_initial_state(args.initial, grid)
    cfg = SimConfig(grid_width=n, grid_height=n, dt=args.dt,
                    integration_method=args.method,
                    boundary_condition=args.bc, grid_type=args.grid_type, backend=args.backend,
                    coriolis_f=args.coriolis)
    ic_kw = {"strength": 2.0} if args.initial == "vortex" else {}
    sim = Simulation.from_config(cfg, args.initial, **ic_kw)
    sim.step(steps)
    method = args.method
    u, v, h = SWEOracle(bc=args.bc, coriolis_f=args.coriolis).run(
        (np.asarray(s0.u), np.asarray(s0.v), np.asarray(s0.h)),
        args.dt, steps, method)
    diff = float(np.max(np.abs(np.asarray(sim.state.h) - h)))
    ok = bool(np.isfinite(diff) and diff < 1e-3 * max(np.abs(h).max(), 1.0))
    print(json.dumps({"grid": n, "steps": steps, "method": method,
                      "max_abs_diff_h": diff, "allclose": ok}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
