"""TPU measurement: SWE fused-kernel strip-height sweep + barotropic.

Scan-length differential per CLAUDE.md (t(2N) - t(N), D2H-synced, warmed
at the exact chunk lengths). Usage:
  python scripts/measure_swe.py [--what swe|baro|both]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GRID = 2048
STEPS = 250


def _jit_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass


def measure_swe(by: int, variant: str = "base"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from njw_tpu.ops.stencil import swe_rk4_step_pallas
    from njw_tpu.weather.grid import GridSpec
    from njw_tpu.weather.ics import make_initial_state

    grid = GridSpec(nx=GRID, ny=GRID)
    s = make_initial_state("vortex", grid, strength=2.0)
    u, v, h = s.u, s.v, s.h

    def chunk(n):
        @jax.jit
        def run(u, v, h):
            def body(c, _):
                return swe_rk4_step_pallas(
                    *c, grid=grid, dt=0.001, coriolis_f=1e-4, by=by,
                    variant=variant), None

            (u, v, h), _ = jax.lax.scan(body, (u, v, h), None, length=n)
            return u, v, h

        return run

    r1, r2 = chunk(STEPS), chunk(2 * STEPS)

    def once(r):
        nonlocal u, v, h
        t0 = time.perf_counter()
        u, v, h = r(u, v, h)
        _ = np.asarray(h[:4, :4])
        return time.perf_counter() - t0

    once(r1)
    once(r2)
    t1 = once(r1)
    t2 = once(r2)
    ms = (t2 - t1) / STEPS * 1e3
    assert bool(np.isfinite(np.asarray(h)).all())
    print(json.dumps({
        "config": f"SWE {GRID}^2 rk4 fused pallas by={by} {variant}",
        "ms_per_step": round(ms, 4),
        "grid_points_per_s": round(GRID * GRID / (ms / 1e3), 0),
    }), flush=True)


def measure_baro(n: int = 1024):
    import numpy as np

    from njw_tpu.weather import SimConfig, Simulation

    for backend in ("pallas", "xla"):
        cfg = SimConfig(model="barotropic", grid_width=n, grid_height=n,
                        dt=0.01, integration_method="rk4", beta=1e-3,
                        viscosity=1e-4, backend=backend)
        sim = Simulation.from_config(cfg, "vortex", strength=3.0)

        def run(k):
            t0 = time.perf_counter()
            sim.step(k)
            _ = np.asarray(sim.state.zeta[:4, :4])
            return time.perf_counter() - t0

        run(50)
        run(100)
        t1 = run(50)
        t2 = run(100)
        ms = (t2 - t1) / 50 * 1e3
        assert bool(np.isfinite(np.asarray(sim.state.zeta)).all())
        print(json.dumps({
            "config": f"barotropic {n}^2 rk4 {backend}",
            "stepper": sim.stepper.name,
            "ms_per_step": round(ms, 4),
            "grid_points_per_s": round(n * n / (ms / 1e3), 0),
        }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="both")
    ap.add_argument("--by", type=int, default=None)
    ap.add_argument("--variants", default="base")
    args = ap.parse_args()
    _jit_cache()
    if args.what in ("swe", "both"):
        for variant in args.variants.split(","):
            for by in ([args.by] if args.by else [64, 128]):
                measure_swe(by, variant)
    if args.what in ("baro", "both"):
        measure_baro()


if __name__ == "__main__":
    main()
