"""TPU probe 3: isolate the sim-vs-bare executable gap.

Four scan-length differentials (t(2N)-t(N), D2H-synced), same kernel:
  1. bare tuple scan, no donation            (the measure_swe baseline)
  2. bare tuple scan, donate_argnums         (donation suspect)
  3. ((), WeatherState) carry scan, no donation (pytree suspect)
  4. sim._run_chunk (donation + pytree)      (the bench path)
Plus variant cross-check: slices vs base at by=64.

Prints one JSON line per measurement.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GRID = 2048
N = 1000


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass

    from njw_tpu.ops.stencil import swe_rk4_step_pallas
    from njw_tpu.weather import SimConfig, Simulation
    from njw_tpu.weather.grid import GridSpec, WeatherState
    from njw_tpu.weather.ics import make_initial_state

    grid = GridSpec(nx=GRID, ny=GRID)
    s0 = make_initial_state("vortex", grid, strength=1.0)

    def scan_diff(make_run, init, label):
        state = jax.tree.map(jnp.copy, init)

        def once(r, state):
            t0 = time.perf_counter()
            state = r(state)
            leaf = jax.tree.leaves(state)[0]
            _ = np.asarray(leaf[:4, :4])
            return time.perf_counter() - t0, state

        r1, r2 = make_run(N), make_run(2 * N)
        _, state = once(r1, state)
        _, state = once(r2, state)
        t1, state = once(r1, state)
        t2, state = once(r2, state)
        print(json.dumps({"probe": label,
                          "ms_per_step": round((t2 - t1) / N * 1e3, 4),
                          "t_N_s": round(t1, 3),
                          "t_2N_s": round(t2, 3)}), flush=True)

    def bare(n, donate, variant="slices"):
        def run(c):
            def body(c, _):
                return swe_rk4_step_pallas(
                    *c, grid=grid, dt=0.001, coriolis_f=1e-4,
                    variant=variant), None

            c, _ = jax.lax.scan(body, c, None, length=n)
            return c

        return jax.jit(run, donate_argnums=(0,) if donate else ())

    scan_diff(lambda n: bare(n, False), (s0.u, s0.v, s0.h),
              "1 bare tuple, no donate, slices")
    scan_diff(lambda n: bare(n, True), (s0.u, s0.v, s0.h),
              "2 bare tuple, DONATED, slices")

    def treed(n):
        def run(st):
            def body(cs, _):
                c, s = cs
                u, v, h = swe_rk4_step_pallas(
                    s.u, s.v, s.h, grid=grid, dt=0.001, coriolis_f=1e-4)
                return (c, WeatherState(u=u, v=v, h=h)), None

            (c, s), _ = jax.lax.scan(body, st, None, length=n)
            return (c, s)

        return jax.jit(run)

    scan_diff(treed, ((), WeatherState(u=s0.u, v=s0.v, h=s0.h)),
              "3 pytree carry, no donate, slices")

    cfg = SimConfig(grid_width=GRID, grid_height=GRID, dt=0.001,
                    integration_method="rk4", coriolis_f=1e-4)
    sim = Simulation.from_config(cfg, "vortex", strength=1.0)

    def simrun(n):
        def run(cs):
            return sim._run_chunk(cs[0], cs[1], n)

        return run

    scan_diff(simrun, (sim._carry, sim.state),
              "4 sim._run_chunk (donated+pytree)")

    scan_diff(lambda n: bare(n, False, "base"), (s0.u, s0.v, s0.h),
              "5 bare tuple, no donate, BASE variant")


if __name__ == "__main__":
    main()
