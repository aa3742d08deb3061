"""TPU probe: donation A/B on the sharded SWE Pallas path, 1-device mesh.

The sharded step is the production multi-chip path (shard_map + ppermute
halo + fused kernel); a 1-device mesh on the real chip measures its scan
body without needing a pod. Scan-length differential, hard D2H sync.

Prints one JSON line per measurement.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GRID = 2048
N = 250


def main():
    import jax
    import numpy as np
    from jax.sharding import Mesh

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass

    from njw_tpu.parallel.halo import sharded_state, sharded_swe_step_pallas
    from njw_tpu.weather.grid import GridSpec, PhysicsParams, WeatherState
    from njw_tpu.weather.ics import make_initial_state

    grid = GridSpec(nx=GRID, ny=GRID)
    params = PhysicsParams(coriolis_f=1e-4)
    mesh = Mesh(np.array(jax.devices()[:1]), ("y",))

    for donate in (False, True):
        s0 = make_initial_state("vortex", grid, strength=1.0)
        s0 = WeatherState(u=s0.u, v=s0.v, h=s0.h)
        st = sharded_state(s0, mesh)
        step_n = sharded_swe_step_pallas(grid, params, mesh, dt=0.001,
                                         n_steps=N, donate=donate)
        step_2n = sharded_swe_step_pallas(grid, params, mesh, dt=0.001,
                                          n_steps=2 * N, donate=donate)

        def once(fn, st):
            t0 = time.perf_counter()
            st = fn(st)
            _ = np.asarray(st.h[:4, :4])
            return time.perf_counter() - t0, st

        _, st = once(step_n, st)
        _, st = once(step_2n, st)
        t1, st = once(step_n, st)
        t2, st = once(step_2n, st)
        assert bool(np.isfinite(np.asarray(st.h)).all())
        print(json.dumps({
            "probe": f"sharded SWE pallas 1-dev mesh donate={donate}",
            "ms_per_step": round((t2 - t1) / N * 1e3, 4)}), flush=True)


if __name__ == "__main__":
    main()
