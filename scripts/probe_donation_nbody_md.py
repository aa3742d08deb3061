"""TPU probe: does scan-carry donation also pessimize the N-body and MD
chunk executables? (Same methodology as probe_step_overhead.py —
scan-length differentials, hard D2H sync, same-session A/B.)

Prints one JSON line per measurement.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass


def scan_diff(sim, n, leaf_fn):
    import numpy as np

    def once(k):
        t0 = time.perf_counter()
        sim.step(k)
        _ = np.asarray(leaf_fn(sim)[:4])
        return time.perf_counter() - t0

    once(n)
    once(2 * n)
    t1 = once(n)
    t2 = once(2 * n)
    return (t2 - t1) / n * 1e3


def main():
    _cache()
    import numpy as np

    from njw_tpu.md.simulation import MDSimulation
    from njw_tpu.md.system import create_lj_fluid
    from njw_tpu.nbody.simulation import NBodySimulation
    from njw_tpu.nbody.system import create_random_system

    for donate in (False, True):
        sys_ = create_random_system(8192, seed=0)
        # dt tiny: keeps the random box finite over the 300 probe steps;
        # step cost is dt-independent
        sim = NBodySimulation(sys_, integrator="leapfrog", dt=1e-7,
                              donate=donate)
        ms = scan_diff(sim, 50, lambda s: s.system.pos)
        assert bool(np.isfinite(np.asarray(sim.system.pos)).all())
        print(json.dumps({"probe": f"nbody direct N=8192 donate={donate}",
                          "ms_per_step": round(ms, 4)}), flush=True)

    for donate in (False, True):
        st, topo, lj = create_lj_fluid(4096, T0=1.0, seed=0)
        sim = MDSimulation(st, topo, lj, dt=0.002, donate=donate)
        ms = scan_diff(sim, 50, lambda s: s.state.pos)
        assert bool(np.isfinite(np.asarray(sim.state.pos)).all())
        print(json.dumps({"probe": f"MD LJ N=4096 donate={donate}",
                          "ms_per_step": round(ms, 4)}), flush=True)


if __name__ == "__main__":
    main()
