"""Headline benchmark: SWE 2048^2 RK4 grid-points/s on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no measured weather numbers (SURVEY §6), so
``vs_baseline`` is the fraction of HBM speed-of-light achieved — the
roofline the BASELINE targets at >=0.70. SoL model: an RK4 step is 4
stencil stages; a perfectly fused stage streams 3 fields in + 3 out at
4 B/point (f32) = 96 B/point/step. sol_steps_per_s = BW / (96 * npoints).
(The fused Pallas kernel's true traffic is ~26 B/point, so >1.0 is
reachable.)

Measurement notes (this backend's async queue can report readiness
early): timing is differential — run N steps and 2N steps, each hard-
synced by a device-to-host copy, and use t(2N) - t(N) so constant
overheads (dispatch, D2H) cancel.
"""
from __future__ import annotations

import json
import time


GRID = 2048
STEPS = 100
DT = 0.002  # CFL-safe at 2048^2 for the weak vortex used here


def _timed_steps(sim, n: int) -> float:
    """Seconds for n steps, hard-synced via D2H of one field."""
    import numpy as np

    t0 = time.perf_counter()
    sim.step(n)
    _ = np.asarray(sim.state.h[:8, :8])  # D2H forces real completion
    return time.perf_counter() - t0


def main() -> None:
    import jax
    import numpy as np

    # persistent compilation cache: this environment's remote compile takes
    # minutes per executable; cached reruns are instant
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — older jax without the option
        pass

    from njw_tpu.platform.device import detect
    from njw_tpu.weather import SimConfig, Simulation

    caps = detect()
    cfg = SimConfig(grid_width=GRID, grid_height=GRID, dt=DT,
                    integration_method="rk4", coriolis_f=1e-4)
    sim = Simulation.from_config(cfg, "vortex", strength=2.0)

    # compile + warm-up both chunk lengths (a scan length is part of the
    # compiled executable)
    _timed_steps(sim, STEPS)
    _timed_steps(sim, 2 * STEPS)

    t_short = _timed_steps(sim, STEPS)
    t_long = _timed_steps(sim, 2 * STEPS)
    assert bool(np.isfinite(np.asarray(sim.state.h)).all())

    elapsed = max(t_long - t_short, 1e-9)  # = STEPS steps of pure compute
    steps_per_s = STEPS / elapsed
    gps = GRID * GRID * steps_per_s

    bytes_per_point_step = 96.0  # 4 RK stages x (3 in + 3 out) x 4 B
    sol_steps_per_s = (caps.hbm_bandwidth_gbps * 1e9) / (
        bytes_per_point_step * GRID * GRID
    )
    vs_sol = steps_per_s / sol_steps_per_s

    print(json.dumps({
        "metric": f"SWE {GRID}x{GRID} RK4 grid-points/s (1 chip, "
                  f"{caps.generation})",
        "value": round(gps, 1),
        "unit": "grid-points/s",
        "vs_baseline": round(vs_sol, 4),
    }))


if __name__ == "__main__":
    main()
