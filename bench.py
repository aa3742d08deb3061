"""Headline benchmark: SWE 2048^2 RK4 grid-points/s on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no measured weather numbers (SURVEY §6), so
``vs_baseline`` is the fraction of HBM speed-of-light achieved — the
roofline the BASELINE targets at >=0.70. SoL model: an RK4 step is 4
stencil stages; a perfectly fused stage streams 3 fields in + 3 out at
4 B/point (f32) = 96 B/point/step. sol_steps_per_s = BW / (96 * npoints).

Measurement notes (this backend's async queue can report readiness early
and remote compiles take minutes): ONE scan executable is compiled; one
call and three chained calls of it are each timed with a hard D2H sync,
and (t3 - t1)/2 gives the per-chunk cost with the constant sync/dispatch
overhead of the measurement itself cancelled. This conservatively includes
real per-invocation cost (production runs also invoke chunk-wise); the
overhead-free kernel throughput (scan-length differential) is recorded in
BENCH_NOTES.md.
"""
from __future__ import annotations

import json
import time
from dataclasses import replace as dataclasses_replace


GRID = 2048
STEPS = 5000  # long chunks amortize this backend's ~43 ms/invocation
DT = 0.001  # CFL-safe at 2048^2 for the weak vortex used here
PARITY_STEPS = 12   # cheap on-chip kernel-vs-XLA gate before timing
PARITY_GRID = 512   # gate grid: same kernel path, much cheaper compiles


def main() -> None:
    import jax
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — older jax without the option
        pass

    from njw_tpu.platform.device import detect
    from njw_tpu.weather import SimConfig, Simulation

    caps = detect()
    cfg = SimConfig(grid_width=GRID, grid_height=GRID, dt=DT,
                    integration_method="rk4", coriolis_f=1e-4)
    # strength 1.0: stays in the stable regime over the full
    # 5x5000-step measurement horizon (t=25)
    sim = Simulation.from_config(cfg, "vortex", strength=1.0)

    # Correctness gate (VERDICT r3 #6): the fused-kernel path vs the
    # plain-XLA integrator, same IC, a few steps on the SAME device — so
    # every round's perf artifact is also a correctness artifact. Run at
    # 512^2 (same kernel code path, different block pick) to keep the two
    # extra remote compiles cheap; on-TPU kernel drift is <=2e-6/step
    # (BENCH_NOTES), so 1e-3 catches any real regression with huge
    # margin. The reference's benchmark never checks its results at all
    # (ref: benchmark_suite.py:565-584).
    parity_ok = True
    if sim.stepper.name != "rk4":  # a fused kernel path was selected
        pcfg = dataclasses_replace(cfg, grid_width=PARITY_GRID,
                                   grid_height=PARITY_GRID)
        ker = Simulation.from_config(pcfg, "vortex", strength=1.0)
        ref = Simulation.from_config(
            dataclasses_replace(pcfg, backend="xla"), "vortex", strength=1.0
        )
        assert ker.stepper.name != "rk4", "parity gate lost the kernel path"
        ker.step(PARITY_STEPS)
        ref.step(PARITY_STEPS)
        for a, b in ((ker.state.h, ref.state.h), (ker.state.u, ref.state.u),
                     (ker.state.v, ref.state.v)):
            parity_ok &= bool(np.allclose(np.asarray(a), np.asarray(b),
                                          rtol=1e-3, atol=1e-3))
        del ker, ref

    def sync():
        _ = np.asarray(sim.state.h[:8, :8])  # D2H forces real completion

    def timed(n_chunks: int) -> float:
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            sim.step(STEPS)
        sync()
        return time.perf_counter() - t0

    timed(1)  # single compile (one scan length) + warm-up
    t_one = timed(1)
    t_three = timed(3)
    assert bool(np.isfinite(np.asarray(sim.state.h)).all())

    elapsed = max((t_three - t_one) / 2.0, 1e-9)  # one STEPS-chunk
    steps_per_s = STEPS / elapsed
    gps = GRID * GRID * steps_per_s

    bytes_per_point_step = 96.0  # 4 RK stages x (3 in + 3 out) x 4 B
    sol_steps_per_s = (caps.hbm_bandwidth_gbps * 1e9) / (
        bytes_per_point_step * GRID * GRID
    )
    vs_sol = steps_per_s / sol_steps_per_s

    print(json.dumps({
        "metric": f"SWE {GRID}x{GRID} RK4 grid-points/s (1 chip, "
                  f"{caps.generation}, {sim.stepper.name})",
        "value": round(gps, 1),
        "unit": "grid-points/s",
        "vs_baseline": round(vs_sol, 4),
        "parity_ok": parity_ok,
    }))
    if not parity_ok:
        # fail loudly (ADVICE r4): a perf number without correctness is
        # not a result — nonzero exit so CI/driver runs can't miss it
        import sys

        print("PARITY FAILURE: kernel path diverged from the XLA "
              "integrator beyond 1e-3; see bench.py parity gate",
              file=sys.stderr)
        raise SystemExit(2)


if __name__ == "__main__":
    main()
