"""ONE-SESSION reconciliation of the SWE headline triplet (VERDICT r4
#7): the published 16.59 G kernel-only roof and the 12.94 G driver-style
headline were captured in different sessions with ~25% tunnel drift
between them. This captures all three in one process so the gap is a
ratio, not drift:

  1. kernel-only: scan-length differential t(2N)-t(N) of the bare fused
     kernel scan (the BENCH_NOTES roof method),
  2. driver-style: bench.py's chunked (t3-t1)/2 on Simulation.step
     (includes real per-invocation cost),
  3. parity gate: kernel vs XLA integrator at 512^2.

Usage: python scripts/reconcile_swe.py [--steps 1000] [--chunk 5000]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GRID = 2048


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass

    from dataclasses import replace as dc_replace

    from njw_tpu.ops.stencil import swe_rk4_step_pallas
    from njw_tpu.weather import SimConfig, Simulation
    from njw_tpu.weather.grid import GridSpec
    from njw_tpu.weather.ics import make_initial_state

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--chunk", type=int, default=5000)
    args = ap.parse_args()
    N = args.steps

    grid = GridSpec(nx=GRID, ny=GRID)
    s0 = make_initial_state("vortex", grid, strength=1.0)
    dt = 0.001

    # 1. kernel-only scan-length differential (bare tuple carry)
    def make_run(n):
        @jax.jit
        def run(u, v, h):
            def body(c, _):
                return swe_rk4_step_pallas(*c, grid=grid, dt=dt,
                                           coriolis_f=1e-4), None
            (u2, v2, h2), _ = jax.lax.scan(body, (u, v, h), None, length=n)
            return u2, v2, h2
        return run

    def once(r, state):
        t0 = time.perf_counter()
        state = r(*state)
        _ = np.asarray(state[2][:4, :4])
        return time.perf_counter() - t0, state

    state = (s0.u, s0.v, s0.h)
    r1, r2 = make_run(N), make_run(2 * N)
    _, state = once(r1, state)
    _, state = once(r2, state)
    t1, state = once(r1, state)
    t2, state = once(r2, state)
    ms_kernel = (t2 - t1) / N * 1e3
    print(json.dumps({
        "probe": "kernel_only_scan_diff", "ms_per_step": round(ms_kernel, 4),
        "gpts_per_s": round(GRID * GRID / ms_kernel / 1e6, 2)}), flush=True)

    # 2. driver-style chunked (the bench.py method, same session)
    cfg = SimConfig(grid_width=GRID, grid_height=GRID, dt=dt,
                    integration_method="rk4", coriolis_f=1e-4)
    sim = Simulation.from_config(cfg, "vortex", strength=1.0)

    def sync():
        _ = np.asarray(sim.state.h[:8, :8])

    def timed(n_chunks):
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            sim.step(args.chunk)
        sync()
        return time.perf_counter() - t0

    timed(1)
    t_one = timed(1)
    t_three = timed(3)
    ms_driver = (t_three - t_one) / 2.0 / args.chunk * 1e3
    print(json.dumps({
        "probe": "driver_style_chunked", "ms_per_step": round(ms_driver, 4),
        "gpts_per_s": round(GRID * GRID / ms_driver / 1e6, 2),
        "stepper": sim.stepper.name,
        "per_invocation_overhead_ms": round(
            (ms_driver - ms_kernel) * args.chunk, 1)}), flush=True)

    # 3. parity gate at 512^2 (same session)
    pcfg = dc_replace(cfg, grid_width=512, grid_height=512)
    ker = Simulation.from_config(pcfg, "vortex", strength=1.0)
    ref = Simulation.from_config(dc_replace(pcfg, backend="xla"),
                                 "vortex", strength=1.0)
    ker.step(12)
    ref.step(12)
    ok = all(bool(np.allclose(np.asarray(a), np.asarray(b),
                              rtol=1e-3, atol=1e-3))
             for a, b in ((ker.state.h, ref.state.h),
                          (ker.state.u, ref.state.u),
                          (ker.state.v, ref.state.v)))
    print(json.dumps({
        "probe": "parity_gate_512", "parity_ok": ok,
        "kernel_vs_driver_ratio": round(ms_driver / ms_kernel, 3)}),
        flush=True)


if __name__ == "__main__":
    main()
