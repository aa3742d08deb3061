"""TPU rows for the r3 capability cores + semi-implicit time-to-solution.

VERDICT r4 #5: the icosahedral (measure_icosa.py), staggered C-grid,
nested, and semi-implicit paths had never been measured on the TPU.
This script produces the missing rows with the repo's standard
differential timing (t(2N)-t(N), D2H-hard-synced, exact-length warmups).

Semi-implicit pricing (the metric that justifies the method): simulated
seconds per wallclock second = dt / ms_per_step * 1000, each method at
its own stable dt (RK4 at the explicit gravity-wave CFL; semi-implicit
at the several-x dt the stability tests validate). Accuracy matching is
measured on CPU (--which accuracy — numerics are platform-independent);
wallclock on TPU.

Usage: python scripts/measure_capability_cores.py --which \
         staggered|nested|si_swe|si_pe|si_sph|accuracy
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _cache():
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return  # the AOT cache is TPU-compile amortization; noisy on CPU
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass


def _sim_ms_per_step(sim, steps, sync_field):
    """Chained-chunk differential ms/step for a Simulation: ONE compiled
    chunk executable ((t3-t1)/2, bench.py method) — halves the remote
    compile bill vs the scan-length method; the constant ~43 ms
    per-invocation cost stays in (identical across compared methods)."""
    import numpy as np

    def sync():
        _ = np.asarray(getattr(sim.state, sync_field)[:4, :4])

    def run(n_chunks):
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            sim.step(steps)
        sync()
        return time.perf_counter() - t0

    run(1)  # compile + warm
    t1 = run(1)
    t3 = run(3)
    assert bool(np.isfinite(
        np.asarray(getattr(sim.state, sync_field))).all()), "blew up"
    return (t3 - t1) / 2.0 / steps * 1e3


def staggered():
    """Arakawa C-grid SWE (Sadourny scheme), XLA path."""
    from njw_tpu.weather import SimConfig, Simulation

    for n, steps in ((1024, 100), (2048, 25)):
        cfg = SimConfig(grid_width=n, grid_height=n, dt=0.01,
                        grid_type="staggered", coriolis_f=1e-4,
                        backend="xla")
        sim = Simulation.from_config(cfg, "vortex", strength=1.0)
        ms = _sim_ms_per_step(sim, steps, "h")
        print(json.dumps({
            "core": "staggered_cgrid_swe", "grid": n,
            "ms_per_step": round(ms, 3),
            "gpts_per_s": round(n * n / ms / 1e6, 2),
        }), flush=True)


def nested():
    """Two-way nested SWE: coarse 512^2 + ratio-2 fine patch over the
    central quarter (the capability test's shape at production scale)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from njw_tpu.weather.grid import GridSpec, PhysicsParams, WeatherState
    from njw_tpu.weather.ics import make_initial_state
    from njw_tpu.weather.nested import (
        NestedGrid, NestedState, make_nested_swe_stepper,
    )

    n = 512
    g = GridSpec(nx=n, ny=n)
    params = PhysicsParams(coriolis_f=1e-4)
    nest = NestedGrid(g, patch=(n // 4, 3 * n // 4, n // 4, 3 * n // 4),
                      ratio=2)
    dt = 0.02
    stepper = make_nested_swe_stepper(g, params, nest, dt=dt)
    c0 = make_initial_state("vortex", g, strength=1.0)
    c0 = WeatherState(u=c0.u, v=c0.v, h=c0.h)
    f0 = WeatherState(u=nest.prolong(c0.u), v=nest.prolong(c0.v),
                      h=nest.prolong(c0.h))
    s0 = NestedState(coarse=c0, fine=f0)
    carry0 = stepper.init(s0)

    def make_run(k):
        @jax.jit
        def run(cs):
            def body(c_s, _):
                c, st = c_s
                return stepper.step(c, st, jnp.float32(dt)), None

            return jax.lax.scan(body, cs, None, length=k)[0]

        return run

    steps = 50
    runs = {k: make_run(k) for k in (steps, 2 * steps)}

    def once(k):
        t0 = time.perf_counter()
        _, out = runs[k]((carry0, s0))
        _ = np.asarray(out.coarse.h[:4, :4])
        return time.perf_counter() - t0

    once(steps)
    once(2 * steps)
    t1 = once(steps)
    t2 = once(2 * steps)
    ms = (t2 - t1) / steps * 1e3
    eff_pts = n * n + (n // 2 * 2) ** 2 * 2  # coarse + fine at 2x substeps
    print(json.dumps({
        "core": "nested_swe", "coarse": n, "ratio": 2,
        "patch": "central quarter",
        "ms_per_step": round(ms, 3),
        "note": f"coarse step + 2 fine substeps on {n}^2 fine patch",
        "eff_pts_per_s": round(eff_pts / ms / 1e6, 2),
    }), flush=True)


def _scanlen_pair(mk_sim, pairs, sync_field, label, k):
    """Overhead-free pricing pair: T = t(2k-step call) - t(k-step call),
    ONE timed invocation per length (the 25-40 ms per-invocation tunnel
    cost cancels exactly), exact-length warmups, and a STATE RESET to
    s0 before every run so no run exceeds 2k steps from the IC (several
    SI configs are only validated stable over a bounded horizon)."""
    import numpy as np

    for method, dt, *rest in pairs:
        order = rest[0] if rest else 1
        sim = mk_sim(method, dt, order)
        s0 = sim.state

        def once(n, sim=sim, s0=s0):
            sim.state = s0
            t0 = time.perf_counter()
            sim.step(n)
            _ = np.asarray(getattr(sim.state, sync_field)[:4, :4])
            el = time.perf_counter() - t0
            assert bool(np.isfinite(np.asarray(
                getattr(sim.state, sync_field))).all()), "blew up"
            return el

        once(k), once(2 * k)  # compile + warm both lengths
        vals = sorted((once(2 * k) - once(k)) / k * 1e3 for _ in range(3))
        T = vals[1]
        print(json.dumps({
            "core": label, "method": method, "dt": dt, "si_order": order,
            "ms_per_step": round(T, 4), "stepper": sim.stepper.name,
            "method_note": "scan-length differential, state reset",
            "sim_seconds_per_wall_second": round(dt / T * 1e3, 1),
        }), flush=True)


def _si_pair(mk_sim, pairs, sync_field, label, steps):
    for method, dt, *rest in pairs:
        order = rest[0] if rest else 1
        sim = mk_sim(method, dt, order)
        ms = _sim_ms_per_step(sim, steps, sync_field)
        print(json.dumps({
            "core": label, "method": method, "dt": dt, "si_order": order,
            "ms_per_step": round(ms, 4),
            "stepper": sim.stepper.name,
            "sim_seconds_per_wall_second": round(dt / ms * 1e3, 1),
        }), flush=True)


def si_swe():
    """Planar SWE: fused-RK4 Pallas kernel at the gravity-wave CFL vs
    semi-implicit (XLA, spectral Helmholtz) at 5x dt."""
    from njw_tpu.weather import SimConfig, Simulation

    n = 512

    def mk(method, dt, order=1):
        # viscosity 1e-3 on BOTH legs (a fair pair): even order-2 SI
        # tips into the weak advective instability on TPU rounding at
        # 500 inviscid steps (CPU-stable, TPU-NaN) — operational SI
        # always carries dissipation, and with it the pair is robustly
        # stable on both platforms (CPU scan: maxdev ~1e-3 at step 500)
        cfg = SimConfig(grid_width=n, grid_height=n, dt=dt,
                        integration_method=method, coriolis_f=1e-4,
                        si_order=order, viscosity=1e-3)
        # jet_stream: the vortex IC blows up under order-1 SI's explicit
        # advection over the 500-step measured horizon (CPU-verified);
        # the jet at 2 m/s is the stability test's validated IC
        return Simulation.from_config(cfg, "jet_stream", strength=2.0)

    # CFL: c = sqrt(g*10) ~ 9.9 m/s at dx=1 -> explicit dt ~ 0.07.
    # 20-step chunks (100-step total horizon): the jet is barotropically
    # unstable and on THIS backend the SI path's matmul-FFT rounding
    # seeds the shear mode (blows ~step 260 at ANY viscosity, incl.
    # 1e-2; CPU runs 500 steps flat at 1e-3 maxdev) — ms/step is
    # state-independent, so the row measures the pre-instability window
    # and BENCH_NOTES records the caveat.
    _scanlen_pair(mk, [("rk4", 0.05), ("semi_implicit", 0.25, 2)], "h",
                  f"planar_swe_{n}", 100)


def si_pe():
    """PE config-4 scale: fused whole-RK4 kernel at the Lamb-mode CFL
    (~240 s at dx=1e5) vs semi-implicit vertical-normal-mode Helmholtz
    at 900 s (the stability test's validated dt)."""
    from njw_tpu.weather import SimConfig, Simulation

    def mk(method, dt, order=1):
        cfg = SimConfig(model="primitive", grid_width=512, grid_height=512,
                        num_levels=20, dx=1e5, dy=1e5, dt=dt,
                        integration_method=method, coriolis_f=1e-4,
                        si_order=order)
        return Simulation.from_config(cfg, "baroclinic", u_jet=5.0,
                                      perturb=0.5)

    # CPU-scanned over the full 150-step horizon: order-1 diverges at
    # every tested dt (900/600 by ~60 steps); order-2 diverges at 900
    # and 600 but is stable at 450 — the honest multi-x-CFL config.
    # k=50: the longest single run is 100 steps < the validated 150
    _scanlen_pair(mk, [("rk4", 240.0), ("semi_implicit", 450.0, 2)], "ps",
                  "pe_512x512x20", 50)


def si_sph():
    """Global spectral SWE at T170: RK4 at the gravity-wave CFL vs the
    per-coefficient Crank-Nicolson stepper at 4x dt."""
    from njw_tpu.weather import SimConfig, Simulation

    def mk(method, dt, order=1):
        cfg = SimConfig(model="shallow_water", grid_width=512,
                        grid_height=256, grid_type="spherical_harmonic",
                        dt=dt, integration_method=method, si_order=order)
        return Simulation.from_config(cfg, "rossby_haurwitz", nu4=1e15)

    # order-2 SI at 2x the RK4 dt: CPU-verified stable over the measured
    # horizon, where order 1 is NOT (the RH wave's explicit advection
    # under plain CN splitting diverges even at dt=240 by ~120 steps);
    # dt=960 exceeds the ADVECTIVE CFL (~780 s at T170) for any method.
    # k=40: longest single run is 80 steps < the validated 200
    _scanlen_pair(mk, [("rk4", 240.0), ("semi_implicit", 480.0, 2)], "phi",
                  "spherical_swe_T170", 40)


def accuracy():
    """CPU accuracy matching for the semi-implicit pairs: both methods
    vs an RK4 small-dt truth after a fixed horizon (numerics are
    platform-independent; run with PYTHONPATH= JAX_PLATFORMS=cpu)."""
    import numpy as np

    from njw_tpu.weather import SimConfig, Simulation

    # planar SWE at 128^2 (same CFL numbers as 512^2: dx fixed at 1)
    def swe(method, dt):
        cfg = SimConfig(grid_width=128, grid_height=128, dt=dt,
                        integration_method=method, coriolis_f=1e-4,
                        backend="xla")
        return Simulation.from_config(cfg, "vortex", strength=0.5)

    horizon = 10.0
    truth = swe("rk4", 0.01)
    truth.step(int(horizon / 0.01))
    h_t = np.asarray(truth.state.h)
    for method, dt in (("rk4", 0.05), ("semi_implicit", 0.05),
                       ("semi_implicit", 0.1), ("semi_implicit", 0.25)):
        sim = swe(method, dt)
        sim.step(int(horizon / dt))
        err = float(np.abs(np.asarray(sim.state.h) - h_t).max()
                    / (np.abs(h_t - 10.0).max() + 1e-30))
        print(json.dumps({"core": "planar_swe", "method": method,
                          "dt": dt, "rel_err_vs_truth": round(err, 4)}),
              flush=True)

    # PE at 64^2 x 5
    def pe(method, dt):
        cfg = SimConfig(model="primitive", grid_width=64, grid_height=64,
                        num_levels=5, dx=1e5, dy=1e5, dt=dt,
                        integration_method=method, coriolis_f=1e-4,
                        backend="xla")
        return Simulation.from_config(cfg, "baroclinic", u_jet=5.0,
                                      perturb=0.5)

    horizon = 36000.0
    truth = pe("rk4", 30.0)
    truth.step(int(horizon / 30.0))
    ps_t = np.asarray(truth.state.ps)
    for method, dt in (("rk4", 240.0), ("semi_implicit", 240.0),
                       ("semi_implicit", 450.0), ("semi_implicit", 900.0)):
        sim = pe(method, dt)
        sim.step(int(horizon / dt))
        err = float(np.abs(np.asarray(sim.state.ps) - ps_t).max()
                    / (np.abs(ps_t - ps_t.mean()).max() + 1e-30))
        print(json.dumps({"core": "pe", "method": method, "dt": dt,
                          "rel_err_vs_truth": round(err, 4)}), flush=True)


def main():
    _cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", required=True,
                    choices=("staggered", "nested", "si_swe", "si_pe",
                             "si_sph", "accuracy"))
    args = ap.parse_args()
    globals()[args.which]()


if __name__ == "__main__":
    main()
