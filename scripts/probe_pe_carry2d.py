"""TPU A/B: 2-D sharded fused-PE forms on a (1,1) mesh proxy.

Same-session comparison (VERDICT r4 #3): carry form
(pe_rk4_pallas_carry2d — persistent 2-D-padded carry, no per-step
concat) vs the r4 concat form (pad_2d4 + pe_rk4_pallas_local2d) vs the
bare single-chip fused kernel at the same shape. The (1,1) mesh is the
r4 sharding-overhead proxy: ppermute is a self-copy, so the delta vs
the bare kernel is pure decomposition overhead.

Shape: 1024x512x20 (config-5 aspect at L=20 so full-width strips fit
one chip's VMEM).

Usage: python scripts/probe_pe_carry2d.py [--steps 40]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass

    from njw_tpu.parallel.halo import (
        sharded_pe_step_pallas_fused_2d, sharded_state,
    )
    from njw_tpu.weather.grid import GridSpec, PhysicsParams
    from njw_tpu.weather.primitive import pe_initial_state

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--nx", type=int, default=512,
                    help="shard width (256 = the (1,8)-mesh config-5 "
                         "width, where carry and local pick the same by)")
    args = ap.parse_args()
    N = args.steps

    ny, nx, L = 1024, args.nx, 20
    grid = GridSpec(nx=nx, ny=ny, levels=L, dx=1e5, dy=1e5)
    params = PhysicsParams(coriolis_f=1e-4)
    s0 = pe_initial_state(grid, u_jet=10.0, perturb=0.5)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("y", "x"))
    s0s = sharded_state(s0, mesh)

    def sync(s):
        _ = np.asarray(jax.tree.leaves(s)[-1][:4, :4])

    def chain_time(call, arg, k3=3):
        def chain(k):
            t0 = time.perf_counter()
            s = arg
            for _ in range(k):
                s = call(s)
            sync(s)
            return time.perf_counter() - t0

        chain(1)  # warm
        t1 = chain(1)
        t3 = chain(k3)
        return (t3 - t1) / (k3 - 1) / N * 1e3

    ref = None
    for label, kw in (("carry2d", dict(carry=True)),
                      ("concat2d", dict(carry=False))):
        rec = {"probe": label, "shape": f"{ny}x{nx}x{L}"}
        try:
            r1 = sharded_pe_step_pallas_fused_2d(
                grid, params, mesh, dt=20.0, n_steps=N, **kw)
            t0 = time.perf_counter()
            out = r1(s0s)
            sync(out)
            rec["compile_plus_first_s"] = round(time.perf_counter() - t0, 1)
            if ref is None:
                ref = out
            else:
                md = float(jnp.max(jnp.abs(out.ps - ref.ps)))
                rec["maxdiff_vs_carry"] = md
            rec["ms_per_step_driverstyle"] = round(chain_time(r1, s0s), 3)
        except Exception as e:  # noqa: BLE001
            rec["error"] = f"{type(e).__name__}: {str(e)[:4000]}"
        print(json.dumps(rec), flush=True)

    # bare single-chip fused kernel, same shape (the overhead-free floor)
    from njw_tpu.ops.pe_stencil import pe_rk4_step_pallas

    def make_scan(n):
        @jax.jit
        def scan(s):
            def body(c, _):
                return pe_rk4_step_pallas(c, grid=grid, dt=20.0,
                                          coriolis_f=1e-4), None
            out, _ = jax.lax.scan(body, s, None, length=n)
            return out
        return scan

    try:
        r1 = make_scan(N)
        ms = chain_time(r1, s0)
        print(json.dumps({"probe": "bare_fused_kernel",
                          "ms_per_step_driverstyle": round(ms, 3)}),
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"probe": "bare_fused_kernel",
                          "error": str(e)[:4000]}), flush=True)


if __name__ == "__main__":
    main()
