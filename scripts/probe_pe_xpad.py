"""TPU probe: small-xpad variants of the whole-RK4 fused PE kernel.

The r4 note recorded "xpad=8 rejected by Mosaic" — but that experiment
predated the slice-shift switch in _pe_tend_values (pltpu.roll's dynamic
rotate was the op that rejected non-128-aligned widths). With shifts now
lowered as static slice+concat, non-aligned frame widths may compile,
and the (by+8)(bx+2*xpad)/(by*bx) pad-compute factor at BASELINE
config 5 would fall 1.875 -> 1.328 (xpad=8) — predicted ~41 ms/step at
the measured ~5.5G padded-cells/s rate vs the current 57.6.

Each candidate costs exactly ONE compile (an N-step scan): timing is
the chained-call differential (t(3 calls) - t(1 call)) / 2 like
bench.py — the ~43 ms per-invocation overhead stays in (identical for
every candidate, <3% at N>=25), which halves the multi-hour remote
compile bill of the scan-length method at config-5 kernel sizes.
Correctness piggybacks: later candidates' N-step outputs are compared
on-chip against the first (reference) candidate's.

Usage: python scripts/probe_pe_xpad.py --config 4|5 \
         [--cands "by,bx,xpad;..."] [--steps N]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_probe(nx, ny, L, steps, candidates):
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass

    from njw_tpu.ops.pe_stencil import pe_rk4_step_pallas
    from njw_tpu.weather.grid import GridSpec
    from njw_tpu.weather.primitive import pe_initial_state

    grid = GridSpec(nx=nx, ny=ny, levels=L, dx=1e5, dy=1e5, bc="periodic")
    dt = 20.0
    s0 = pe_initial_state(grid, u_jet=10.0, perturb=0.5)
    s0 = jax.device_put(s0)

    def make_scan(by, bx, xpad, n, cap=100):
        step = functools.partial(
            pe_rk4_step_pallas, grid=grid, dt=dt, coriolis_f=1e-4,
            by=by, bx=bx, xpad=xpad, vmem_cap_mb=cap)

        @jax.jit
        def scan(s):
            def body(c, _):
                return step(c), None
            out, _ = jax.lax.scan(body, s, None, length=n)
            return out
        return scan

    def sync(s):
        _ = np.asarray(s.ps[:4, :4])

    ref_out = None
    for cand in candidates:
        by, bx, xpad = cand[:3]
        cap = cand[3] if len(cand) > 3 else 100
        rec = {"config": f"PE {nx}x{ny}x{L}", "by": by, "bx": bx,
               "xpad": xpad, "steps": steps, "vmem_cap_mb": cap,
               "pad_factor": round((by + 8) * (bx + 2 * xpad)
                                   / (by * bx), 3)}
        try:
            scn = make_scan(by, bx, xpad, steps, cap)
            t0 = time.perf_counter()
            out_n = scn(s0)
            sync(out_n)
            rec["compile_plus_first_s"] = round(time.perf_counter() - t0, 1)
            if ref_out is None:
                ref_out = out_n
            else:
                md = max(float(jnp.max(jnp.abs(out_n.ps - ref_out.ps))),
                         float(jnp.max(jnp.abs(out_n.u - ref_out.u))))
                rec["maxdiff_vs_ref"] = md
                if not (np.isfinite(md) and md < 1e-2):
                    rec["error"] = "MISMATCH vs reference candidate"
                    print(json.dumps(rec), flush=True)
                    continue

            def chain(k):
                t0 = time.perf_counter()
                s = s0
                for _ in range(k):
                    s = scn(s)
                sync(s)
                return time.perf_counter() - t0

            chain(1)  # warm
            t1 = chain(1)
            t3 = chain(3)
            ms = (t3 - t1) / 2.0 / steps * 1e3
            rec["ms_per_step_driverstyle"] = round(ms, 3)
        except Exception as e:  # compile failures are data, not crashes
            rec["error"] = f"{type(e).__name__}: {str(e)[:300]}"
        print(json.dumps(rec), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=4, choices=(4, 5))
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--cands", type=str, default=None,
                    help="semicolon list 'by,bx,xpad;...'")
    args = ap.parse_args()
    if args.cands:
        cands = [tuple(int(v) for v in c.split(","))
                 for c in args.cands.split(";")]
    elif args.config == 4:
        # default pick is (32, 512); probe small xpads at the same block
        cands = [(32, 512, 64), (32, 512, 8), (32, 512, 4)]
    else:
        # default pick is (32, 256) xpad=64 (pad 1.875). Small-xpad
        # candidates incl. wider bx that only fits VMEM at small xpad.
        cands = [(32, 256, 64), (32, 256, 8), (32, 512, 8)]
    if args.config == 4:
        run_probe(512, 512, 20, args.steps or 40, cands)
    else:
        run_probe(2048, 2048, 40, args.steps or 10, cands)


if __name__ == "__main__":
    main()
