"""Measure the icosahedral SWE core on TPU vs CPU.

In-jit iteration-count differential with hard D2H syncs (the repo's
standard remote-TPU timing discipline). The operator weights ride as
pytree arguments.

  python scripts/measure_icosa.py                        # TPU rows
  PYTHONPATH= JAX_PLATFORMS=cpu python scripts/measure_icosa.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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

    from njw_tpu.weather.icosa import (
        EARTH_OMEGA, build_operators, swe_tendencies_icosa,
        williamson2_icosa,
    )

    platform = jax.devices()[0].platform
    sizes = [32, 64] if platform == "cpu" else [32, 64, 128, 256]

    for n in sizes:
        ops = build_operators(n)
        s0 = williamson2_icosa(ops)
        dt = jnp.float32(450.0 * 32 / n)

        @jax.jit
        def run(k, s, ops, dt=dt):
            def body(i, s):
                ax = lambda a, kk: jax.tree.map(
                    lambda si, ki: si + a * ki, s, kk)
                k1 = swe_tendencies_icosa(s, ops, omega=EARTH_OMEGA)
                k2 = swe_tendencies_icosa(ax(0.5 * dt, k1), ops,
                                          omega=EARTH_OMEGA)
                k3 = swe_tendencies_icosa(ax(0.5 * dt, k2), ops,
                                          omega=EARTH_OMEGA)
                k4 = swe_tendencies_icosa(ax(dt, k3), ops,
                                          omega=EARTH_OMEGA)
                comb = jax.tree.map(
                    lambda a, b, c, d: a + 2 * b + 2 * c + d, k1, k2, k3, k4)
                return jax.tree.map(
                    lambda si, ci: si + dt / 6.0 * ci, s, comb)
            return jax.lax.fori_loop(0, k, body, s)

        def once(k, s0=s0, run=run, ops=ops):
            t0 = time.perf_counter()
            out = run(k, s0, ops)
            np.asarray(out.h[0, :2, :2])  # hard D2H sync
            return time.perf_counter() - t0

        iters = 20 if n <= 128 else 10
        once(iters)
        once(2 * iters)
        vals = []
        for _ in range(3):
            t1 = once(iters)
            t2 = once(2 * iters)
            vals.append(max(t2 - t1, 1e-9) / iters * 1e3)
        cells = 10 * n * n
        ms = min(vals)
        print(json.dumps({
            "core": "icosa_swe", "n": n, "cells": cells,
            "ms_per_step": round(ms, 3),
            "mcells_per_s": round(cells / ms / 1e3, 1),
            "platform": platform}), flush=True)


if __name__ == "__main__":
    main()
