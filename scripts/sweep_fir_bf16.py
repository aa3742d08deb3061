"""Tuning sweep for the batch-FIR kernels on the real TPU.

Re-measures the f32 lanes kernel and the bf16 kernel across block shapes
with the in-jit chained differential at higher iteration counts (the
headline table's K=2 base count has visible run-to-run spread on the
shared tunnel).

Usage: python scripts/sweep_fir_bf16.py [--iters 8]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def timed_loop(run, iters: int) -> float:
    import numpy as np

    def once(n):
        t0 = time.perf_counter()
        out = run(n)
        float(np.asarray(out))
        return time.perf_counter() - t0

    once(iters)
    once(2 * iters)
    t1 = once(iters)
    t2 = once(2 * iters)
    return max(t2 - t1, 1e-9) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:  # noqa: BLE001
        pass

    from njw_tpu.signal.filters import design_fir_lowpass
    from njw_tpu.signal.fir_pallas import (
        fir_batch_pallas_bf16, fir_batch_pallas_lanes,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    x32 = jnp.asarray(rng.standard_normal((1000, 100_000)
                                          ).astype(np.float32))
    x16 = x32.astype(jnp.bfloat16)
    taps = design_fir_lowpass(101, 0.25)

    def chain(op, x0):
        @jax.jit
        def run(n, x):
            y = jax.lax.fori_loop(0, n, lambda i, c: op(c), x)
            return jnp.sum(jnp.abs(y[..., :8]))

        return lambda n: run(n, x0)

    cases = []
    for bf in (8, 32, 64):
        for tp in (1, 2):
            cases.append((f"bf16out_bf{bf}_tp{tp}",
                          chain(lambda c, bf=bf, tp=tp:
                                fir_batch_pallas_bf16(
                                    c, taps, block_frames=bf,
                                    taps_passes=tp), x16)))
    cases.append(("f32_lanes_bf8",
                  chain(lambda c: fir_batch_pallas_lanes(
                      c, taps, block_frames=8), x32)))

    for name, run in cases:
        try:
            ms = timed_loop(run, args.iters)
            print(json.dumps({"case": name, "ms": round(ms, 4)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"case": name,
                              "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
