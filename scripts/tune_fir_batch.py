"""One-off: sweep fir_batch_pallas block configs on the real TPU.

Usage: python scripts/tune_fir_batch.py bm:frames:passes [more...]
Timing: in-jit iteration differential, same discipline as
scripts/measure_signal.py.
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
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass

    from njw_tpu.signal.filters import design_fir_lowpass
    from njw_tpu.signal.fir_pallas import fir_batch_pallas

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1000, 100_000)).astype(np.float32))
    taps = design_fir_lowpass(101, 0.25)
    iters = 16

    from njw_tpu.signal.fir_pallas import (
        fir_batch_pallas_flat, fir_batch_pallas_lanes,
    )

    for spec in sys.argv[1:]:
        kind, bm, bf, p = spec.split(":")
        bm, bf, p = int(bm), int(bf), int(p)
        from functools import partial as _pt

        fn = {"blk": fir_batch_pallas, "flat": fir_batch_pallas_flat,
              "lanes": fir_batch_pallas_lanes,
              "lanesT": _pt(fir_batch_pallas_lanes, scratch=False)}[kind]

        # chain y -> x: each iteration's input is the previous output, so
        # the loop body is exactly one kernel round-trip (read x, write y)
        # with no auxiliary HBM traffic and no possibility of hoisting.
        @jax.jit
        def run(n, xx, bm=bm, bf=bf, p=p, fn=fn, kind=kind):
            def body(i, c):
                if kind == "flat":
                    return fn(c, taps, block_frames=bf, passes=p)
                return fn(c, taps, block_rows=bm, block_frames=bf,
                          passes=p)

            return jax.lax.fori_loop(0, n, body, xx)

        def once(n):
            t0 = time.perf_counter()
            out = run(n, x)
            float(np.asarray(out[:2, :2]).sum())
            return time.perf_counter() - t0

        try:
            once(iters)
            once(2 * iters)
            vals = []
            for _ in range(4):
                t1 = once(iters)
                t2 = once(2 * iters)
                vals.append(max(t2 - t1, 1e-9) / iters * 1e3)
            print(json.dumps({"spec": spec, "ms": round(min(vals), 3),
                              "all": [round(v, 3) for v in vals]}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"spec": spec, "error": str(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
