"""Measure the geospatial DEM pipeline on the real TPU vs the CPU path.

The reference's target is 10-100x over CPU
(ref: workload-specs/geospatial-analysis-spec.md:218). Timing discipline:
in-jit iteration-count differential (t(2K) - t(K)) / K with a hard D2H
sync, same as scripts/measure_signal.py. The CPU rows run the SAME jitted
code on the host CPU backend in a subprocess-free way is impossible here
(backend fixed at start), so run this script twice:

  python scripts/measure_geospatial.py            # TPU rows
  PYTHONPATH= JAX_PLATFORMS=cpu python scripts/measure_geospatial.py

Each run prints JSON lines {op, n, ms, platform}.
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

    from njw_tpu.geospatial.dem import (
        cost_distance, fill_sinks, flow_accumulation, terrain_derivatives,
        viewshed,
    )

    platform = jax.devices()[0].platform
    rng = np.random.default_rng(0)

    def dem_for(n):
        yy, xx = np.mgrid[0:n, 0:n] / n
        d = (50 * np.exp(-((yy - 0.5) ** 2 + (xx - 0.5) ** 2) / 0.1)
             + 5 * np.sin(8 * np.pi * xx) * np.sin(6 * np.pi * yy)
             + rng.normal(0, 0.5, (n, n)))
        return jnp.asarray(d, jnp.float32)

    import os as _os
    sizes_env = _os.environ.get("NJW_GEO_SIZES")
    if sizes_env:
        sizes = [int(s) for s in sizes_env.split(",")]
    else:
        sizes = [512, 2048] if platform == "tpu" else [512]

    for n in sizes:
        dem = dem_for(n)
        cost = jnp.abs(dem) * 0.01 + 1.0
        src = (n // 2, n // 2)

        ops = {
            "terrain_derivatives": lambda d: terrain_derivatives(d)["slope"],
            "viewshed": lambda d: viewshed(d, src, n_samples=64),
            "fill_sinks": lambda d: fill_sinks(d),
            "flow_accumulation": lambda d: flow_accumulation(d),
            "flow_accumulation_push": lambda d: flow_accumulation(
                d, method="push"),
            # the perturbation must not be 0 * x (XLA constant-folds it
            # and hoists the whole op out of the loop)
            "cost_distance": lambda d, c=cost: cost_distance(
                c + d[:1, :1] * 1e-30, src),
        }

        iters = 4
        for name, fn in ops.items():
            @jax.jit
            def run(k, d, fn=fn):
                def body(i, carry):
                    out = fn(d + carry * jnp.float32(1e-20))
                    # full-output reduction: a tiny slice would let XLA
                    # narrow the whole stencil to 4 columns
                    return jnp.sum(out) * jnp.float32(1e-20)

                return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

            def once(k):
                t0 = time.perf_counter()
                out = run(k, dem)
                float(np.asarray(out))
                return time.perf_counter() - t0

            try:
                once(iters)
                once(2 * iters)
                vals = []
                for _ in range(3):
                    t1 = once(iters)
                    t2 = once(2 * iters)
                    vals.append(max(t2 - t1, 1e-9) / iters * 1e3)
                print(json.dumps({"op": name, "n": n,
                                  "ms": round(min(vals), 3),
                                  "platform": platform}), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"op": name, "n": n,
                                  "error": str(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()
