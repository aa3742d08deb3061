"""Measure the global spectral (spherical-harmonic) cores on TPU vs CPU.

Timing discipline: in-jit iteration-count differential (t(2K) - t(K)) / K
with a hard D2H sync (same as scripts/measure_signal.py). The transform is
passed as a PYTREE ARGUMENT, not a closure — at T341 the Legendre tables
are ~1 GB and must be runtime operands, not HLO constants.

  python scripts/measure_spherical.py                       # TPU rows
  PYTHONPATH= JAX_PLATFORMS=cpu python scripts/measure_spherical.py

Prints JSON lines {core, nlat, trunc, ms_per_step, platform}.
"""
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

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass

    from njw_tpu.ops.sht import SphericalHarmonicTransform
    from njw_tpu.weather.spherical import (
        EARTH_OMEGA, bve_tendencies, pack_state, rossby_haurwitz_bve,
        rossby_haurwitz_swe, swe_tendencies, unpack_state,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default=None,
                    help="comma list nlat:dtype:fold, e.g. "
                         "'512:f32:0,512:f32:1' (default: full sweep)")
    cargs = ap.parse_args()

    platform = jax.devices()[0].platform
    ax = jax.tree.map  # pytree axpy

    def axpy(a, x, y):
        return ax(lambda xi, yi: yi + a * xi, x, y)

    def make_rk4(tend):
        def step(s, sht, dt):
            k1 = tend(s, sht)
            k2 = tend(axpy(0.5 * dt, k1, s), sht)
            k3 = tend(axpy(0.5 * dt, k2, s), sht)
            k4 = tend(axpy(dt, k3, s), sht)
            incr = ax(lambda a, b, c, d: a + 2 * b + 2 * c + d,
                      k1, k2, k3, k4)
            return axpy(dt / 6.0, incr, s)
        return step

    sizes = [64, 128] if platform == "cpu" else [64, 128, 256, 512]

    # (nlat, table_dtype, fold_parity) rows; bf16 tables and the r5
    # hemisphere parity fold A/B only at the flagship T341 size
    cases = [(n, jnp.float32, False) for n in sizes]
    if platform != "cpu":
        cases.append((512, jnp.bfloat16, False))
        cases.append((512, jnp.float32, True))
        cases.append((256, jnp.float32, True))

    if cargs.cases:
        dmap = {"f32": jnp.float32, "bf16": jnp.bfloat16}
        cases = [(int(n), dmap[d], bool(int(f)))
                 for n, d, f in (c.split(":")
                                 for c in cargs.cases.split(","))]

    for nlat, tdt, fold in cases:
        sht = SphericalHarmonicTransform(nlat, table_dtype=tdt,
                                         fold_parity=fold)
        dt = jnp.float32(900.0 * 64 / nlat)

        # ICs built under jit and PACKED as (real, imag) float pairs at
        # every jit boundary: complex buffers at the runtime layer wedge
        # the axon remote-TPU backend (measured r3) — complex is only
        # supported INSIDE compiled programs.
        cores = {
            "bve": (make_rk4(lambda s, t: bve_tendencies(s, t, EARTH_OMEGA)),
                    jax.jit(lambda t: pack_state(rossby_haurwitz_bve(t)))(
                        sht)),
            "swe": (make_rk4(lambda s, t: swe_tendencies(
                s, t, EARTH_OMEGA, nu4=1e15)),
                jax.jit(lambda t: pack_state(
                    rossby_haurwitz_swe(t, EARTH_OMEGA)))(sht)),
        }

        for name, (step, s0) in cores.items():
            @jax.jit
            def run(k, p, sht, step=step, dt=dt):
                def body(i, s):
                    return step(s, sht, dt)
                return pack_state(
                    jax.lax.fori_loop(0, k, body, unpack_state(p)))

            def once(k, s0=s0, run=run, sht=sht):
                t0 = time.perf_counter()
                out = run(k, s0, sht)
                # hard sync: tiny D2H of a real leaf
                np.asarray(jax.tree.leaves(out)[0][:2, :2])
                return time.perf_counter() - t0

            try:
                # iters sized so the K-step differential (~iters * ms)
                # dwarfs the ~10-40 ms per-invocation tunnel jitter; the
                # old 8-iter/min-of-3 read 0.0-0.9 ms/step junk at T341
                # (min of noisy differences biases toward zero) — use the
                # MEDIAN of 5 interleaved pairs instead
                iters = 40 if nlat <= 256 else 32
                once(iters)
                once(2 * iters)
                vals = []
                for _ in range(5):
                    t1 = once(iters)
                    t2 = once(2 * iters)
                    vals.append(max(t2 - t1, 1e-9) / iters * 1e3)
                ms = sorted(vals)[len(vals) // 2]
                # table-read roofline: each RK4 step = 4 tendencies; a
                # tendency's stacked contractions read each needed table
                # once (see sht.syn_stack) — count bytes from the table
                # shapes + the per-step FFT/grid traffic (small beside
                # the tables at T341)
                tbytes = sht._P.nbytes
                # stacked contractions per tendency (weather/spherical.py):
                # bve reads P, H, Pw_over_c2, Hw_over_c2; swe adds Pw
                n_table_reads = {"bve": 4, "swe": 5}[name] * 4
                gb = n_table_reads * tbytes / 1e9
                print(json.dumps({
                    "core": name, "nlat": nlat, "trunc": sht.trunc,
                    "tables": str(jnp.dtype(tdt).name),
                    "fold_parity": fold,
                    "ms_per_step": round(ms, 3),
                    "table_gb_per_step": round(gb, 3),
                    "table_gbps": round(gb / (ms / 1e3), 1),
                    "platform": platform}), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"core": name, "nlat": nlat,
                                  "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
