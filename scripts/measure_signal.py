"""TPU signal-processing benchmarks vs the reference's published table.

The reference's ONLY measured numbers are its 13 signal-processing rows
(ref: src/signal_processing/README.md:135-151, mirrored in BASELINE.md).
This measures the same operations on one TPU chip.

Timing discipline (CLAUDE.md): per-op latency is measured with an
IN-JIT iteration-count differential — one executable runs the op K times
chained through its own output (or a data-dependent perturbation when
shapes change), a second runs 2K; (t2 - t1)/K isolates per-iteration cost
with compile/dispatch/sync overhead cancelled. Sequential-recursion ops
(adaptive LMS/RLS) are flagged: a data-dependent recurrence is the one
shape TPUs fundamentally dislike; the honest number is reported anyway.

Usage: python scripts/measure_signal.py [--iters K] [--out SIGNAL_BENCH.md]
Prints one JSON line per row and writes the markdown table.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (name, ref CPU ms, ref best-Jetson/T4G ms, ref best-datacenter-GPU ms)
REF_ROWS = {
    "fir_101_1m":      ("FIR filter, 101 taps, 1M",        67.2, 2.8, 0.10),
    "iir_8th_1m":      ("IIR filter, 8th order, 1M",      112.3, 5.1, None),
    "lms_64_50k":      ("Adaptive LMS, 64 taps, 50k",      32.8, 1.7, None),
    "blms_64_50k":     ("Block-LMS (MXU), 64 taps, 50k",    32.8, 1.7, None),
    "upsample_4x_1m":  ("Upsampling 4x, 1M",               94.1, 3.2, None),
    "downsample_4x_1m": ("Downsampling 4x, 1M",           109.4, 3.8, None),
    "median_11_1m":    ("Median filter 11-pt, 1M",        203.1, 4.8, None),
    "fft_1024_x1k":    ("FFT 1024-pt x 1k transforms",     89.5, 1.9, 0.06),
    "spectrogram_10s": ("Spectrogram, 10 s audio",       1243.8, None, 0.6),
    "mxu_conv_1m":     ("MXU (tensor-core) conv, 1M",     318.4, None, 0.11),
    "batch_1000x100k": ("Batch 1000 signals x 100k",     5941.7, None, 1.6),
    "batch_1000x100k_bf16": (
        "Batch 1000 x 100k, bf16 (equal precision to the ref's "
        "tensor-core half rows)",                        5941.7, None, 1.6),
}


def timed_loop(make_run, iters: int) -> float:
    """(t(2K) - t(K)) / K in ms, each hard-synced via D2H.

    make_run(0) returns ONE jitted callable taking the iteration count as
    a runtime fori_loop bound, so both lengths share one executable
    (remote compiles on this backend cost minutes)."""
    import numpy as np

    run = make_run(0)

    def once(n):
        t0 = time.perf_counter()
        out = run(n)
        float(np.asarray(out))  # D2H hard sync (scalar result)
        return time.perf_counter() - t0

    once(iters)       # compile + warm
    once(2 * iters)
    t1 = once(iters)
    t2 = once(2 * iters)
    return max(t2 - t1, 1e-9) / iters * 1e3


def chain(op, x0, _n):
    """Same-shape op iterated through its own output (runtime count).
    x0 is a jit ARGUMENT, not a closure — closed-over arrays are baked
    into the HLO as literals and blow the remote compile request size
    (HTTP 413 at 400 MB)."""
    import jax

    @jax.jit
    def run(n, x):
        y = jax.lax.fori_loop(0, n, lambda i, c: op(c), x)
        return jax.numpy.sum(jax.numpy.abs(y[..., :8]))

    return lambda n: run(n, x0)


def probe(op, x0, _n):
    """Shape-changing op re-run with a data-dependent input perturbation
    so XLA cannot hoist it out of the loop (runtime count)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(n, x):
        def body(i, c):
            y = op(x + c)
            return jnp.sum(jnp.abs(jnp.real(y))) * jnp.float32(1e-30)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    return lambda n: run(n, x0)


def build_rows(iters: int):
    import jax.numpy as jnp
    import numpy as np

    from njw_tpu.signal.filters import (
        AdaptiveFilter, IIRFilter, MultirateFilter, design_fir_lowpass,
        fir_apply, median_filter, sos_apply,
    )
    from njw_tpu.signal.spectral import compute_spectrogram

    rng = np.random.default_rng(0)
    x1m = jnp.asarray(rng.standard_normal(2 ** 20).astype(np.float32))
    taps101 = design_fir_lowpass(101, 0.25)
    rows = []

    rows.append(("fir_101_1m", iters * 20,
                 lambda n: chain(lambda c: fir_apply(c, taps101), x1m, n)))

    sos8 = np.asarray(IIRFilter(design="butterworth", order=8,
                                cutoff=0.2).sos)
    rows.append(("iir_8th_1m", max(iters // 2, 2),
                 lambda n: chain(
                     lambda c: sos_apply(c, sos8, method="parallel"),
                     x1m, n)))

    x50k = jnp.asarray(rng.standard_normal(50_000).astype(np.float32))
    d50k = jnp.asarray(rng.standard_normal(50_000).astype(np.float32))
    lms = AdaptiveFilter(num_taps=64, method="lms", mu=0.01)
    rows.append(("lms_64_50k", iters,
                 lambda n: probe(lambda x: lms.apply(x, d50k)[1], x50k, n)))
    blms = AdaptiveFilter(num_taps=64, method="block_lms", mu=0.05,
                          block_size=256)
    rows.append(("blms_64_50k", iters,
                 lambda n: probe(lambda x: blms.apply(x, d50k)[1], x50k, n)))

    mr = MultirateFilter(num_taps=64)
    x256k = jnp.asarray(rng.standard_normal(2 ** 18).astype(np.float32))
    rows.append(("upsample_4x_1m", iters,
                 lambda n: probe(lambda x: mr.interpolate(x, 4), x256k, n)))
    rows.append(("downsample_4x_1m", iters,
                 lambda n: probe(lambda x: mr.decimate(x, 4), x1m, n)))

    rows.append(("median_11_1m", iters,
                 lambda n: chain(lambda c: median_filter(c, 11), x1m, n)))

    xfft = jnp.asarray(rng.standard_normal((1000, 1024)).astype(np.float32))
    rows.append(("fft_1024_x1k", iters * 10,
                 lambda n: probe(lambda x: jnp.fft.fft(x), xfft, n)))

    x10s = jnp.asarray(
        rng.standard_normal(441_000).astype(np.float32))  # 10 s @ 44.1 kHz
    rows.append(("spectrogram_10s", iters * 10,
                 lambda n: probe(
                     lambda x: compute_spectrogram(x, fs=44100.0,
                                                   nperseg=1024)[2], x10s, n)))

    # MXU path: framed bf16 dot against the tap matrix
    def mxu_conv(x):
        k = 128
        h = jnp.zeros((k, k), jnp.bfloat16)
        t = jnp.asarray(taps101, jnp.bfloat16)
        for i in range(101):  # banded tap matrix (static unroll)
            h = h + jnp.diag(jnp.full(k - abs(i - 50), t[i],
                                      jnp.bfloat16), i - 50)
        xb = x.reshape(-1, k).astype(jnp.bfloat16)
        return jnp.dot(xb, h, preferred_element_type=jnp.float32)

    rows.append(("mxu_conv_1m", iters * 40,
                 lambda n: probe(mxu_conv, x1m, n)))

    xbatch = jnp.asarray(
        rng.standard_normal((1000, 100_000)).astype(np.float32))
    # chain (y -> x), not probe: the probe's x + c perturbation adds a
    # full 400 MB materialized add (~1 ms) per iteration; FIR is
    # shape-preserving so the chained form measures the pure kernel.
    # base count >= 4: at K=2 the differential showed a 3x run-to-run
    # spread on the shared tunnel (one r4 run read 0.80 ms — below the
    # 0.98 ms HBM floor, i.e. a measurement artifact, BENCH_NOTES r4)
    rows.append(("batch_1000x100k", max(iters // 4, 4),
                 lambda n: chain(lambda x: fir_apply(x, taps101), xbatch, n)))

    from njw_tpu.signal.fir_pallas import fir_batch_pallas_bf16

    xbatch16 = xbatch.astype(jnp.bfloat16)  # half-precision storage row
    rows.append(("batch_1000x100k_bf16", max(iters // 2, 2),
                 lambda n: chain(
                     lambda x: fir_batch_pallas_bf16(x, taps101), xbatch16,
                     n)))
    return rows


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from njw_tpu.platform.device import detect

    caps = detect()
    results = {}
    for name, iters, make in build_rows(args.iters):
        if args.only and args.only not in name:
            continue
        ms = timed_loop(make, iters)
        label, cpu, jet, dcgpu = REF_ROWS[name]
        row = {
            "op": name, "ms": round(ms, 4), "ref_cpu_ms": cpu,
            "ref_best_jetson_t4g_ms": jet, "ref_best_dc_gpu_ms": dcgpu,
            "vs_cpu": round(cpu / ms, 1),
            "vs_jetson_t4g": round(jet / ms, 2) if jet else None,
            "vs_dc_gpu": round(dcgpu / ms, 2) if dcgpu else None,
        }
        results[name] = row
        print(json.dumps(row), flush=True)

    if args.out:
        lines = [
            f"# Signal-processing TPU benchmarks ({caps.generation}, "
            "1 chip)", "",
            "Measured with the in-jit iteration-count differential "
            "(see scripts/measure_signal.py docstring). Reference rows: "
            "src/signal_processing/README.md:135-151 (via BASELINE.md).",
            "",
            "| Operation | TPU ms | ref CPU ms | ref best Jetson/T4G ms | "
            "ref best V100/A100/H100 ms | vs T4G | vs DC GPU |",
            "|---|---|---|---|---|---|---|",
        ]
        for name, r in results.items():
            label = REF_ROWS[name][0]
            lines.append(
                f"| {label} | {r['ms']:.3f} | {r['ref_cpu_ms']} | "
                f"{r['ref_best_jetson_t4g_ms'] or '—'} | "
                f"{r['ref_best_dc_gpu_ms'] or '—'} | "
                f"{r['vs_jetson_t4g'] or '—'}x | {r['vs_dc_gpu'] or '—'}x |")
        lines.append("")
        with open(args.out, "w") as fh:
            fh.write("\n".join(lines))
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
