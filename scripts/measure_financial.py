"""TPU measurement: the financial-modeling Monte-Carlo paths.

The reference benchmarks this workload in benchmark/configs/
financial_modeling.yaml (risk_metrics.monte_carlo_var sizes small/medium/
large: 1k/5k/10k samples over 50/100/500 assets) without shipping the
module. Measures the MXU-batched Monte-Carlo VaR draw + the terminal-
wealth path simulation at the yaml's LARGE size and a TPU-scale size,
with the in-jit iteration differential.

Usage: python scripts/measure_financial.py [--iters 8]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


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

    from njw_tpu.geofinancial.portfolio import _mc_terminal_wealth
    from njw_tpu.geofinancial.risk_metrics import _mc_portfolio_samples

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--config", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "financial_benchmark.yaml"),
        help="benchmark sizes yaml (analog of the reference's "
             "benchmark/configs/financial_modeling.yaml)")
    args = ap.parse_args()

    import yaml

    with open(args.config) as fh:
        bcfg = yaml.safe_load(fh)
    iters = args.iters or int(bcfg.get("iterations", 8))
    sizes = bcfg["risk_metrics"]["sizes"]
    wsim = bcfg["wealth_simulation"]

    rng = np.random.default_rng(0)

    def timed(run, iters):
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

    # sizes from configs/financial_benchmark.yaml ('yaml_large' mirrors
    # the reference yaml's large preset; 'tpu_scale' is the point of the
    # MXU formulation)
    for label, sz in sizes.items():
        n_assets = int(sz["num_assets"])
        n_samples = int(sz["monte_carlo_samples"])
        a = rng.standard_normal((n_assets, n_assets)) * 0.01
        cov = a @ a.T + 1e-4 * np.eye(n_assets)
        chol = jnp.asarray(np.linalg.cholesky(cov), jnp.float32)
        mean = jnp.asarray(rng.normal(4e-4, 2e-4, n_assets), jnp.float32)
        w = jnp.asarray(np.full(n_assets, 1.0 / n_assets), jnp.float32)

        def run(n, chol=chol, mean=mean, w=w, ns=n_samples):
            @jax.jit
            def go(k):
                def body(i, acc):
                    s = _mc_portfolio_samples(
                        mean, chol, w, jax.random.PRNGKey(i), ns)
                    return acc + jnp.sum(s) * 1e-12

                return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

            return go(n)

        ms = timed(run, iters)
        print(json.dumps({
            "op": f"mc_var_draw_{label}", "assets": n_assets,
            "samples": n_samples, "ms": round(ms, 3),
            "samples_per_s": round(n_samples / (ms / 1e3), 0),
        }), flush=True)

    # terminal-wealth simulation (sizes from the yaml)
    n_assets = int(wsim["num_assets"])
    n_paths = int(wsim["num_paths"])
    horizon = int(wsim["horizon_days"])
    a = rng.standard_normal((n_assets, n_assets)) * 0.01
    cov = a @ a.T + 1e-4 * np.eye(n_assets)
    chol = jnp.asarray(np.linalg.cholesky(cov), jnp.float32)
    mean = jnp.asarray(rng.normal(4e-4, 2e-4, n_assets), jnp.float32)
    w = jnp.asarray(np.full(n_assets, 1.0 / n_assets), jnp.float32)

    def run_sim(n):
        @jax.jit
        def go(k):
            def body(i, acc):
                tw = _mc_terminal_wealth(w, mean, chol,
                                         jax.random.PRNGKey(i),
                                         n_paths, horizon)
                return acc + jnp.sum(tw) * 1e-9

            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

        return go(n)

    ms = timed(run_sim, iters)
    print(json.dumps({
        "op": f"mc_wealth_sim_{n_paths}paths_{horizon}d_{n_assets}assets",
        "ms": round(ms, 3),
        "path_days_per_s": round(n_paths * horizon / (ms / 1e3), 0),
    }), flush=True)


if __name__ == "__main__":
    main()
