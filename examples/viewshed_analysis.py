#!/usr/bin/env python
"""Geospatial terrain-analysis pipeline (ref parity: geospatial
viewshed_analysis example role + the end-to-end integration test flow,
src/geospatial/integration_tests/test_end_to_end.py): synthetic DEM ->
multi-observer viewshed -> terrain derivatives -> hydrology (fill sinks +
flow accumulation) -> least-cost path -> HTML report with per-op timings.

TPU design: the viewshed is a polar-sweep (shear + cummax over rays, no
per-cell host loop), hydrology solvers are log-doubling fast sweeps —
see BENCH_NOTES.md "geospatial on TPU" for measured 512²/2048² numbers.

    python examples/viewshed_analysis.py --size 512 --observers 3 \
        --observer-height 10 --path 10 10 500 500 --json
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--roughness", type=float, default=0.6)
    p.add_argument("--relief", type=float, default=200.0)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--observers", type=int, default=1,
                   help="number of observer points (random + center)")
    p.add_argument("--observer-height", type=float, default=10.0)
    p.add_argument("--path", type=int, nargs=4, default=None,
                   metavar=("Y0", "X0", "Y1", "X1"),
                   help="least-cost path endpoints (slope-weighted cost)")
    p.add_argument("--output-dir", default="viewshed_output")
    p.add_argument("--json", action="store_true")
    args = p.parse_args()

    import jax

    from njw_tpu.geospatial.datasets import synthetic_dem
    from njw_tpu.geospatial.dem import DEMProcessor, least_cost_path
    from njw_tpu.geospatial.metrics import GeospatialMetrics
    from njw_tpu.viz.geospatial import generate_geospatial_report

    n = args.size
    dem = synthetic_dem(n, roughness=args.roughness, relief=args.relief,
                        seed=args.seed)
    proc = DEMProcessor(dem)
    metrics = GeospatialMetrics()
    timings = {}
    out = {"size": n}

    rng = np.random.default_rng(args.seed)
    observers = [(n // 2, n // 2)] + [
        tuple(int(v) for v in rng.integers(n // 8, 7 * n // 8, 2))
        for _ in range(max(args.observers - 1, 0))
    ]
    visible_any = np.zeros((n, n), bool)
    obs_rows = []
    for oy, ox in observers:
        t0 = time.perf_counter()
        vis = np.asarray(jax.block_until_ready(proc.viewshed(
            (oy, ox), observer_height=args.observer_height)))
        dt = time.perf_counter() - t0
        metrics.record_viewshed_performance(n, n, dt)
        visible_any |= vis > 0.5
        obs_rows.append({"observer": [oy, ox],
                         "visible_fraction": round(float(vis.mean()), 4),
                         "ms": round(dt * 1e3, 1)})
    out["viewsheds"] = obs_rows
    out["union_visible_fraction"] = round(float(visible_any.mean()), 4)

    t0 = time.perf_counter()
    deriv = jax.block_until_ready(proc.terrain_derivatives())
    timings["derivatives_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
    slope = np.asarray(deriv["slope"])
    aspect = np.asarray(deriv["aspect"])

    t0 = time.perf_counter()
    hydro = jax.block_until_ready(proc.hydrology())
    timings["hydrology_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
    flow = np.asarray(hydro["flow_accumulation"])
    out["max_upstream_cells"] = int(flow.max())
    out["mean_slope_deg"] = round(float(np.rad2deg(slope).mean()), 2)

    path_xy = None
    if args.path:
        y0, x0, y1, x1 = args.path
        cost = 1.0 + 10.0 * slope  # slope-weighted traversal cost
        t0 = time.perf_counter()
        path_xy, total = least_cost_path(cost, (y0, x0), (y1, x1))
        path_xy = np.asarray(path_xy)
        timings["least_cost_ms"] = round((time.perf_counter() - t0) * 1e3,
                                         1)
        out["path_cost"] = round(float(total), 2)
        out["path_points"] = int(path_xy.shape[0])

    out["timings"] = timings
    page = generate_geospatial_report(
        args.output_dir, dem, visible=visible_any.astype(np.float32),
        observer_xy=observers[0], slope=slope, aspect=aspect,
        flow_acc=flow, metrics=metrics.summary())
    out["report"] = page

    if args.json:
        print(json.dumps(out))
    else:
        for row in obs_rows:
            print(f"observer {row['observer']}: "
                  f"{100*row['visible_fraction']:.1f}% visible "
                  f"({row['ms']} ms)")
        print(f"union visible: {100*out['union_visible_fraction']:.1f}%  "
              f"mean slope {out['mean_slope_deg']} deg  "
              f"max upstream {out['max_upstream_cells']} cells")
        if args.path:
            print(f"least-cost path: {out['path_points']} points, "
                  f"cost {out['path_cost']}")
        print(f"timings: {timings}")
        print(f"report: {page}")


if __name__ == "__main__":
    main()
