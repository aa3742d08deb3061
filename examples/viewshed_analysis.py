"""Viewshed analysis example (ref: geospatial viewshed_analysis.py role):
synthetic terrain -> viewshed + derivatives -> report."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from njw_tpu.geospatial.datasets import synthetic_dem
from njw_tpu.geospatial.dem import DEMProcessor
from njw_tpu.geospatial.metrics import GeospatialMetrics
from njw_tpu.viz.geospatial import generate_geospatial_report


def main(out_dir="viewshed_output", size=256):
    dem = synthetic_dem(size, roughness=0.6, relief=200.0, seed=7)
    proc = DEMProcessor(dem)
    metrics = GeospatialMetrics()

    import time

    observer = (size // 2, size // 2)
    t0 = time.perf_counter()
    visible = np.asarray(proc.viewshed(observer, observer_height=10.0))
    metrics.record_viewshed_performance(size, size,
                                        time.perf_counter() - t0)
    deriv = proc.terrain_derivatives()
    slope = np.asarray(deriv["slope"])
    aspect = np.asarray(deriv["aspect"])
    flow = np.asarray(proc.hydrology()["flow_accumulation"])

    page = generate_geospatial_report(
        out_dir, dem, visible=visible, observer_xy=observer,
        slope=slope, aspect=aspect, flow_acc=flow,
        metrics=metrics.summary())
    frac = float(visible.mean())
    print(f"visible fraction: {frac:.3f}")
    print(f"report: {page}")


if __name__ == "__main__":
    main()
