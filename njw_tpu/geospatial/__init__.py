"""TPU-native geospatial analysis.

Capability parity with the reference geospatial workload (src/geospatial/,
~11.8k LoC; SURVEY §2.6): DEM processing (viewshed, terrain derivatives,
hydrology, least-cost path, sink filling, statistics, resampling) and
point-cloud processing (ground classification, DEM rasterization, normals,
building extraction).

TPU design notes:
* terrain derivatives are Horn-stencil ops (VPU) — ref:
  dem_kernels.cu:177 terrainDerivativesKernel.
* viewshed = vmap over target cells of a scan along the sight line
  (fixed sample count) — ref: dem_kernels.cu:34 viewshedKernel.
* sink filling / flow accumulation / least-cost distance are iterative
  relaxations under lax.fori_loop (the data-parallel equivalents of the
  reference's iteration kernels, ref: dem_kernels.cu:276-356).
* point clouds use grid binning with scatter-min/add — ref:
  point_cloud_kernels.cu:45-484.
"""
from njw_tpu.geospatial.dem import (
    GeoTransform, DEMProcessor, terrain_derivatives, viewshed, fill_sinks,
    flow_direction, flow_accumulation, cost_distance, least_cost_path,
    resample, dem_statistics,
)
from njw_tpu.geospatial.point_cloud import (
    PointCloud, classify_ground, rasterize_dem, compute_normals,
    extract_buildings,
)
