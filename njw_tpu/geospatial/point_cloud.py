"""Point-cloud processing: ground classification, DEM rasterization,
normal estimation, building extraction.

ref: point_cloud.hpp:28-189 (PointClass LAS-style enum, PointCloud pImpl);
kernels ref: point_cloud_kernels.cu:45 classifyPointsKernel,
:163 createDEMKernel, :350 computeNormalsKernel, :484 extractBuildingsKernel.

TPU design: points are binned onto a grid with scatter-min/add (segment
ops), after which every operation is dense 2-D array math.
"""
from __future__ import annotations

from dataclasses import dataclass
from enum import IntEnum

import jax
import jax.numpy as jnp
import numpy as np


class PointClass(IntEnum):
    """LAS-style classes (ref: point_cloud.hpp:28)."""

    UNCLASSIFIED = 1
    GROUND = 2
    LOW_VEGETATION = 3
    MEDIUM_VEGETATION = 4
    HIGH_VEGETATION = 5
    BUILDING = 6
    NOISE = 7
    WATER = 9


@dataclass
class PointCloud:
    """Structure-of-arrays point cloud (ref: PointCloud, point_cloud.hpp:70)."""

    xyz: np.ndarray                      # (N, 3) float32
    classification: np.ndarray = None    # (N,) uint8
    intensity: np.ndarray = None         # (N,)

    def __post_init__(self):
        self.xyz = np.asarray(self.xyz, np.float32)
        n = len(self.xyz)
        if self.classification is None:
            self.classification = np.full(n, PointClass.UNCLASSIFIED,
                                          np.uint8)
        if self.intensity is None:
            self.intensity = np.ones(n, np.float32)

    @property
    def n(self) -> int:
        return len(self.xyz)

    def bounds(self):
        return self.xyz.min(axis=0), self.xyz.max(axis=0)


def _bin_indices(xyz, cell_size, origin, shape):
    col = jnp.clip(((xyz[:, 0] - origin[0]) / cell_size).astype(jnp.int32),
                   0, shape[1] - 1)
    row = jnp.clip(((xyz[:, 1] - origin[1]) / cell_size).astype(jnp.int32),
                   0, shape[0] - 1)
    return row, col


def _grid_geometry(pc: PointCloud, cell_size: float):
    lo, hi = pc.bounds()
    w = max(int(np.ceil((hi[0] - lo[0]) / cell_size)) + 1, 1)
    h = max(int(np.ceil((hi[1] - lo[1]) / cell_size)) + 1, 1)
    return (h, w), (float(lo[0]), float(lo[1]))


def rasterize_dem(pc: PointCloud, cell_size: float = 1.0,
                  statistic: str = "min"):
    """Grid the point cloud into a DEM (ref: createDEMKernel :163).
    statistic: 'min' (ground-style), 'max' (surface), 'mean'."""
    shape, origin = _grid_geometry(pc, cell_size)
    xyz = jnp.asarray(pc.xyz)
    row, col = _bin_indices(xyz, cell_size, origin, shape)
    z = xyz[:, 2]
    if statistic == "min":
        grid = jnp.full(shape, jnp.inf, jnp.float32).at[row, col].min(z)
    elif statistic == "max":
        grid = jnp.full(shape, -jnp.inf, jnp.float32).at[row, col].max(z)
    elif statistic == "mean":
        tot = jnp.zeros(shape, jnp.float32).at[row, col].add(z)
        cnt = jnp.zeros(shape, jnp.float32).at[row, col].add(1.0)
        grid = tot / jnp.maximum(cnt, 1.0)
        grid = jnp.where(cnt > 0, grid, jnp.nan)
        return grid, origin
    else:
        raise ValueError(f"unknown statistic {statistic!r}")
    grid = jnp.where(jnp.isfinite(grid), grid, jnp.nan)
    return grid, origin


def _fill_nan(grid, iterations: int = 32):
    """Fill NaN cells from neighbor means (simple inpainting)."""
    def body(_, g):
        p = jnp.pad(g, 1, mode="edge")
        h, w = g.shape
        stack = jnp.stack([p[1 + dy: 1 + dy + h, 1 + dx: 1 + dx + w]
                           for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
        cnt = jnp.sum(jnp.isfinite(stack), axis=0)
        mean = jnp.nansum(jnp.where(jnp.isfinite(stack), stack, 0.0),
                          axis=0) / jnp.maximum(cnt, 1)
        return jnp.where(jnp.isnan(g) & (cnt > 0), mean, g)

    return jax.lax.fori_loop(0, iterations, body, grid)


def classify_ground(pc: PointCloud, cell_size: float = 2.0,
                    height_threshold: float = 0.3) -> PointCloud:
    """Morphological ground classification (ref: classifyPointsKernel :45):
    points within height_threshold of the gridded minimum surface are
    GROUND; higher points get vegetation classes by height above ground."""
    shape, origin = _grid_geometry(pc, cell_size)
    ground_grid, _ = rasterize_dem(pc, cell_size, "min")
    ground_grid = _fill_nan(ground_grid)
    xyz = jnp.asarray(pc.xyz)
    row, col = _bin_indices(xyz, cell_size, origin, shape)
    hag = xyz[:, 2] - ground_grid[row, col]  # height above ground
    cls = jnp.where(
        hag <= height_threshold, PointClass.GROUND,
        jnp.where(hag <= 2.0, PointClass.LOW_VEGETATION,
                  jnp.where(hag <= 5.0, PointClass.MEDIUM_VEGETATION,
                            PointClass.HIGH_VEGETATION)))
    out = PointCloud(pc.xyz, np.asarray(cls, np.uint8) if True else None,
                     pc.intensity)
    out.classification = np.asarray(cls).astype(np.uint8)
    return out


def compute_normals(pc: PointCloud, cell_size: float = 2.0) -> np.ndarray:
    """Per-point surface normals from the gridded surface gradient
    (ref: computeNormalsKernel :350): n = normalize(-dz/dx, -dz/dy, 1)."""
    shape, origin = _grid_geometry(pc, cell_size)
    surf, _ = rasterize_dem(pc, cell_size, "mean")
    surf = _fill_nan(surf)
    gy, gx = jnp.gradient(surf, cell_size)
    xyz = jnp.asarray(pc.xyz)
    row, col = _bin_indices(xyz, cell_size, origin, shape)
    nx = -gx[row, col]
    ny = -gy[row, col]
    nz = jnp.ones_like(nx)
    n = jnp.stack([nx, ny, nz], axis=1)
    n = n / jnp.linalg.norm(n, axis=1, keepdims=True)
    return np.asarray(n)


def extract_buildings(pc: PointCloud, cell_size: float = 2.0,
                      min_height: float = 3.0,
                      max_roughness: float = 0.5) -> PointCloud:
    """Mark BUILDING points: high above ground AND locally planar surface
    (ref: extractBuildingsKernel :484). Roughness = local std of the
    max-surface grid."""
    shape, origin = _grid_geometry(pc, cell_size)
    ground, _ = rasterize_dem(pc, cell_size, "min")
    ground = _fill_nan(ground)
    surface, _ = rasterize_dem(pc, cell_size, "max")
    surface = _fill_nan(surface)
    # local roughness of the surface grid (3x3 std)
    p = jnp.pad(surface, 1, mode="edge")
    h, w = surface.shape
    stack = jnp.stack([p[1 + dy: 1 + dy + h, 1 + dx: 1 + dx + w]
                       for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
    rough = jnp.std(stack, axis=0)
    tall = (surface - ground) >= min_height
    # planar core cells, then grow one cell within the tall mask so roof
    # EDGE cells (whose 3x3 window spans the facade jump) are included
    core = tall & (rough <= max_roughness)
    pc_ = jnp.pad(core, 1, mode="constant", constant_values=False)
    grown = jnp.zeros_like(core)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            grown = grown | pc_[1 + dy: 1 + dy + h, 1 + dx: 1 + dx + w]
    is_building_cell = tall & grown

    xyz = jnp.asarray(pc.xyz)
    row, col = _bin_indices(xyz, cell_size, origin, shape)
    hag = xyz[:, 2] - ground[row, col]
    pt_is_building = is_building_cell[row, col] & (hag >= min_height * 0.5)
    cls = np.asarray(pc.classification).copy()
    cls[np.asarray(pt_is_building)] = PointClass.BUILDING
    out = PointCloud(pc.xyz, cls, pc.intensity)
    return out
