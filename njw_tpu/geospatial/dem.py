"""DEM processing.

ref: dem_processing.hpp:32-180 (GeoTransform, DEMProcessor pImpl with
viewshed / terrain derivatives / hydrology / least-cost path / fill sinks /
statistics / resample); CUDA kernels ref: dem_kernels.cu:34-356; Python API
ref: python/geospatial/dem.py:24-267.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class GeoTransform:
    """GDAL-style affine transform (ref: dem_processing.hpp:32;
    dem.py:24): geo = origin + pixel * size (+ rotation terms)."""

    origin_x: float = 0.0
    origin_y: float = 0.0
    pixel_width: float = 1.0
    pixel_height: float = -1.0
    rotation_x: float = 0.0
    rotation_y: float = 0.0

    def pixel_to_geo(self, row, col):
        x = self.origin_x + col * self.pixel_width + row * self.rotation_x
        y = self.origin_y + col * self.rotation_y + row * self.pixel_height
        return x, y

    def geo_to_pixel(self, x, y):
        # invert the 2x2 affine part
        a, b = self.pixel_width, self.rotation_x
        c, d = self.rotation_y, self.pixel_height
        det = a * d - b * c
        dx, dy = x - self.origin_x, y - self.origin_y
        col = (d * dx - b * dy) / det
        row = (-c * dx + a * dy) / det
        return row, col


@jax.jit
def terrain_derivatives(dem, cell_size: float = 1.0):
    """Slope (radians), aspect (radians), profile curvature via the Horn
    stencil (ref: terrainDerivativesKernel, dem_kernels.cu:177)."""
    z = jnp.asarray(dem, jnp.float32)
    pad = jnp.pad(z, 1, mode="edge")

    def sh(dy, dx):
        h, w = z.shape
        return pad[1 + dy: 1 + dy + h, 1 + dx: 1 + dx + w]

    # Horn's method weights
    dzdx = ((sh(-1, 1) + 2 * sh(0, 1) + sh(1, 1))
            - (sh(-1, -1) + 2 * sh(0, -1) + sh(1, -1))) / (8.0 * cell_size)
    dzdy = ((sh(1, -1) + 2 * sh(1, 0) + sh(1, 1))
            - (sh(-1, -1) + 2 * sh(-1, 0) + sh(-1, 1))) / (8.0 * cell_size)
    slope = jnp.arctan(jnp.sqrt(dzdx ** 2 + dzdy ** 2))
    aspect = jnp.arctan2(-dzdy, dzdx)
    # curvature: 5-point laplacian of the surface
    curv = (sh(0, 1) + sh(0, -1) + sh(1, 0) + sh(-1, 0) - 4.0 * z) / (
        cell_size * cell_size)
    return {"slope": slope, "aspect": aspect, "curvature": curv}


@partial(jax.jit, static_argnames=("n_samples",))
def viewshed(dem, observer_yx, observer_height: float = 1.8,
             cell_size: float = 1.0, n_samples: int = 128):
    """Boolean visibility map from an observer cell
    (ref: viewshedKernel, dem_kernels.cu:34). For every target cell, the
    line of sight is sampled at n_samples points; the target is visible if
    no intermediate sample rises above the observer-target sight line."""
    z = jnp.asarray(dem, jnp.float32)
    h, w = z.shape
    oy, ox = observer_yx
    zo = z[oy, ox] + observer_height

    yy, xx = jnp.mgrid[0:h, 0:w]
    ty = yy.astype(jnp.float32)
    tx = xx.astype(jnp.float32)
    # fractional positions along each sight line (excluding endpoints)
    t = (jnp.arange(1, n_samples + 1, dtype=jnp.float32)
         / (n_samples + 1))                            # (S,)
    sy = oy + (ty - oy)[None] * t[:, None, None]       # (S, H, W)
    sx = ox + (tx - ox)[None] * t[:, None, None]
    y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, h - 2)
    x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, w - 2)
    fy, fx = sy - y0, sx - x0
    z_interp = ((1 - fy) * (1 - fx) * z[y0, x0]
                + (1 - fy) * fx * z[y0, x0 + 1]
                + fy * (1 - fx) * z[y0 + 1, x0]
                + fy * fx * z[y0 + 1, x0 + 1])
    # sight-line elevation at each sample
    z_line = zo + (z[yy, xx] - zo)[None] * t[:, None, None]
    # only samples strictly inside the segment block the view
    dist = jnp.sqrt((ty - oy) ** 2 + (tx - ox) ** 2)
    inside = (t[:, None, None] * dist[None]) < dist[None]
    blocked = jnp.any((z_interp > z_line + 1e-6) & inside, axis=0)
    vis = ~blocked
    return vis.at[oy, ox].set(True)


@partial(jax.jit, static_argnames=("n_iterations",))
def fill_sinks(dem, n_iterations: int = 256, epsilon: float = 1e-3):
    """Depression filling by iterative lowering from a flooded surface
    (ref: fillSinksIterationKernel + init, dem_kernels.cu:276-356):
    W is initialized to +inf except at the boundary, then
    W <- max(z, min(W, min_neighbor(W) + eps)) until stable."""
    z = jnp.asarray(dem, jnp.float32)
    big = jnp.float32(1e30)
    w0 = jnp.full_like(z, big)
    w0 = w0.at[0, :].set(z[0, :]).at[-1, :].set(z[-1, :])
    w0 = w0.at[:, 0].set(z[:, 0]).at[:, -1].set(z[:, -1])

    def min_neighbor(w):
        p = jnp.pad(w, 1, mode="constant", constant_values=big)
        h, ww = w.shape
        stack = jnp.stack([
            p[1 + dy: 1 + dy + h, 1 + dx: 1 + dx + ww]
            for dy in (-1, 0, 1) for dx in (-1, 0, 1)
            if not (dy == 0 and dx == 0)
        ])
        return jnp.min(stack, axis=0)

    def body(_, w):
        cand = jnp.maximum(z, min_neighbor(w) + epsilon)
        return jnp.minimum(w, cand)

    return jax.lax.fori_loop(0, n_iterations, body, w0)


_D8_OFFSETS = np.asarray(
    [(-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1)],
    np.int32)


@jax.jit
def flow_direction(dem):
    """D8 flow direction: index 0..7 of the steepest-descent neighbor,
    -1 for pits (ref hydrology, dem_processing.cpp:235-793 region)."""
    z = jnp.asarray(dem, jnp.float32)
    h, w = z.shape
    pad = jnp.pad(z, 1, mode="edge")
    drops = []
    for i, (dy, dx) in enumerate(_D8_OFFSETS):
        nb = pad[1 + dy: 1 + dy + h, 1 + dx: 1 + dx + w]
        dist = float(np.hypot(dy, dx))
        drops.append((z - nb) / dist)
    drops = jnp.stack(drops)
    best = jnp.argmax(drops, axis=0)
    has_down = jnp.max(drops, axis=0) > 0
    return jnp.where(has_down, best, -1)


@partial(jax.jit, static_argnames=("n_iterations",))
def flow_accumulation(dem, n_iterations: int = 256):
    """Cells drained through each cell (including itself): iterative
    push along D8 directions until the longest flow path is resolved."""
    z = jnp.asarray(dem, jnp.float32)
    h, w = z.shape
    fdir = flow_direction(z)
    offs = jnp.asarray(_D8_OFFSETS)

    def body(_, acc):
        new = jnp.ones_like(acc)
        # each neighbor j contributes its acc if it flows into this cell
        for i, (dy, dx) in enumerate(_D8_OFFSETS):
            # rolled[i,j] holds the value of the neighbor at (i-dy, j-dx);
            # that neighbor flows into (i,j) iff its D8 direction is the
            # offset (dy, dx) pointing from it to us.
            nb_acc = jnp.roll(jnp.roll(acc, dy, 0), dx, 1)
            nb_dir = jnp.roll(jnp.roll(fdir, dy, 0), dx, 1)
            opp = _D8_OFFSETS.tolist().index([dy, dx])
            contrib = jnp.where(nb_dir == opp, nb_acc, 0.0)
            # cells rolled in from the border are invalid
            valid = jnp.ones((h, w), bool)
            if dy > 0:
                valid = valid.at[:dy, :].set(False)
            elif dy < 0:
                valid = valid.at[dy:, :].set(False)
            if dx > 0:
                valid = valid.at[:, :dx].set(False)
            elif dx < 0:
                valid = valid.at[:, dx:].set(False)
            new = new + jnp.where(valid, contrib, 0.0)
        return new

    acc = jnp.ones((h, w), jnp.float32)
    return jax.lax.fori_loop(0, n_iterations, body, acc)


@partial(jax.jit, static_argnames=("n_iterations",))
def cost_distance(cost, source_yx, n_iterations: int = 512):
    """Accumulated-cost surface from a source via Bellman-Ford-style
    relaxation over the 8-neighborhood (ref least-cost path capability,
    dem_processing.hpp:83)."""
    c = jnp.asarray(cost, jnp.float32)
    h, w = c.shape
    big = jnp.float32(1e30)
    dist = jnp.full_like(c, big).at[source_yx[0], source_yx[1]].set(0.0)

    def body(_, d):
        best = d
        p = jnp.pad(d, 1, mode="constant", constant_values=big)
        for dy, dx in _D8_OFFSETS.tolist():
            nb = p[1 + dy: 1 + dy + h, 1 + dx: 1 + dx + w]
            step = float(np.hypot(dy, dx)) * 0.5 * (
                c + jnp.pad(c, 1, mode="edge")[1 + dy: 1 + dy + h,
                                               1 + dx: 1 + dx + w])
            best = jnp.minimum(best, nb + step)
        return best

    return jax.lax.fori_loop(0, n_iterations, body, dist)


def least_cost_path(cost, source_yx, target_yx, n_iterations: int = 512):
    """Backtrack the cost-distance surface from target to source.
    Returns list of (y, x) (host-side walk)."""
    dist = np.asarray(cost_distance(cost, source_yx,
                                    n_iterations=n_iterations))
    h, w = dist.shape
    path = [tuple(target_yx)]
    cur = tuple(target_yx)
    for _ in range(h * w):
        if cur == tuple(source_yx):
            break
        cy, cx = cur
        best, best_d = cur, dist[cy, cx]
        for dy, dx in _D8_OFFSETS.tolist():
            ny, nx = cy + dy, cx + dx
            if 0 <= ny < h and 0 <= nx < w and dist[ny, nx] < best_d:
                best, best_d = (ny, nx), dist[ny, nx]
        if best == cur:
            break  # stuck (unreachable)
        cur = best
        path.append(cur)
    return path[::-1]


@partial(jax.jit, static_argnames=("out_h", "out_w", "method"))
def resample(dem, out_h: int, out_w: int, method: str = "bilinear"):
    """Resample to a new grid (ref: dem.py:267 resample)."""
    z = jnp.asarray(dem, jnp.float32)
    h, w = z.shape
    ys = jnp.linspace(0.0, h - 1.0, out_h)
    xs = jnp.linspace(0.0, w - 1.0, out_w)
    if method == "nearest":
        yi = jnp.round(ys).astype(jnp.int32)
        xi = jnp.round(xs).astype(jnp.int32)
        return z[yi[:, None], xi[None, :]]
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 2)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 2)
    fy = (ys - y0)[:, None]
    fx = (xs - x0)[None, :]
    return ((1 - fy) * (1 - fx) * z[y0[:, None], x0[None, :]]
            + (1 - fy) * fx * z[y0[:, None], x0[None, :] + 1]
            + fy * (1 - fx) * z[y0[:, None] + 1, x0[None, :]]
            + fy * fx * z[y0[:, None] + 1, x0[None, :] + 1])


def dem_statistics(dem) -> dict:
    """ref: dem.py:227 statistics."""
    a = np.asarray(dem, np.float64)
    finite = a[np.isfinite(a)]
    d = terrain_derivatives(jnp.asarray(a, jnp.float32))
    return {
        "min": float(finite.min()), "max": float(finite.max()),
        "mean": float(finite.mean()), "std": float(finite.std()),
        "mean_slope": float(np.asarray(d["slope"]).mean()),
    }


class DEMProcessor:
    """Facade bundling the DEM ops with a GeoTransform
    (ref: DEMProcessor, dem_processing.hpp:83; dem.py:86)."""

    def __init__(self, dem, geo_transform: GeoTransform = GeoTransform(),
                 cell_size: float = 1.0):
        self.dem = jnp.asarray(dem, jnp.float32)
        self.geo_transform = geo_transform
        self.cell_size = cell_size

    def viewshed(self, observer_yx, observer_height: float = 1.8, **kw):
        return viewshed(self.dem, observer_yx, observer_height,
                        self.cell_size, **kw)

    def terrain_derivatives(self):
        return terrain_derivatives(self.dem, self.cell_size)

    def hydrology(self, n_iterations: int = 256):
        filled = fill_sinks(self.dem, n_iterations)
        return {
            "filled": filled,
            "flow_direction": flow_direction(filled),
            "flow_accumulation": flow_accumulation(filled, n_iterations),
        }

    def least_cost_path(self, source_yx, target_yx, cost=None, **kw):
        if cost is None:
            cost = 1.0 + terrain_derivatives(self.dem,
                                             self.cell_size)["slope"] * 10.0
        return least_cost_path(cost, source_yx, target_yx, **kw)

    def fill_sinks(self, **kw):
        return fill_sinks(self.dem, **kw)

    def statistics(self):
        return dem_statistics(self.dem)

    def resample(self, out_h: int, out_w: int, method: str = "bilinear"):
        return resample(self.dem, out_h, out_w, method)
