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
    (ref: viewshedKernel, dem_kernels.cu:34).

    Polar radial sweep (r3): cast one ray per perimeter cell (the
    standard GIS ray-casting resolution); along each ray the running
    maximum elevation angle is an EXCLUSIVE cummax, and a cell is visible
    iff its own angle clears the cummax at its (ray, radius) bin. The r2
    per-target formulation gathered 4 x S*H*W bilinear samples — the
    measured TPU gather anti-pattern (782 ms at 512^2, worker OOM-crash
    at 2048^2); this sweep gathers R*L ~ 2(h+w)*diag nearest-neighbor
    samples (~40x less) and runs 512^2 in ~3 ms.

    n_samples is retained for API compatibility (the sweep samples every
    cell width along each ray, which dominates any n_samples <= diag).
    """
    z = jnp.asarray(dem, jnp.float32)
    h, w = z.shape
    oy, ox = observer_yx
    zo = z[oy, ox] + observer_height

    L = int(np.ceil(np.hypot(h, w)))            # max radius (cells)
    R = int(-(-2 * (h + w) // 128) * 128)       # rays, lane-aligned
    theta = (2.0 * np.pi / R) * jnp.arange(R, dtype=jnp.float32)
    r = jnp.arange(1, L + 1, dtype=jnp.float32)         # (L,)
    sy = oy + r[None, :] * jnp.sin(theta)[:, None]      # (R, L)
    sx = ox + r[None, :] * jnp.cos(theta)[:, None]
    iy = jnp.clip(jnp.round(sy).astype(jnp.int32), 0, h - 1)
    ix = jnp.clip(jnp.round(sx).astype(jnp.int32), 0, w - 1)
    inside = ((sy >= -0.5) & (sy <= h - 0.5)
              & (sx >= -0.5) & (sx <= w - 0.5))
    z_s = jnp.where(inside, z[iy, ix], -jnp.inf)        # one gather
    tan_a = (z_s - zo) / r[None, :]
    # exclusive running max: blockers strictly CLOSER than each radius
    bm = jax.lax.cummax(
        jnp.concatenate([jnp.full((R, 1), -jnp.inf), tan_a[:, :-1]],
                        axis=1), axis=1)                # (R, L)

    # map every grid cell to its (ray, radius) bin
    yy, xx = jnp.mgrid[0:h, 0:w]
    dy = (yy - oy).astype(jnp.float32)
    dx = (xx - ox).astype(jnp.float32)
    dist = jnp.sqrt(dy * dy + dx * dx)
    ang = jnp.arctan2(dy, dx)
    j = jnp.mod(jnp.round(ang * (R / (2.0 * np.pi))).astype(jnp.int32), R)
    k = jnp.clip(jnp.round(dist).astype(jnp.int32) - 1, 0, L - 1)
    tan_cell = (z - zo) / jnp.maximum(dist, 0.5)
    blocked = bm[j, k] > tan_cell + 1e-6                # one gather
    vis = ~blocked
    return vis.at[oy, ox].set(True)


# ---------------------------------------------------------------------------
# Fast-sweeping building blocks.
#
# The r2 implementations relaxed one cell per iteration (256-512 sequential
# fori_loop steps — the long-sequential-scan TPU anti-pattern measured in
# SIGNAL_BENCH.md). Each directed LINE sweep below instead propagates
# across the whole grid in one log-depth scan (cumsum+cummin for min-plus;
# a 3-component associative scan for the fill recurrence), and diagonal
# directions become column scans after a shear (pad+reshape — no gather).
# A full cycle = 8 directed sweeps; iterate cycles to the SAME fixed point
# as the one-cell relaxation, with convergence-based early exit
# (fast-sweeping converges in a handful of cycles for natural terrain).
# ---------------------------------------------------------------------------

_BIG = 1e30


def _shear(a, pad_value):
    """out[i, i+j] = a[i, j]: anti-diagonals (i+j const) become columns.
    Pure pad+reshape — each row i is offset by i in the flat layout."""
    h, w = a.shape
    p = jnp.pad(a, ((0, 0), (0, h)), constant_values=pad_value)
    return p.reshape(-1)[: h * (w + h - 1)].reshape(h, w + h - 1)


def _unshear(x, h, w):
    """Inverse of _shear: a[i, j] = x[i, i+j]."""
    flat = x.reshape(-1)
    flat = jnp.pad(flat, (0, h * (w + h) - flat.size))
    return flat.reshape(h, w + h)[:, :w]


def _minplus_sweep(d, e):
    """Exact shortest-path line relaxation along the LAST axis, both
    directions (Gauss-Seidel: the backward pass sees the forward result).

    e[..., j] is the edge cost between cells j-1 and j (e[..., 0] = 0).
    min over sources j'<=j of d[j'] + sum(e[j'+1..j]) equals
    C[j] + cummin(d - C)[j] with C = cumsum(e) — a log-depth scan instead
    of a length-n relaxation chain."""
    ax = d.ndim - 1
    C = jnp.cumsum(e, axis=ax)
    d = jnp.minimum(d, C + jax.lax.cummin(d - C, axis=ax))
    er = jnp.concatenate(
        [jnp.zeros_like(e[..., :1]), jnp.flip(e, ax)[..., :-1]], axis=ax)
    df = jnp.flip(d, ax)
    Cr = jnp.cumsum(er, axis=ax)
    df = jnp.minimum(df, Cr + jax.lax.cummin(df - Cr, axis=ax))
    return jnp.flip(df, ax)


def _fill_sweep(wv, z, eps):
    """One Gauss-Seidel line solve of W = min(W, max(z, W_prev + eps))
    along the last axis, both directions. The per-cell update map
    f(h) = min(a, max(b, h + m)) is closed under composition
    (A = min(a2, max(b2, a1+m2)), B = max(b2, b1+m2), M = m1+m2), so the
    whole line resolves in one associative scan."""
    ax = wv.ndim - 1

    def compose(l, r):
        a1, b1, m1 = l
        a2, b2, m2 = r
        return (jnp.minimum(a2, jnp.maximum(b2, a1 + m2)),
                jnp.maximum(b2, b1 + m2), m1 + m2)

    m = jnp.full_like(wv, eps)
    # applying the prefix map to h0=+BIG yields A (A <= a <= BIG)
    wv, _, _ = jax.lax.associative_scan(compose, (wv, z, m), axis=ax)
    wf, zf = jnp.flip(wv, ax), jnp.flip(z, ax)
    wf, _, _ = jax.lax.associative_scan(compose, (wf, zf, m), axis=ax)
    return jnp.flip(wf, ax)


def _converge(cycle, x0, n_max: int, tol: float):
    """Iterate `cycle` until max|delta| <= tol (monotone relaxations)."""

    def cond(state):
        _, delta, it = state
        return jnp.logical_and(it < n_max, delta > tol)

    def body(state):
        x, _, it = state
        x2 = cycle(x)
        return x2, jnp.max(jnp.abs(x2 - x)), it + 1

    out, _, _ = jax.lax.while_loop(
        cond, body, (x0, jnp.float32(jnp.inf), jnp.int32(0)))
    return out


@partial(jax.jit, static_argnames=("n_iterations",))
def fill_sinks(dem, n_iterations: int = 64, epsilon: float = 1e-3):
    """Depression filling: W starts at +inf except at the boundary, and
    relaxes to the least fixed point of
    W = max(z, min(W, min_8neighbor(W) + eps))
    (ref: fillSinksIterationKernel + init, dem_kernels.cu:276-356).
    Implemented as fast-sweeping line solves (see _fill_sweep);
    n_iterations bounds the number of 8-direction sweep CYCLES (the r2
    one-cell-per-step relaxation needed one iteration per path cell)."""
    z = jnp.asarray(dem, jnp.float32)
    h, w = z.shape
    big = jnp.float32(_BIG)
    w0 = jnp.full_like(z, big)
    w0 = w0.at[0, :].set(z[0, :]).at[-1, :].set(z[-1, :])
    w0 = w0.at[:, 0].set(z[:, 0]).at[:, -1].set(z[:, -1])
    zs1 = _shear(z, -_BIG)
    zs2 = _shear(z[:, ::-1], -_BIG)

    def cycle(wv):
        wv = jnp.maximum(z, _fill_sweep(wv, z, epsilon))          # E, W
        wv = jnp.maximum(z, _fill_sweep(wv.T, z.T, epsilon).T)    # S, N
        ws = _shear(wv, _BIG)                                     # SW, NE
        ws = _fill_sweep(ws.T, zs1.T, epsilon).T
        wv = jnp.maximum(z, _unshear(ws, h, w))
        ws = _shear(wv[:, ::-1], _BIG)                            # SE, NW
        ws = _fill_sweep(ws.T, zs2.T, epsilon).T
        return jnp.maximum(z, _unshear(ws, h, w)[:, ::-1])

    return _converge(cycle, w0, n_iterations, epsilon * 0.25)


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


@partial(jax.jit, static_argnames=("n_iterations", "method"))
def flow_accumulation(dem, n_iterations: int = 0,
                      method: str = "push"):
    """Cells drained through each cell (including itself).

    The D8 directions form a forest (each cell has at most one outgoing
    pointer), so accumulation = sum_k (F^T)^k w with F the pointer matrix.

    method='push' (default): gather-free Jacobi mass push — every cell's
    moving mass advances ONE hop per round via 8 masked zero-fill shifts
    (pure VPU ops, stencil-shaped), while-looped until no mass moves.
    Round count = longest drainage path; on TPU each round is ~100x
    cheaper than a gather/scatter round, so it measures 0.135 ms at 512^2
    vs the doubling path's 24.5 (BENCH_NOTES r4) — 54x the best CPU
    number, finally clearing the reference's 10-100x target for this op.

    method='doubling': F^T is nilpotent, so the series is computed
    EXACTLY by pointer doubling: ceil(log2(path)) rounds of (scatter-add
    along ptr; ptr <- ptr[ptr]). Fewer rounds, but each is a full-grid
    gather + scatter (the measured TPU anti-pattern); it is the better
    formulation on CPU (7.2 vs 24.5 ms at 512^2) and for adversarial
    terrain whose longest drainage path exceeds ~1000 cells.

    Both methods are bit-identical (tests pin it). n_iterations (kept
    for API compatibility) optionally caps the resolvable path length."""
    if method == "push":
        return _flow_accumulation_push(dem, n_iterations)
    z = jnp.asarray(dem, jnp.float32)
    h, w = z.shape
    n = h * w
    fdir = flow_direction(z)
    offs = jnp.asarray(_D8_OFFSETS)
    dy = offs[jnp.clip(fdir, 0, 7), 0]
    dx = offs[jnp.clip(fdir, 0, 7), 1]
    yy, xx = jnp.mgrid[0:h, 0:w]
    ty, tx = yy + dy, xx + dx
    valid = ((fdir >= 0) & (ty >= 0) & (ty < h) & (tx >= 0) & (tx < w))
    # pits and off-grid flows drain into a dead slot at index n
    ptr = jnp.where(valid, ty * w + tx, n).reshape(-1).astype(jnp.int32)

    max_len = n if n_iterations <= 0 else min(n_iterations, n)
    rounds = max(int(np.ceil(np.log2(max(max_len, 2)))), 1)

    def cond(state):
        acc, p, i = state
        # early exit once every pointer chain has terminated (all point
        # at the dead slot) — natural terrain converges in ~log2(longest
        # flow path) rounds, well under the log2(n) worst case
        return (i < rounds) & jnp.any(p[:n] != n)

    def body(state):
        acc, p, i = state
        sums = jnp.zeros(n + 1, jnp.float32).at[p].add(acc[:n])
        acc = acc + sums
        p = jnp.concatenate([p, jnp.array([n], jnp.int32)])[p]
        return acc, p, i + 1

    acc0 = jnp.ones(n + 1, jnp.float32).at[n].set(0.0)
    acc, _, _ = jax.lax.while_loop(
        cond, body, (acc0, ptr, jnp.int32(0)))
    return acc[:n].reshape(h, w)


@partial(jax.jit, static_argnames=("n_iterations",))
def _flow_accumulation_push(dem, n_iterations: int = 0):
    """Gather-free flow accumulation: masked-roll Jacobi push (see
    flow_accumulation(method='push'))."""
    z = jnp.asarray(dem, jnp.float32)
    h, w = z.shape
    fdir = flow_direction(z)
    valid = fdir >= 0
    max_rounds = h * w if n_iterations <= 0 else int(n_iterations)

    def shift_to(f, dy: int, dx: int):
        """Mass at (y, x) lands at (y+dy, x+dx); off-grid mass drains
        away (zero fill), matching the doubling method's dead slot."""
        p = jnp.pad(f, 1)
        return p[1 - dy:1 - dy + h, 1 - dx:1 - dx + w]

    def body(state):
        acc, mov, i = state
        pushed = jnp.zeros_like(acc)
        for d, (dy, dx) in enumerate(_D8_OFFSETS.tolist()):
            pushed = pushed + shift_to(
                jnp.where(fdir == d, mov, 0.0), dy, dx)
        # mass landing on a pit stays (already counted in acc)
        return (acc + pushed, jnp.where(valid, pushed, 0.0), i + 1)

    def cond(state):
        _, mov, i = state
        return (i < max_rounds) & jnp.any(mov > 0)

    acc0 = jnp.ones((h, w), jnp.float32)
    mov0 = jnp.where(valid, 1.0, 0.0)
    acc, _, _ = jax.lax.while_loop(cond, body,
                                   (acc0, mov0, jnp.int32(0)))
    return acc


@partial(jax.jit, static_argnames=("n_iterations",))
def cost_distance(cost, source_yx, n_iterations: int = 64):
    """Accumulated-cost surface from a source over the 8-neighborhood
    with edge cost hypot(dy,dx) * (c_from + c_to) / 2 (ref least-cost
    path capability, dem_processing.hpp:83).

    Fast-sweeping: full-grid min-plus LINE relaxations (E/W, S/N, and
    both diagonal families via shear) iterated to the Bellman fixed
    point — same answer as the r2 one-cell-per-step relaxation, but each
    sweep is a log-depth scan and natural terrain converges in a few
    cycles. n_iterations bounds the sweep cycles."""
    c = jnp.asarray(cost, jnp.float32)
    h, w = c.shape
    big = jnp.float32(_BIG)
    d0 = jnp.full_like(c, big).at[source_yx[0], source_yx[1]].set(0.0)

    def edges(cc):
        return jnp.concatenate(
            [jnp.zeros_like(cc[..., :1]),
             0.5 * (cc[..., :-1] + cc[..., 1:])], axis=-1)

    r2 = float(np.sqrt(2.0))
    e_h = edges(c)
    e_v = edges(c.T)
    # sheared cost pads are ZERO so cumulative sums stay real-sized (pad
    # cells carry d=BIG and can never win a relaxation)
    e_d1 = r2 * edges(_shear(c, 0.0).T)
    e_d2 = r2 * edges(_shear(c[:, ::-1], 0.0).T)

    def cycle(d):
        d = _minplus_sweep(d, e_h)                        # E, W
        d = _minplus_sweep(d.T, e_v).T                    # S, N
        ds = _shear(d, _BIG)                              # SW, NE
        d = _unshear(_minplus_sweep(ds.T, e_d1).T, h, w)
        ds = _shear(d[:, ::-1], _BIG)                     # SE, NW
        d = _unshear(_minplus_sweep(ds.T, e_d2).T, h, w)[:, ::-1]
        return jnp.minimum(d, big)

    return _converge(cycle, d0, n_iterations, 1e-5)


def least_cost_path(cost, source_yx, target_yx, n_iterations: int = 64):
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

    def hydrology(self, n_iterations: int = 64):
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
