"""Tendency functions for the dynamical cores (pure jnp — the XLA path).

This is the TPU-native replacement for the reference's CPU/CUDA tendency
code. The math matches the reference shallow-water core exactly:

    du/dt = -u du/dx - v du/dy - g dh/dx + f v
    dv/dt = -u dv/dx - v dv/dy - g dh/dy - f u
    dh/dt = -h (du/dx + dv/dy) - u dh/dx - v dh/dy

(ref: src/weather-sim/cpp/src/weather_simulation.cpp:530-537, central
differences ref :521-527), with two additions the reference declares but
never applies: viscosity/diffusivity (config fields, ref:
weather_sim.hpp:173-174) and a beta-plane Coriolis variation f = f0 + beta*y
(beta is config'd at weather_sim.hpp:172 but unused in tendencies).

Contract: tendency functions are *pure* — ``T(state) -> d(state)/dt`` — so a
single implementation serves every integrator. The reference's GPU kernels
instead fuse a forward-Euler update into the stencil
(ref: shallow_water_kernels.cu:213-217) which is incompatible with its own
RK4 driver; here the fusion is done by XLA/Pallas per integrator stage.

Everything here is shard_map-safe: with periodic BC the rolls become
``lax.ppermute`` halo exchanges when the domain is decomposed (see
njw_tpu.parallel.halo).
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax.numpy as jnp

from njw_tpu.weather.grid import GridSpec, PhysicsParams, WeatherState

Array = jnp.ndarray

_X, _Y = -1, -2  # axis convention: fields are (..., ny, nx)


# --------------------------------------------------------------------------
# Neighbor shifts. shift_*(f)[j] == f[j +/- 1] with the grid's BC applied.
# 'clamped' reproduces the reference CPU stencil's index clamping
# (ref: weather_simulation.cpp:509-513): the out-of-range neighbor is the
# cell itself, making one-sided half differences at the walls.
# --------------------------------------------------------------------------

def scalar_bc(bc: str) -> str:
    """The ghost-cell rule for SCALAR fields under each BC. With
    cell-centered halo-1 stencils, 'outflow' (zero-gradient) and
    'reflective' (symmetric about the wall face) both reduce to edge
    clamping for scalars (ref BC enum: weather_sim.hpp:40-45 declares
    Periodic/Reflective/Outflow/Custom but never implements them);
    reflective additionally flips the wall-NORMAL velocity's ghost sign
    (handled in swe_tendencies)."""
    return "clamped" if bc in ("clamped", "outflow", "reflective") else bc


def _shift(f: Array, delta: int, axis: int, bc: str) -> Array:
    """Return g with g[i] = f[i + delta] along `axis` under boundary `bc`
    (scalar-field ghost rule; see scalar_bc)."""
    bc = scalar_bc(bc)
    if bc == "periodic":
        return jnp.roll(f, -delta, axis=axis)
    # clamped: repeat the edge cell
    n = f.shape[axis]
    idx = [slice(None)] * f.ndim
    edge = [slice(None)] * f.ndim
    if delta == 1:
        idx[axis] = slice(1, n)
        edge[axis] = slice(n - 1, n)
        return jnp.concatenate([f[tuple(idx)], f[tuple(edge)]], axis=axis)
    elif delta == -1:
        idx[axis] = slice(0, n - 1)
        edge[axis] = slice(0, 1)
        return jnp.concatenate([f[tuple(edge)], f[tuple(idx)]], axis=axis)
    raise ValueError(f"unsupported shift {delta}")


def pad_and_shift(bc: str, ny: int, nx: int, halo: int = 1):
    """Pad-once + slice-view shift accessor for whole-domain arrays.

    XLA materializes every roll (a concatenate) but fuses slices of a
    padded array into consumers — measured ~4x less HBM traffic per
    tendency on TPU than the roll path. Returns (pad_fn, shift_fn,
    crop_fn) matching the swe/pe_tendencies_from_shifts contract.
    """
    h = halo
    mode = "wrap" if scalar_bc(bc) == "periodic" else "edge"

    def pad(f: Array) -> Array:
        width = [(0, 0)] * (f.ndim - 2) + [(h, h), (h, h)]
        return jnp.pad(f, width, mode=mode)

    def shift(fp: Array, dxi: int = 0, dyi: int = 0) -> Array:
        return fp[..., h + dyi: h + dyi + ny, h + dxi: h + dxi + nx]

    def crop(fp: Array) -> Array:
        return fp[..., h: h + ny, h: h + nx]

    return pad, shift, crop


def make_shift_fn(bc: str):
    """shift(f, dxi, dyi) -> f offset by (dxi, dyi) grid cells.

    The physics below is written against this signature only, so the same
    tendency math runs on (a) whole-domain arrays (roll/clamp, this
    function), (b) halo-padded local shards (slicing views,
    njw_tpu.parallel.halo.make_padded_shift_fn), and (c) Pallas VMEM blocks.
    """

    def shift(f: Array, dxi: int = 0, dyi: int = 0) -> Array:
        out = f
        if dxi:
            out = _shift(out, dxi, _X, bc)
        if dyi:
            out = _shift(out, dyi, _Y, bc)
        return out

    return shift


def d_dx(f: Array, dx: float, bc: str) -> Array:
    """Central difference along x (ref: weather_simulation.cpp:521)."""
    return (_shift(f, 1, _X, bc) - _shift(f, -1, _X, bc)) * (0.5 / dx)


def d_dy(f: Array, dy: float, bc: str) -> Array:
    """Central difference along y (ref: weather_simulation.cpp:522)."""
    return (_shift(f, 1, _Y, bc) - _shift(f, -1, _Y, bc)) * (0.5 / dy)


def laplacian(f: Array, dx: float, dy: float, bc: str) -> Array:
    """5-point Laplacian (for the viscosity/diffusivity terms)."""
    fxx = (_shift(f, 1, _X, bc) - 2.0 * f + _shift(f, -1, _X, bc)) / (dx * dx)
    fyy = (_shift(f, 1, _Y, bc) - 2.0 * f + _shift(f, -1, _Y, bc)) / (dy * dy)
    return fxx + fyy


# --------------------------------------------------------------------------
# Shift-parameterized physics core (shared by global / sharded / Pallas
# paths). `shift(f, dxi, dyi)` must return fields of the *output* shape.
# --------------------------------------------------------------------------

def swe_tendencies_from_shifts(u, v, h, shift, grid: GridSpec,
                               params: PhysicsParams, interior=None):
    """SWE tendencies given a neighbor-shift accessor.

    interior: optional fn cropping a (possibly padded) field to the output
    shape; identity for whole-domain arrays.
    """
    crop = interior if interior is not None else (lambda f: f)
    cx = 0.5 / grid.dx
    cy = 0.5 / grid.dy

    u_x = (shift(u, 1, 0) - shift(u, -1, 0)) * cx
    u_y = (shift(u, 0, 1) - shift(u, 0, -1)) * cy
    v_x = (shift(v, 1, 0) - shift(v, -1, 0)) * cx
    v_y = (shift(v, 0, 1) - shift(v, 0, -1)) * cy
    h_x = (shift(h, 1, 0) - shift(h, -1, 0)) * cx
    h_y = (shift(h, 0, 1) - shift(h, 0, -1)) * cy

    uc, vc, hc = crop(u), crop(v), crop(h)
    f = params.coriolis_f
    g = params.gravity

    du = -uc * u_x - vc * u_y - g * h_x + f * vc
    dv = -uc * v_x - vc * v_y - g * h_y - f * uc
    dh = -hc * (u_x + v_y) - uc * h_x - vc * h_y

    nu = params.viscosity
    if not _is_concrete_zero(nu):
        idx2 = 1.0 / (grid.dx * grid.dx)
        idy2 = 1.0 / (grid.dy * grid.dy)
        for fld, cen, acc in ((u, uc, "du"), (v, vc, "dv")):
            lap = (shift(fld, 1, 0) - 2.0 * cen + shift(fld, -1, 0)) * idx2 + (
                shift(fld, 0, 1) - 2.0 * cen + shift(fld, 0, -1)
            ) * idy2
            if acc == "du":
                du = du + nu * lap
            else:
                dv = dv + nu * lap
    return du, dv, dh


def coriolis_field(grid: GridSpec, params: PhysicsParams) -> Array:
    """f = f0 + beta * (y_norm - 1/2), broadcastable over (ny, nx).

    The reference only ever uses constant f in tendencies
    (ref: weather_simulation.cpp:535-536) but declares beta
    (weather_sim.hpp:172); with beta == 0 this reduces to the constant.
    """
    y, _ = grid.coords()
    y_norm = y / max(grid.ny - 1, 1)
    return params.coriolis_f + params.beta * (y_norm - 0.5)


# --------------------------------------------------------------------------
# Shallow water equations
# --------------------------------------------------------------------------

def swe_tendencies(
    s: WeatherState, grid: GridSpec, params: PhysicsParams
) -> WeatherState:
    """Nonlinear SWE tendencies (ref: weather_simulation.cpp:473-540).

    Whole-domain entry point; the physics lives in
    :func:`swe_tendencies_from_shifts` (shared with the sharded and Pallas
    paths). Beta-plane support enters by materializing f as a field.
    """
    p = params
    if not _is_concrete_zero(params.beta):
        p = params.replace(coriolis_f=coriolis_field(grid, params))
    pad, shift, crop = pad_and_shift(grid.bc, grid.ny, grid.nx)
    up, vp, hp = pad(s.u), pad(s.v), pad(s.h)
    if grid.bc == "reflective":
        # wall-normal velocity ghost flips sign (no-flux wall):
        # u at the x walls, v at the y walls. Corners get exactly one
        # flip per component (the other direction is tangential).
        up = up.at[..., :, 0].multiply(-1.0).at[..., :, -1].multiply(-1.0)
        vp = vp.at[..., 0, :].multiply(-1.0).at[..., -1, :].multiply(-1.0)
    du, dv, dh = swe_tendencies_from_shifts(
        up, vp, hp, shift, grid, p, interior=crop
    )
    return WeatherState(u=du, v=dv, h=dh)


def _is_concrete_zero(x) -> bool:
    return isinstance(x, (int, float)) and x == 0.0


# --------------------------------------------------------------------------
# Diagnostics (ref: weather_grid.cpp:82-121) — computed on demand, not
# stored: vorticity = dv/dx - du/dy, divergence = du/dx + dv/dy.
# --------------------------------------------------------------------------

def diagnostics(s: WeatherState, grid: GridSpec) -> dict[str, Array]:
    ddx = partial(d_dx, dx=grid.dx, bc=grid.bc)
    ddy = partial(d_dy, dy=grid.dy, bc=grid.bc)
    return {
        "vorticity": ddx(s.v) - ddy(s.u),
        "divergence": ddx(s.u) + ddy(s.v),
    }


# --------------------------------------------------------------------------
# Model registry. The barotropic and primitive-equation cores live in their
# own modules (real implementations — the reference falls back to SWE for
# both, ref: weather_simulation.cpp:542-560).
# --------------------------------------------------------------------------

def make_tendency_fn(
    model: str, grid: GridSpec, params: PhysicsParams
) -> Callable[[WeatherState], WeatherState]:
    grid.validate()
    if model in ("shallow_water", "general"):
        if grid.grid_type == "staggered":
            from njw_tpu.weather.staggered import swe_tendencies_cgrid

            return lambda s: swe_tendencies_cgrid(s, grid, params)
        return lambda s: swe_tendencies(s, grid, params)
    if model == "barotropic":
        from njw_tpu.weather.barotropic import barotropic_tendencies

        return lambda s: barotropic_tendencies(s, grid, params)
    if model == "primitive":
        from njw_tpu.weather.primitive import pe_tendencies

        return lambda s: pe_tendencies(s, grid, params)
    raise ValueError(f"unknown model: {model!r}")
