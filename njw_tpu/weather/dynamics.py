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

def _shift(f: Array, delta: int, axis: int, bc: str) -> Array:
    """Return g with g[i] = f[i + delta] along `axis` under boundary `bc`."""
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
    """Nonlinear SWE tendencies (ref: weather_simulation.cpp:473-540)."""
    bc = grid.bc
    ddx = partial(d_dx, dx=grid.dx, bc=bc)
    ddy = partial(d_dy, dy=grid.dy, bc=bc)

    u, v, h = s.u, s.v, s.h
    u_x, u_y = ddx(u), ddy(u)
    v_x, v_y = ddx(v), ddy(v)
    h_x, h_y = ddx(h), ddy(h)

    f = coriolis_field(grid, params)
    g = params.gravity

    du = -u * u_x - v * u_y - g * h_x + f * v
    dv = -u * v_x - v * v_y - g * h_y - f * u
    dh = -h * (u_x + v_y) - u * h_x - v * h_y

    nu = params.viscosity
    # `is not None and != 0` can't be traced; rely on XLA to fold the
    # multiply when nu is a literal 0.0 — but avoid the laplacian entirely
    # for the common concrete-float case.
    if _is_concrete_zero(nu):
        pass
    else:
        lap = partial(laplacian, dx=grid.dx, dy=grid.dy, bc=bc)
        du = du + nu * lap(u)
        dv = dv + nu * lap(v)
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
        return lambda s: swe_tendencies(s, grid, params)
    if model == "barotropic":
        from njw_tpu.weather.barotropic import barotropic_tendencies

        return lambda s: barotropic_tendencies(s, grid, params)
    if model == "primitive":
        from njw_tpu.weather.primitive import pe_tendencies

        return lambda s: pe_tendencies(s, grid, params)
    raise ValueError(f"unknown model: {model!r}")
