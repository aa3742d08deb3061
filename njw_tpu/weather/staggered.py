"""Arakawa C-grid shallow-water core (Sadourny 1975, enstrophy form).

The reference declares GridType::Staggered (ref: weather_sim.hpp:61-66)
and never implements any grid but collocated Cartesian; this module is a
REAL staggered core — the discretization used by actual operational
dynamical cores, with properties the A-grid central-difference scheme
cannot have:

* exact mass conservation (flux-form continuity telescopes),
* no computational checkerboard mode (the C-grid resolves gravity waves
  at 2-cell wavelength where A-grid central differences are blind),
* conserved potential enstrophy in the advective term (Sadourny's
  q-flux form), giving nonlinear stability without explicit viscosity.

Staggering (periodic, ny x nx arrays for every variable; index [j, i]):

    h[j, i]   at cell centers          (x_i,       y_j)
    u[j, i]   at east  faces           (x_i + dx/2, y_j)
    v[j, i]   at north faces           (x_i,       y_j + dy/2)
    q[j, i]   at corners               (x_i + dx/2, y_j + dy/2)

Scheme (Sadourny 1975 "energy and enstrophy conserving" enstrophy form):

    U = hbar^x u            mass flux at u points
    V = hbar^y v            mass flux at v points
    zeta = dv/dx - du/dy    at corners
    q = (zeta + f) / hbar^xy
    du/dt = +qbar^y Vbar^xy - d/dx (g h + K)
    dv/dt = -qbar^x Ubar^xy - d/dy (g h + K)
    dh/dt = -(dU/dx + dV/dy)
    K = (u^2bar^x + v^2bar^y) / 2   at centers

All shifts are periodic rolls; XLA fuses the averaging chains. The same
pure-tendency contract as the A-grid core, so every integrator and the
Simulation driver work unchanged.
"""
from __future__ import annotations

import jax.numpy as jnp

from njw_tpu.weather.grid import GridSpec, PhysicsParams, WeatherState

_X, _Y = -1, -2


def _roll(f, d, axis):
    return jnp.roll(f, -d, axis=axis)


def _dx(f, dx):    # forward difference to the +x staggered location
    return (_roll(f, 1, _X) - f) / dx


def _dy(f, dy):
    return (_roll(f, 1, _Y) - f) / dy


def _dxm(f, dx):   # backward difference to the -x staggered location
    return (f - _roll(f, -1, _X)) / dx


def _dym(f, dy):
    return (f - _roll(f, -1, _Y)) / dy


def _avx(f):       # average to the +x staggered location
    return 0.5 * (f + _roll(f, 1, _X))


def _avy(f):
    return 0.5 * (f + _roll(f, 1, _Y))


def _avxm(f):      # average to the -x staggered location
    return 0.5 * (f + _roll(f, -1, _X))


def _avym(f):
    return 0.5 * (f + _roll(f, -1, _Y))


def swe_tendencies_cgrid(
    s: WeatherState, grid: GridSpec, params: PhysicsParams
) -> WeatherState:
    """Sadourny enstrophy-conserving C-grid SWE tendencies (periodic)."""
    u, v, h = s.u, s.v, s.h
    g = params.gravity
    f = params.coriolis_f
    dx, dy = grid.dx, grid.dy

    hx = _avx(h)                    # h at u points
    hy = _avy(h)                    # h at v points
    U = hx * u                      # mass fluxes
    V = hy * v

    # corner quantities: zeta and q at (i+1/2, j+1/2)
    zeta = _dx(v, dx) - _dy(u, dy)
    h_corner = _avy(_avx(h))
    q = (zeta + f) / jnp.maximum(h_corner, 1e-12)

    # kinetic energy at centers: K = (bar^x(u^2) + bar^y(v^2)) / 2,
    # averaging the squares from faces BACK to centers
    K = 0.5 * (_avxm(u * u) + _avym(v * v))
    phi = g * h + K

    # momentum: du/dt = +qbar^y * Vbar^xy|_(u point) - d(phi)/dx|_(u point)
    #   V lives at v points (i, j+1/2); to the u point (i+1/2, j):
    #   average in x (+) and y (-)
    V_at_u = _avx(_avym(V))
    U_at_v = _avy(_avxm(U))
    du = _avym(q) * V_at_u - _dx(phi, dx)
    dv = -_avxm(q) * U_at_v - _dy(phi, dy)

    # continuity: dh/dt = -(dU/dx + dV/dy) with backward differences
    # (fluxes at faces -> divergence at centers): exact telescoping
    dh = -(_dxm(U, dx) + _dym(V, dy))

    nu = params.viscosity
    if not (isinstance(nu, (int, float)) and nu == 0.0):
        def lap(a):
            return ((_roll(a, 1, _X) - 2 * a + _roll(a, -1, _X)) / dx ** 2
                    + (_roll(a, 1, _Y) - 2 * a + _roll(a, -1, _Y)) / dy ** 2)

        du = du + nu * lap(u)
        dv = dv + nu * lap(v)

    return WeatherState(u=du, v=dv, h=dh)


def potential_enstrophy(s: WeatherState, grid: GridSpec,
                        params: PhysicsParams) -> jnp.ndarray:
    """Z = sum(q^2 h_corner)/2 — the invariant Sadourny's scheme
    conserves (up to time-truncation error)."""
    zeta = _dx(s.v, grid.dx) - _dy(s.u, grid.dy)
    h_corner = _avy(_avx(s.h))
    q = (zeta + params.coriolis_f) / jnp.maximum(h_corner, 1e-12)
    return 0.5 * jnp.sum(q * q * h_corner)


def total_energy(s: WeatherState, grid: GridSpec,
                 params: PhysicsParams) -> jnp.ndarray:
    """E = sum( h K + g h^2 / 2 ) on the C-grid."""
    K = 0.5 * (_avxm(s.u * s.u) + _avym(s.v * s.v))
    return jnp.sum(s.h * K + 0.5 * params.gravity * s.h * s.h)


def geostrophic_balance_state(grid: GridSpec, params: PhysicsParams, *,
                              amplitude: float = 0.1,
                              mean_depth: float = 10.0) -> WeatherState:
    """A discretely balanced state for the C-grid operators: h a smooth
    periodic bump; u, v from the DISCRETE geostrophic relations
    f u = -g dh/dy|_(u point), f v = +g dh/dx|_(v point), evaluated with
    the same staggered differences the core uses."""
    y, x = grid.coords()
    ky = 2.0 * jnp.pi / grid.ny
    kx = 2.0 * jnp.pi / grid.nx
    h = mean_depth + amplitude * (jnp.sin(ky * y)[:, None]
                                  * jnp.sin(kx * x)[None, :])
    g = params.gravity
    f = params.coriolis_f
    # dh/dy at the u point (i+1/2, j): average the v-point gradient
    dh_dy_at_u = _avx(_avym(_dy(h, grid.dy)))
    dh_dx_at_v = _avy(_avxm(_dx(h, grid.dx)))
    u = -(g / f) * dh_dy_at_u
    v = (g / f) * dh_dx_at_v
    return WeatherState(u=u.astype(jnp.float32), v=v.astype(jnp.float32),
                        h=h.astype(jnp.float32))
