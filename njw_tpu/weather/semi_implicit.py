"""Semi-implicit (Crank-Nicolson gravity wave) integrator for SWE.

Real implementation of the method the reference declares and silently maps
to Euler (ref: weather_simulation.cpp:465-471). The stiff linearized
gravity-wave terms are treated implicitly with a trapezoidal step and
eliminated to a single spectral Helmholtz solve for h; advection/Coriolis
stay explicit. This lifts the CFL limit from the fast gravity-wave speed
sqrt(g H) to the advective speed — the standard trick in operational NWP
dynamical cores.

Scheme (periodic BC):
    T(s)   = N(s) + L(s)
    L      = [ -g dh/dx;  -g dh/dy;  -H (du/dx + dv/dy) ],  H = mean depth
    s*     = s + dt N(s) + (dt/2) L s
    (I - (dt/2) L) s'   = s*          (solved in Fourier space)

Elimination (a = dt/2, k_eff = FD-consistent modified wavenumbers so the
implicit operator matches the explicit central differences exactly):
    h' = (h* - a H i(kx u* + ky v*)) / (1 + a^2 g H |k|^2)
    u' = u* - a g i kx h'
    v' = v* - a g i ky h'
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from njw_tpu.ops.spectral import fd_wavenumbers
from njw_tpu.weather.dynamics import d_dx, d_dy
from njw_tpu.weather.grid import GridSpec, PhysicsParams, WeatherState
from njw_tpu.weather.integrators import Stepper, _axpy


def semi_implicit_swe(
    tendency, *, grid: GridSpec, params: PhysicsParams
) -> Stepper:
    if grid.bc != "periodic":
        raise NotImplementedError(
            "semi-implicit integrator requires periodic boundaries "
            "(spectral Helmholtz solve)"
        )
    g = params.gravity
    H = params.mean_depth
    kx = fd_wavenumbers(grid.nx, grid.dx, "central")[None, :]
    ky = fd_wavenumbers(grid.ny, grid.dy, "central")[:, None]
    k2 = kx * kx + ky * ky

    def linear(s: WeatherState) -> WeatherState:
        return WeatherState(
            u=-g * d_dx(s.h, grid.dx, grid.bc),
            v=-g * d_dy(s.h, grid.dy, grid.bc),
            h=-H * (d_dx(s.u, grid.dx, grid.bc) + d_dy(s.v, grid.dy, grid.bc)),
        )

    def step(carry, s: WeatherState, dt):
        a = 0.5 * dt
        t_full = tendency(s)
        l_s = linear(s)
        nonlinear = jax.tree.map(lambda tf, lf: tf - lf, t_full, l_s)
        # s* = s + dt*N + a*L s
        s_star = _axpy(a, l_s, _axpy(dt, nonlinear, s))

        u_hat = jnp.fft.fft2(s_star.u)
        v_hat = jnp.fft.fft2(s_star.v)
        h_hat = jnp.fft.fft2(s_star.h)

        denom = 1.0 + (a * a) * g * H * k2
        h_new_hat = (h_hat - a * H * 1j * (kx * u_hat + ky * v_hat)) / denom
        u_new_hat = u_hat - a * g * 1j * kx * h_new_hat
        v_new_hat = v_hat - a * g * 1j * ky * h_new_hat

        dtype = s.u.dtype
        s_new = WeatherState(
            u=jnp.real(jnp.fft.ifft2(u_new_hat)).astype(dtype),
            v=jnp.real(jnp.fft.ifft2(v_new_hat)).astype(dtype),
            h=jnp.real(jnp.fft.ifft2(h_new_hat)).astype(dtype),
        )
        return carry, s_new

    return Stepper(lambda s: (), step, "semi_implicit", 2)
