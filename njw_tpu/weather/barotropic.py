"""Barotropic vorticity dynamical core (real implementation).

The reference declares SimulationModel::Barotropic but falls back to shallow
water (ref: weather_simulation.cpp:542-549). This module implements the
capability for real, per the BASELINE mandate:

    d zeta / dt = -J(psi, zeta) - beta * v + nu Laplacian(zeta)
    Laplacian(psi) = zeta,   u = -dpsi/dy,  v = dpsi/dx

* J is the Arakawa (1966) energy- and enstrophy-conserving 9-point Jacobian
  — the standard discretization that keeps long nonlinear integrations
  stable without artificial dissipation.
* The streamfunction inversion is a spectral Poisson solve whose symbol
  matches the 5-point FD Laplacian exactly (njw_tpu.ops.spectral), so the
  spectral and stencil halves of the model are mutually consistent.

Prognostic state: zeta only (ny, nx). Everything else is diagnosed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from njw_tpu.ops.spectral import poisson_solve
from njw_tpu.utils.pytree import pytree_dataclass
from njw_tpu.weather.dynamics import d_dx, d_dy, diagnostics, laplacian
from njw_tpu.weather.grid import GridSpec, PhysicsParams


@pytree_dataclass
class BarotropicState:
    zeta: jnp.ndarray  # relative vorticity (ny, nx)


def _sh(f, dx_, dy_):
    """Shift helper: f[(j+dy_, i+dx_)] with periodic wrap (x minor axis)."""
    out = f
    if dx_:
        out = jnp.roll(out, -dx_, axis=-1)
    if dy_:
        out = jnp.roll(out, -dy_, axis=-2)
    return out


def arakawa_jacobian(p: jnp.ndarray, z: jnp.ndarray, dx: float, dy: float):
    """Arakawa's J = (J1 + J2 + J3)/3 on a periodic C-grid-free mesh.

    J(p, z) = dp/dx dz/dy - dp/dy dz/dx. Conserves energy and enstrophy in
    the semi-discrete limit (Arakawa 1966, J. Comput. Phys. 1:119).
    """
    pE, pW = _sh(p, 1, 0), _sh(p, -1, 0)
    pN, pS = _sh(p, 0, 1), _sh(p, 0, -1)
    pNE, pNW = _sh(p, 1, 1), _sh(p, -1, 1)
    pSE, pSW = _sh(p, 1, -1), _sh(p, -1, -1)
    zE, zW = _sh(z, 1, 0), _sh(z, -1, 0)
    zN, zS = _sh(z, 0, 1), _sh(z, 0, -1)
    zNE, zNW = _sh(z, 1, 1), _sh(z, -1, 1)
    zSE, zSW = _sh(z, 1, -1), _sh(z, -1, -1)

    j1 = (pE - pW) * (zN - zS) - (pN - pS) * (zE - zW)
    j2 = (
        pE * (zNE - zSE) - pW * (zNW - zSW)
        - pN * (zNE - zNW) + pS * (zSE - zSW)
    )
    j3 = (
        zN * (pNE - pNW) - zS * (pSE - pSW)
        - zE * (pNE - pSE) + zW * (pNW - pSW)
    )
    return (j1 + j2 + j3) / (12.0 * dx * dy)


def invert_vorticity(zeta: jnp.ndarray, grid: GridSpec) -> jnp.ndarray:
    """psi with Laplacian(psi) = zeta (periodic, zero-mean)."""
    return poisson_solve(zeta, grid.dx, grid.dy, kind="laplacian5")


def velocities(psi: jnp.ndarray, grid: GridSpec):
    u = -d_dy(psi, grid.dy, "periodic")
    v = d_dx(psi, grid.dx, "periodic")
    return u, v


def barotropic_tendencies(
    s, grid: GridSpec, params: PhysicsParams
):
    if grid.bc != "periodic":
        raise NotImplementedError("barotropic core requires periodic BC")
    zeta = s.zeta
    psi = invert_vorticity(zeta, grid)
    dzeta = -arakawa_jacobian(psi, zeta, grid.dx, grid.dy)
    beta = params.beta
    if not (isinstance(beta, (int, float)) and beta == 0.0):
        v = d_dx(psi, grid.dx, "periodic")
        dzeta = dzeta - beta * v
    nu = params.viscosity
    if not (isinstance(nu, (int, float)) and nu == 0.0):
        dzeta = dzeta + nu * laplacian(zeta, grid.dx, grid.dy, "periodic")
    return BarotropicState(zeta=dzeta)


def make_barotropic_sim(sim_cls, config, initial_condition: str, **ic_params):
    """Build a Simulation whose state is BarotropicState.

    The initial zeta is diagnosed from the named IC's velocity field
    (zeta = dv/dx - du/dy), so all nine reference ICs remain usable.
    """
    from njw_tpu.weather.ics import make_initial_state

    grid = config.grid_spec()
    params = config.physics()
    full0 = make_initial_state(
        initial_condition, grid, key=jax.random.key(config.random_seed),
        **ic_params,
    )
    zeta0 = diagnostics(full0, grid)["vorticity"]
    state0 = BarotropicState(zeta=zeta0)
    if config.integration_method == "semi_implicit":
        raise ValueError(
            "semi_implicit applies to models with fast gravity-wave "
            "modes (shallow_water, primitive); the barotropic vorticity "
            "equation has none — its CFL limit is already advective. "
            "Use rk4/rk2/adams_bashforth.")

    tendency = lambda s: barotropic_tendencies(s, grid, params)

    # backend selection: fused Arakawa-Jacobian stage kernel when eligible
    # (mirrors the SWE/PE selection; FFT inversion stays in XLA)
    stepper_factory = None
    if config.backend in ("auto", "pallas") \
            and config.integration_method == "rk4":
        from njw_tpu.ops.baro_stencil import (
            baro_pallas_supported, make_baro_pallas_rk4_stepper,
        )

        if baro_pallas_supported(grid, params):
            on_tpu = jax.devices()[0].platform == "tpu"
            if on_tpu or config.backend == "pallas":
                stepper_factory = lambda _t: make_baro_pallas_rk4_stepper(
                    grid, params, config.dt, interpret=not on_tpu)

    def output_fn(s):
        psi = invert_vorticity(s.zeta, grid)
        u, v = velocities(psi, grid)
        return {"zeta": s.zeta, "psi": psi, "u": u, "v": v}

    sim = sim_cls(
        state0, tendency, dt=config.dt, method=config.integration_method,
        grid=grid, stepper_factory=stepper_factory, output_fn=output_fn,
    )
    sim.config = config
    return sim
