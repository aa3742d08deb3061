"""Primitive-equations dynamical core (multi-level, sigma coordinates).

Real implementation of SimulationModel::PrimitiveEquations — the reference
declares it and falls back to shallow water
(ref: weather_simulation.cpp:552-560); BASELINE mandates the real core
(configs 4-5: 512^2 x 20 and 2048^2 x 40 multi-host).

Hydrostatic primitive equations on an f-plane in sigma = p/ps coordinates,
flat lower boundary, L equally spaced full levels sigma_k = (k+1/2)/L
(k=0 at the model top):

  continuity   dps/dt = -sum_k div(ps u_k) dsig
  sigma-dot    (sigdot ps)_{k+1/2} = -sig_{k+1/2} dps/dt
                                     - sum_{j<=k} div(ps u_j) dsig
  momentum     du/dt = -u u_x - v u_y - sigdot du/dsig + f v
                       - dPhi/dx - R T dlnps/dx          (v analogous)
  thermo       dT/dt = -u.grad(T) - sigdot dT/dsig
                       + kappa T * (sigdot/sigma + D lnps/Dt)
  moisture     dq/dt = -u.grad(q) - sigdot dq/dsig
  hydrostatic  Phi_k = Phi_{k+1} + R (T_k + T_{k+1})/2 ln(sig_{k+1}/sig_k),
               Phi_{L-1} = R T_{L-1} ln(1/sig_{L-1})

Discretization: same central differences as the SWE core horizontally
(shift-accessor parameterized, so the whole-domain, sharded-halo, and
Pallas paths share this function); vertical advection in flux-like
interface form with sigdot = 0 at sigma = 0, 1 (exact by construction).

State shapes: u, v, T, q are (L, ny, nx); ps is (ny, nx).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from njw_tpu.utils.pytree import pytree_dataclass
from njw_tpu.weather.grid import GridSpec, PhysicsParams

R_DRY = 287.04      # J / (kg K)
CP_DRY = 1004.64    # J / (kg K)
KAPPA = R_DRY / CP_DRY


@pytree_dataclass
class PEState:
    u: jnp.ndarray   # (L, ny, nx)
    v: jnp.ndarray
    T: jnp.ndarray
    q: jnp.ndarray
    ps: jnp.ndarray  # (ny, nx)


def sigma_levels(L: int):
    """Full levels (k+1/2)/L (k=0 = top) and interface levels k/L."""
    full = (jnp.arange(L, dtype=jnp.float32) + 0.5) / L
    half = jnp.arange(L + 1, dtype=jnp.float32) / L
    return full, half


def hydrostatic_geopotential(T: jnp.ndarray, L: int,
                             phi_s=None) -> jnp.ndarray:
    """Phi at full levels from the hydrostatic integral.

    Integrates upward from the bottom level L-1; phi_s is the surface
    geopotential (orography x gravity), 0 for a flat lower boundary.
    """
    sig, _ = sigma_levels(L)
    # bottom: Phi_{L-1} = phi_s + R T_{L-1} ln(1 / sig_{L-1})
    ln_ratio = jnp.log(sig[1:] / sig[:-1])  # (L-1,) ln(sig_{k+1}/sig_k)
    phi_bot = R_DRY * T[-1] * (-jnp.log(sig[-1]))
    if phi_s is not None:
        phi_bot = phi_bot + phi_s
    # layer thicknesses, k from bottom-1 up: R (T_k + T_{k+1})/2 ln(...)
    thick = R_DRY * 0.5 * (T[:-1] + T[1:]) * ln_ratio[:, None, None]
    # Phi_k = Phi_{k+1} + thick_k ; cumulative from the bottom
    below = jnp.cumsum(thick[::-1], axis=0)[::-1]  # sum of thick_j for j >= k
    phi = jnp.concatenate([phi_bot[None] + below, phi_bot[None]], axis=0)
    return phi


def pe_tendencies_from_shifts(
    s: PEState, shift: Callable, grid: GridSpec, params: PhysicsParams,
    interior: Optional[Callable] = None, phi_s=None,
) -> PEState:
    """PE tendencies given a neighbor-shift accessor (shared by the global
    and sharded paths; shift must broadcast over the leading level axis).
    phi_s: optional surface geopotential PADDED like the state fields
    (terrain lower boundary; enters the hydrostatic integral only)."""
    crop = interior if interior is not None else (lambda f: f)
    L = s.u.shape[0]
    dsig = 1.0 / L
    sig, sig_half = sigma_levels(L)
    cx = 0.5 / grid.dx
    cy = 0.5 / grid.dy
    f = params.coriolis_f

    def ddx(a):
        return (shift(a, 1, 0) - shift(a, -1, 0)) * cx

    def ddy(a):
        return (shift(a, 0, 1) - shift(a, 0, -1)) * cy

    u, v, T, q, ps = s.u, s.v, s.T, s.q, s.ps
    uc, vc, Tc, qc = crop(u), crop(v), crop(T), crop(q)
    psc = crop(ps)
    lnps = jnp.log(ps)

    # --- continuity & sigma-dot ---------------------------------------
    # div(ps u_k) with product-rule central differences
    flux_div = ddx(ps * u) + ddy(ps * v)            # (L, ly, lx)
    dps = -jnp.sum(flux_div, axis=0) * dsig          # (ly, lx)
    cum = jnp.cumsum(flux_div, axis=0) * dsig        # sum_{j<=k}
    # interfaces 1..L-1 (0 at top and bottom by construction)
    sdot_ps_int = -sig_half[1:-1, None, None] * dps[None] - cum[:-1]
    sdot_int = sdot_ps_int / psc[None]               # (L-1, ly, lx)
    zeros = jnp.zeros_like(sdot_int[:1])
    sdot_half = jnp.concatenate([zeros, sdot_int, zeros], axis=0)  # (L+1,...)

    # --- vertical advection (interface form) --------------------------
    def vadv(X):
        dX = X[1:] - X[:-1]                          # between levels k,k+1
        upper = sdot_half[1:-1] * dX                 # interface k+1/2 term
        pad = jnp.zeros_like(X[:1])
        # (sigdot dX/dsig)_k ~ [sd_{k+1/2}(X_{k+1}-X_k)
        #                      + sd_{k-1/2}(X_k-X_{k-1})] / (2 dsig)
        return (
            jnp.concatenate([upper, pad], axis=0)
            + jnp.concatenate([pad, upper], axis=0)
        ) * (0.5 / dsig)

    # --- geopotential & pressure-gradient force -----------------------
    phi = hydrostatic_geopotential(T, L, phi_s=phi_s)
    phi_x, phi_y = ddx(phi), ddy(phi)
    lnps_x, lnps_y = ddx(lnps), ddy(lnps)

    # --- momentum ------------------------------------------------------
    du = (
        -uc * ddx(u) - vc * ddy(u) - vadv(uc)
        + f * vc - phi_x - R_DRY * Tc * lnps_x
    )
    dv = (
        -uc * ddx(v) - vc * ddy(v) - vadv(vc)
        - f * uc - phi_y - R_DRY * Tc * lnps_y
    )

    # --- thermodynamic -------------------------------------------------
    # D lnps/Dt = dps/dt / ps + u . grad(lnps); omega/p = sigdot/sig + that
    # per-level: the advective part u_k . grad(lnps) depends on the level
    dlnps_adv = dps[None] / psc[None] + uc * lnps_x + vc * lnps_y
    sdot_full = 0.5 * (sdot_half[:-1] + sdot_half[1:])
    omega_over_p = sdot_full / sig[:, None, None] + dlnps_adv
    dT = -uc * ddx(T) - vc * ddy(T) - vadv(Tc) + KAPPA * Tc * omega_over_p

    # --- moisture ------------------------------------------------------
    dq = -uc * ddx(q) - vc * ddy(q) - vadv(qc)

    nu = params.viscosity
    if not (isinstance(nu, (int, float)) and nu == 0.0):
        idx2, idy2 = 1.0 / grid.dx ** 2, 1.0 / grid.dy ** 2
        def lap(a, ac):
            return (shift(a, 1, 0) - 2 * ac + shift(a, -1, 0)) * idx2 + (
                shift(a, 0, 1) - 2 * ac + shift(a, 0, -1)) * idy2
        du = du + nu * lap(u, uc)
        dv = dv + nu * lap(v, vc)
        dT = dT + nu * lap(T, Tc)

    return PEState(u=du, v=dv, T=dT, q=dq, ps=dps)


def pe_tendencies(s: PEState, grid: GridSpec, params: PhysicsParams,
                  phi_s=None) -> PEState:
    """Whole-domain PE tendencies; phi_s = surface geopotential field
    (ny, nx) for a terrain lower boundary (None = flat)."""
    from njw_tpu.weather.dynamics import pad_and_shift

    pad, shift, crop = pad_and_shift(grid.bc, grid.ny, grid.nx)
    up, vp = pad(s.u), pad(s.v)
    if grid.bc == "reflective":
        # no-flux walls: the wall-NORMAL velocity ghost flips sign (u at
        # the x walls, v at the y walls), same rule as the SWE core
        # (dynamics.swe_tendencies; ref BC enum weather_sim.hpp:40-45,
        # edge behavior weather_simulation.cpp:509-513). Scalars (T, q,
        # ps) keep the symmetric/clamped ghost from pad_and_shift.
        up = up.at[..., :, 0].multiply(-1.0).at[..., :, -1].multiply(-1.0)
        vp = vp.at[..., 0, :].multiply(-1.0).at[..., -1, :].multiply(-1.0)
    padded = PEState(u=up, v=vp, T=pad(s.T), q=pad(s.q), ps=pad(s.ps))
    phi_sp = pad(jnp.asarray(phi_s, jnp.float32)) if phi_s is not None \
        else None
    return pe_tendencies_from_shifts(padded, shift, grid, params,
                                     interior=crop, phi_s=phi_sp)


def pe_initial_state(
    grid: GridSpec, *, T0: float = 288.15, ps0: float = 1013.25,
    u_jet: float = 10.0, lapse: float = 50.0, deltaT_y: float = 20.0,
    perturb: float = 0.0, seed: int = 0, phi_s=None,
) -> PEState:
    """Baroclinic-jet style IC: zonal jet at mid-latitude with a
    thermally consistent meridional T gradient, optional random ps
    perturbation. T increases downward with `lapse` K across the column."""
    L = grid.levels
    ny, nx = grid.ny, grid.nx
    sig, _ = sigma_levels(L)
    y = jnp.arange(ny, dtype=jnp.float32)[:, None] / max(ny - 1, 1)
    yx = jnp.broadcast_to(y, (ny, nx))

    # zonal jet: gaussian in latitude, stronger aloft
    jet_profile = jnp.exp(-((yx - 0.5) ** 2) / 0.02)
    height_factor = (1.0 - sig)[:, None, None]
    u = (u_jet * jet_profile[None] * (0.5 + height_factor)).astype(jnp.float32)
    v = jnp.zeros_like(u)

    # temperature: warm equator/cold pole + vertical lapse
    T = (
        T0 - deltaT_y * (yx - 0.5)[None] + lapse * (sig[:, None, None] - 0.5)
    ).astype(jnp.float32)
    q = (0.01 * (1.0 - yx)[None] * sig[:, None, None]).astype(jnp.float32)

    ps = jnp.full((ny, nx), ps0, jnp.float32)
    if phi_s is not None:
        # hydrostatic surface-pressure reduction over terrain: with the
        # column-mean T ~ T0 this balances the discrete PGF exactly for
        # a resting isothermal atmosphere (see TestPETerrain)
        ps = ps * jnp.exp(-jnp.asarray(phi_s, jnp.float32)
                          / (R_DRY * T0))
    if perturb:
        key = jax.random.key(seed)
        ps = ps + perturb * jax.random.normal(key, (ny, nx), jnp.float32)
    return PEState(u=u, v=v, T=T, q=q, ps=ps)


def make_primitive_sim(sim_cls, config, initial_condition: str = "baroclinic",
                       orography=None, **ic_params):
    """Build a Simulation whose state is PEState. initial_condition:
    'baroclinic' (default, parameterized) or 'resting' (steady-state).
    orography: optional (ny, nx) surface GEOPOTENTIAL (m^2/s^2 = height x
    gravity); terrain runs on the XLA path (the fused kernel falls back).
    """
    grid = config.grid_spec()
    params = config.physics()
    phi_s = None if orography is None \
        else jnp.asarray(orography, jnp.float32)
    if phi_s is not None:
        ic_params = dict(ic_params)
        ic_params.setdefault("phi_s", phi_s)
    if initial_condition in ("baroclinic", "default", "uniform", "resting"):
        if initial_condition == "resting":
            ic_params = dict(ic_params)
            ic_params.setdefault("u_jet", 0.0)
            ic_params.setdefault("lapse", 0.0)
            ic_params.setdefault("deltaT_y", 0.0)
        state0 = pe_initial_state(grid, **ic_params)
    else:
        raise ValueError(
            f"unknown PE initial condition {initial_condition!r} "
            "(use 'baroclinic' or 'resting')"
        )
    tendency = lambda s: pe_tendencies(s, grid, params, phi_s=phi_s)

    # backend selection: fused Pallas PE stage kernel when eligible
    # (mirrors the SWE selection; terrain rides in-kernel since r3 —
    # phi_s feeds the hydrostatic bottom boundary with ps-like halos)
    stepper_factory = None
    if config.integration_method == "semi_implicit":
        from njw_tpu.weather.semi_implicit import semi_implicit_pe

        stepper_factory = lambda t: semi_implicit_pe(
            t, grid=grid, params=params,
            order=getattr(config, "si_order", 1))
    if config.backend in ("auto", "pallas") \
            and config.integration_method == "rk4":
        from njw_tpu.ops.pe_stencil import (
            make_pe_pallas_rk4_stepper, pe_pallas_supported,
        )

        if pe_pallas_supported(grid, params):
            import jax

            on_tpu = jax.devices()[0].platform == "tpu"
            if on_tpu or config.backend == "pallas":
                stepper_factory = lambda _t: make_pe_pallas_rk4_stepper(
                    grid, params, config.dt, interpret=not on_tpu,
                    phi_s=phi_s)

    def output_fn(s):
        return {"u": s.u, "v": s.v, "T": s.T, "q": s.q, "ps": s.ps}

    sim = sim_cls(
        state0, tendency, dt=config.dt, method=config.integration_method,
        grid=grid, stepper_factory=stepper_factory, output_fn=output_fn,
    )
    sim.config = config
    return sim
