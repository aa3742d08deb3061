"""Semi-implicit (Crank-Nicolson gravity wave) integrators: SWE and PE.

Real implementation of the method the reference declares and silently maps
to Euler (ref: weather_simulation.cpp:465-471; declared for ALL models at
weather_sim.hpp:50-56, implemented for none). The stiff linearized
gravity-wave terms are treated implicitly with a trapezoidal step and
eliminated to a single spectral Helmholtz solve — scalar for SWE, one
solve per vertical normal mode for the primitive equations. This lifts the
CFL limit from the fast gravity-wave speed (sqrt(g H); ~sqrt(R T) for PE
Lamb/external modes) to the advective speed — the standard trick in
operational NWP dynamical cores.

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
    tendency, *, grid: GridSpec, params: PhysicsParams, order: int = 1
) -> Stepper:
    """order=2 (opt-in, r5): two-time-level predictor-corrector — a CN
    half-step predicts the midpoint, the corrector evaluates the
    nonlinear terms THERE (implicit-midpoint splitting). Measured
    (BENCH_NOTES r5): halves the slow-field error at moderate dt
    (PE T-error 0.12 -> 0.09 at dt=240) but does NOT pay at the large
    dt where semi-implicit earns its keep (dt=900: 0.26 -> 0.36, and
    2x nonlinear evaluations/step) — wave-phase distortion, intrinsic
    to implicit wave treatment at omega*dt >~ 1, dominates there
    regardless of splitting order. Default stays order=1."""
    if grid.bc != "periodic":
        raise NotImplementedError(
            "semi-implicit integrator requires periodic boundaries "
            "(spectral Helmholtz solve)"
        )
    if order not in (1, 2):
        raise ValueError(f"order must be 1 or 2, got {order}")
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

    def nonlin(s: WeatherState) -> WeatherState:
        return jax.tree.map(lambda tf, lf: tf - lf, tendency(s), linear(s))

    def advance(s: WeatherState, n_val: WeatherState, dt_eff):
        """CN over dt_eff: (I - a L) s' = s + dt_eff*N + a*L s."""
        a = 0.5 * dt_eff
        s_star = _axpy(a, linear(s), _axpy(dt_eff, n_val, s))

        u_hat = jnp.fft.fft2(s_star.u)
        v_hat = jnp.fft.fft2(s_star.v)
        h_hat = jnp.fft.fft2(s_star.h)

        denom = 1.0 + (a * a) * g * H * k2
        h_new_hat = (h_hat - a * H * 1j * (kx * u_hat + ky * v_hat)) / denom
        u_new_hat = u_hat - a * g * 1j * kx * h_new_hat
        v_new_hat = v_hat - a * g * 1j * ky * h_new_hat

        dtype = s.u.dtype
        return WeatherState(
            u=jnp.real(jnp.fft.ifft2(u_new_hat)).astype(dtype),
            v=jnp.real(jnp.fft.ifft2(v_new_hat)).astype(dtype),
            h=jnp.real(jnp.fft.ifft2(h_new_hat)).astype(dtype),
        )

    def step(carry, s: WeatherState, dt):
        n0 = nonlin(s)
        if order == 1:
            return carry, advance(s, n0, dt)
        s_mid = advance(s, n0, 0.5 * dt)
        return carry, advance(s, nonlin(s_mid), dt)

    return Stepper(lambda s: (), step, "semi_implicit", 2)


# ---------------------------------------------------------------------------
# Primitive equations: vertical-normal-mode Helmholtz solve.
#
# Linearize the hydrostatic PE about a resting isothermal reference state
# (T_r const, ps_r const, u = v = 0). The fast (gravity/Lamb wave) terms are
#
#   du/dt = -d/dx (G T + c ps)          c = R T_r / ps_r   (lnps linearized)
#   dv/dt = -d/dy (G T + c ps)
#   dT/dt = kappa T_r M D               D_k = div(u_k)
#   dps/dt = -ps_r dsig 1^T D
#
# where G (L x L) is the discrete hydrostatic-integral matrix (Phi' = G T')
# and M (L x L) the linearized omega/p response to divergence. Both are
# extracted NUMERICALLY from the exact code paths in
# njw_tpu.weather.primitive by applying them to unit vectors, so the
# implicit operator matches the explicit FD tendencies to rounding.
#
# Trapezoidal elimination to the divergence (a = dt/2, spectral space,
# FD-consistent modified wavenumbers; hats = fft2):
#
#   (I - a^2 k^2 A) D' = D* + a k^2 (G T* + c ps* 1),
#   A = kappa T_r G M - R T_r dsig 1 1^T
#
# A's eigenvalues are -g x (equivalent depths) < 0 — the PE analog of the
# SWE -gH — so (1 - a^2 k^2 lambda) never vanishes. A = V diag(lam) V^-1 is
# eigendecomposed once at setup (numpy, L <= ~40), making the solve L
# small matmuls per step: project to mode space, divide, project back.
# ---------------------------------------------------------------------------


def _pe_vertical_matrices(L: int, t_ref: float, ps_ref: float):
    """G, M, and the coupling matrix A = kappa T_r G M - R T_r dsig 11^T,
    extracted from the primitive-core code paths applied to unit vectors."""
    import numpy as np

    from njw_tpu.weather.primitive import (
        KAPPA, R_DRY, hydrostatic_geopotential, sigma_levels,
    )

    sig, sig_half = (np.asarray(a, np.float64) for a in sigma_levels(L))
    dsig = 1.0 / L

    # G: Phi' = G T' (apply the exact hydrostatic integral to unit columns)
    G = np.zeros((L, L))
    for j in range(L):
        e = np.zeros((L, 1, 1), np.float32)
        e[j] = 1.0
        G[:, j] = np.asarray(hydrostatic_geopotential(jnp.asarray(e), L))[
            :, 0, 0]

    # M: dT' = kappa T_r (M D) — linearized sigma-dot / omega-over-p
    # response, following pe_tendencies_from_shifts lines exactly with
    # ps = ps_r, flux_div_j = ps_r D_j.
    M = np.zeros((L, L))
    for j in range(L):
        D = np.zeros(L)
        D[j] = 1.0
        dps = -ps_ref * dsig * D.sum()                   # scalar
        cum = np.cumsum(ps_ref * D) * dsig               # (L,)
        sdot_int = (-sig_half[1:-1] * dps - cum[:-1]) / ps_ref   # (L-1,)
        sdot_half = np.concatenate([[0.0], sdot_int, [0.0]])
        sdot_full = 0.5 * (sdot_half[:-1] + sdot_half[1:])
        dlnps = dps / ps_ref
        M[:, j] = sdot_full / sig + dlnps

    ones = np.ones((L, L))
    A = KAPPA * t_ref * (G @ M) - R_DRY * t_ref * dsig * ones
    lam, V = np.linalg.eig(A)
    if np.abs(lam.imag).max() > 1e-8 * np.abs(lam.real).max():
        raise ValueError("PE vertical structure matrix has complex modes")
    lam, V = lam.real, V.real
    if lam.max() >= 0:
        raise ValueError(
            "PE vertical structure matrix must be negative definite "
            f"(got max eigenvalue {lam.max():.3g}); the isothermal "
            "reference state should always satisfy this")
    return G, M, V, np.linalg.inv(V), lam


def semi_implicit_pe(
    tendency, *, grid: GridSpec, params: PhysicsParams,
    t_ref: float = 300.0, ps_ref: float = 1013.25, order: int = 1,
) -> Stepper:
    """Semi-implicit stepper for the primitive-equations core.

    tendency: the FULL nonlinear PE tendency (terrain etc. included — any
    time-independent forcing lands in the explicit part automatically).
    t_ref/ps_ref: isothermal reference state; a t_ref >= the domain max
    temperature is the standard stable choice (ref declares the method at
    weather_sim.hpp:50-56 and falls back to Euler at
    weather_simulation.cpp:465-471 — this implements it for real, for the
    model family the reference doesn't even integrate).
    """
    import numpy as np

    from njw_tpu.weather.primitive import KAPPA, R_DRY, PEState

    if grid.bc != "periodic":
        raise NotImplementedError(
            "semi-implicit PE requires periodic boundaries "
            "(spectral Helmholtz solve)")
    L = grid.levels
    dsig = 1.0 / L
    c_ps = R_DRY * t_ref / ps_ref

    G, M, V, Vinv, lam = _pe_vertical_matrices(L, t_ref, ps_ref)
    Gj = jnp.asarray(G, jnp.float32)
    Mj = jnp.asarray(M, jnp.float32)
    Vj = jnp.asarray(V, jnp.float32)
    Vinvj = jnp.asarray(Vinv, jnp.float32)
    lamj = jnp.asarray(lam, jnp.float32)

    # Real f32 device constants ONLY at setup: on the axon TPU backend a
    # complex buffer at the runtime layer (eager astype/device_put) wedges
    # the session (CLAUDE.md). The 1j products are formed INSIDE the
    # traced step functions, where complex is supported.
    kx = fd_wavenumbers(grid.nx, grid.dx, "central")[None, :]
    ky = fd_wavenumbers(grid.ny, grid.dy, "central")[:, None]
    k2 = kx * kx + ky * ky                      # (ny, nx)

    def vmat(A, f):                             # (L,L) x (L,ny,nx)
        return jnp.einsum("kl,lyx->kyx", A, f)

    def linear(s: PEState) -> PEState:
        """Grid-space linear operator (central FD — matches the spectral
        solve exactly through the modified wavenumbers)."""
        from njw_tpu.weather.dynamics import d_dx, d_dy

        ddx = lambda f: d_dx(f, grid.dx, "periodic")
        ddy = lambda f: d_dy(f, grid.dy, "periodic")
        P = vmat(Gj, s.T) + c_ps * s.ps[None]
        D = ddx(s.u) + ddy(s.v)
        return PEState(
            u=-ddx(P), v=-ddy(P),
            T=KAPPA * t_ref * vmat(Mj, D),
            q=jnp.zeros_like(s.q),
            ps=-ps_ref * dsig * jnp.sum(D, axis=0),
        )

    def nonlin(s: PEState) -> PEState:
        return jax.tree.map(lambda tf, lf: tf - lf, tendency(s), linear(s))

    def advance(s: PEState, n_val: PEState, dt_eff):
        """CN over dt_eff: (I - a L) s' = s + dt_eff*N + a*L s."""
        a = 0.5 * dt_eff
        s_star = _axpy(a, linear(s), _axpy(dt_eff, n_val, s))

        u_h = jnp.fft.fft2(s_star.u)
        v_h = jnp.fft.fft2(s_star.v)
        T_h = jnp.fft.fft2(s_star.T)
        ps_h = jnp.fft.fft2(s_star.ps)

        ikx = 1j * kx          # complex formed inside the traced fn only
        iky = 1j * ky
        D_h = ikx * u_h + iky * v_h
        rhs = D_h + (a * k2) * (vmat(Gj, T_h) + c_ps * ps_h[None])
        # mode space: divide each vertical mode by its Helmholtz symbol
        r = vmat(Vinvj, rhs)
        r = r / (1.0 - (a * a) * k2[None] * lamj[:, None, None])
        D_new = vmat(Vj, r)

        T_new = T_h + (a * KAPPA * t_ref) * vmat(Mj, D_new)
        ps_new = ps_h - (a * ps_ref * dsig) * jnp.sum(D_new, axis=0)
        P_new = vmat(Gj, T_new) + c_ps * ps_new[None]
        u_new = u_h - a * (ikx * P_new)
        v_new = v_h - a * (iky * P_new)

        dtype = s.u.dtype
        inv = lambda f: jnp.real(jnp.fft.ifft2(f)).astype(dtype)
        return PEState(u=inv(u_new), v=inv(v_new), T=inv(T_new),
                       q=s_star.q, ps=inv(ps_new))

    def step(carry, s: PEState, dt):
        n0 = nonlin(s)
        if order == 1:
            return carry, advance(s, n0, dt)
        # two-time-level predictor-corrector (r5, opt-in): nonlinear
        # terms at the CN-predicted midpoint (see semi_implicit_swe)
        s_mid = advance(s, n0, 0.5 * dt)
        return carry, advance(s, nonlin(s_mid), dt)

    return Stepper(lambda s: (), step, "semi_implicit", 2)
