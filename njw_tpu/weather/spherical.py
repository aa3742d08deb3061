"""Global spectral dynamical cores on the sphere (spherical harmonics).

The reference's public enum declares ``GridType::SphericalHarmonic`` but
every simulation falls back to the Cartesian grid (ref:
weather_sim.hpp:61-66 declared only; weather_simulation.cpp:542-549 model
fallback). This module implements the capability for real — the classic
spectral transform method (Bourke 1972; Hack & Jakob 1992 describe the
canonical formulation) with two cores:

* **Barotropic vorticity equation (BVE)** — prognostic spectral relative
  vorticity; exact Rossby-Haurwitz rotation is a test invariant.
* **Spherical shallow water** — vorticity-divergence-geopotential form
  (the vector-invariant momentum equation), validated against Williamson
  et al. (1992) test case 2 (steady geostrophic flow).

TPU-first by construction: all runtime work is rfft + batched matmuls
over latitude (njw_tpu.ops.sht) — MXU-shaped, static, gather-free. The
nonlinear products are formed on the Gaussian grid (transform method) so
the quadratic terms are alias-free at T = (2*nlat - 1)/3.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from njw_tpu.ops.sht import SphericalHarmonicTransform
from njw_tpu.utils.pytree import pytree_dataclass

EARTH_RADIUS = 6.371e6       # m
EARTH_OMEGA = 7.292e-5       # rad/s


@pytree_dataclass
class SphericalBarotropicState:
    zeta: jnp.ndarray  # packed spectral relative vorticity (T+1, T+2) complex


@pytree_dataclass
class SphericalSWEState:
    zeta: jnp.ndarray  # spectral relative vorticity
    div: jnp.ndarray   # spectral divergence
    phi: jnp.ndarray   # spectral geopotential g*h


def pack_state(s):
    """Complex spectral pytree -> (2, ...) float pairs.

    Complex buffers must never cross the runtime layer on remote TPU
    backends (a complex transfer/eager op wedges the axon session —
    measured r3); states are packed at jit boundaries and viewed as
    complex only inside compiled programs. Packing is a linear bijection,
    so explicit RK steps on packed states equal RK on complex states."""
    return jax.tree.map(
        lambda a: jnp.stack([jnp.real(a), jnp.imag(a)]), s)


def unpack_state(p):
    """Inverse of pack_state (call inside jit only on TPU)."""
    return jax.tree.map(lambda a: a[0] + 1j * a[1], p)


def coriolis_spectral(sht: SphericalHarmonicTransform, omega: float):
    """f = 2 Omega mu is proportional to Y_1^0: exact spectral coefficient."""
    # mu = Pbar_1^0 / sqrt(3) under this normalization
    a = jnp.zeros(sht.spec_shape, sht.cdtype)
    return a.at[0, 1].set(2.0 * omega / np.sqrt(3.0))


def bve_tendencies(s: SphericalBarotropicState,
                   sht: SphericalHarmonicTransform,
                   omega: float, nu4: float = 0.0):
    """d zeta / dt = -div((zeta + f) V) for nondivergent V from psi.

    Fused formulation (r3): every quantity contracting against the same
    Legendre table goes through ONE stacked einsum — at T341 the tables
    are ~240 MB each and the tendency is bandwidth-bound on reading them.
    """
    zeta = s.zeta
    psi = sht.inverse_laplacian(zeta)
    inv_a = 1.0 / sht.radius

    Fp = sht.syn_stack(jnp.stack([sht.d_dlon(psi), zeta]), "P")
    Fh = sht.syn_stack(psi[None], "H")
    FU = -Fh[0] * inv_a                      # chi = 0 for the BVE
    FV = Fp[0] * inv_a
    G = sht._to_grid(jnp.stack([FU, FV, Fp[1]]))
    U, V, zeta_g = G[0], G[1], G[2]

    eta = zeta_g + 2.0 * omega * sht.grid_of_mu()
    F = sht._fourier(jnp.stack([U * eta, V * eta]))
    im = sht._im[None, :]
    Dp = sht.anal_stack((F[0] * im)[None], "Pw_over_c2")
    Dh = sht.anal_stack(F[1][None], "Hw_over_c2")
    div1 = jnp.where(sht._valid, (Dp[0] - Dh[0]) * inv_a, 0.0) \
        .astype(sht.cdtype)
    dzeta = -div1
    if nu4:
        dzeta = dzeta - nu4 * (sht._lap ** 2) * zeta
    return SphericalBarotropicState(zeta=dzeta)


def swe_tendencies(s: SphericalSWEState, sht: SphericalHarmonicTransform,
                   omega: float, nu4: float = 0.0):
    """Vector-invariant spherical shallow water (Williamson et al. 1992):

        d zeta/dt = -div(eta V)
        d div /dt =  curl(eta V) - Lap(Phi + (u^2+v^2)/2)
        d Phi /dt = -div(Phi V)

    with eta = zeta + f, Phi = g h (flat bottom). All products on the grid.

    Fused formulation (r3): one stacked einsum per Legendre table per
    tendency (5 table reads instead of 15) — at T341 the tables are
    ~240 MB each and this loop is bandwidth-bound on reading them — and
    one batched rfft/irfft each way.
    """
    psi = sht.inverse_laplacian(s.zeta)
    chi = sht.inverse_laplacian(s.div)
    inv_a = 1.0 / sht.radius

    # spectral -> grid: _P once (q=4), _H once (q=2), one batched irfft
    Fp = sht.syn_stack(
        jnp.stack([sht.d_dlon(chi), sht.d_dlon(psi), s.zeta, s.phi]), "P")
    Fh = sht.syn_stack(jnp.stack([psi, chi]), "H")
    FU = (Fp[0] - Fh[0]) * inv_a
    FV = (Fp[1] + Fh[1]) * inv_a
    G = sht._to_grid(jnp.stack([FU, FV, Fp[2], Fp[3]]))
    U, V, zeta_g, phi_g = G[0], G[1], G[2], G[3]

    eta = zeta_g + 2.0 * omega * sht.grid_of_mu()
    inv_c2 = 1.0 / sht.cos_lat() ** 2
    energy = 0.5 * (U * U + V * V) * inv_c2

    # grid -> spectral: one batched rfft (q=5), then _Pw_over_c2 once
    # (q=3), _Hw_over_c2 once (q=3), _Pw once (q=1)
    F = sht._fourier(jnp.stack([U * eta, V * eta,
                                U * phi_g, V * phi_g, energy]))
    im = sht._im[None, :]
    Dp = sht.anal_stack(jnp.stack([F[0] * im, F[1] * im, F[2] * im]),
                        "Pw_over_c2")
    Dh = sht.anal_stack(jnp.stack([F[1], F[0], F[3]]), "Hw_over_c2")
    e_spec = sht.anal_stack(F[4][None], "Pw")[0]

    mask = sht._valid
    cd = sht.cdtype
    div_eta = jnp.where(mask, (Dp[0] - Dh[0]) * inv_a, 0.0).astype(cd)
    curl_eta = jnp.where(mask, (Dp[1] + Dh[1]) * inv_a, 0.0).astype(cd)
    div_phi = jnp.where(mask, (Dp[2] - Dh[2]) * inv_a, 0.0).astype(cd)
    e_spec = jnp.where(mask, e_spec, 0.0).astype(cd)

    dzeta = -div_eta
    ddiv = curl_eta - sht.laplacian(s.phi + e_spec)
    dphi = -div_phi
    if nu4:
        damp = nu4 * (sht._lap ** 2)
        dzeta = dzeta - damp * s.zeta
        ddiv = ddiv - damp * s.div
        dphi = dphi - damp * s.phi
    return SphericalSWEState(zeta=dzeta, div=ddiv, phi=dphi)


# -- initial conditions ------------------------------------------------------

def rossby_haurwitz_bve(sht, m: int = 4, n: int = 5,
                        amplitude: float = 8.0e-5):
    """Single-harmonic Rossby-Haurwitz vorticity: an EXACT solution of the
    nonlinear BVE that retrogresses at angular rate -2*Omega/(n*(n+1))."""
    return SphericalBarotropicState(
        zeta=sht.spectral_mode(m, n, amplitude))


def williamson2_state(sht, omega: float, *, u0: float = 2.0 * np.pi
                      * EARTH_RADIUS / (12.0 * 86400.0),
                      gh0: float = 2.94e4):
    """Williamson et al. (1992) TC2: steady zonal geostrophic flow.

    u = u0 cos(lat), v = 0, gh = gh0 - (a*Omega*u0 + u0^2/2) sin^2(lat);
    zeta = (2 u0 / a) sin(lat), div = 0. Exact steady state of the SWE.
    """
    a = sht.radius
    mu = sht.grid_of_mu()
    zeta_g = (2.0 * u0 / a) * mu
    phi_g = gh0 - (a * omega * u0 + 0.5 * u0 * u0) * mu * mu
    return SphericalSWEState(
        zeta=sht.analysis(zeta_g),
        div=jnp.zeros(sht.spec_shape, sht.cdtype),
        phi=sht.analysis(phi_g),
    )


def rossby_haurwitz_swe(sht, omega: float, *, R: int = 4,
                        K: float = 7.848e-6, gh0: float = 9.80616 * 8000.0):
    """Williamson TC6: the full wavenumber-4 Rossby-Haurwitz SWE state.

    Vorticity/height fields per Williamson et al. (1992) eqs 141-149.
    """
    a = sht.radius
    mu = np.asarray(sht.mu)
    lat = np.arcsin(mu)
    lon = np.asarray(sht.lons)
    coslat = np.cos(lat)[:, None]
    lam = lon[None, :]
    w = K  # same rotational amplitude for the zonal part

    # streamfunction psi = -a^2 w mu + a^2 K coslat^R mu cos(R lam)
    # -> vorticity zeta = 2 w mu - K mu coslat^R (R^2 + 3R + 2) cos(R lam)
    zeta_g = (2.0 * w * mu[:, None]
              - K * mu[:, None] * coslat ** R
              * (R * R + 3.0 * R + 2.0) * np.cos(R * lam))

    # geopotential: gh = gh0 + a^2 [A(lat) + B(lat) cos(R lam)
    #                               + C(lat) cos(2 R lam)]
    c2 = coslat ** 2
    A = (w / 2.0 * (2.0 * omega + w) * c2
         + 0.25 * K * K * coslat ** (2 * R)
         * ((R + 1.0) * c2 + (2.0 * R * R - R - 2.0)
            - 2.0 * R * R / np.maximum(c2, 1e-12)))
    B = (2.0 * (omega + w) * K / ((R + 1.0) * (R + 2.0)) * coslat ** R
         * ((R * R + 2.0 * R + 2.0) - (R + 1.0) ** 2 * c2))
    C = 0.25 * K * K * coslat ** (2 * R) * ((R + 1.0) * c2 - (R + 2.0))
    phi_g = gh0 + a * a * (A + B * np.cos(R * lam) + C * np.cos(2 * R * lam))

    return SphericalSWEState(
        zeta=sht.analysis(jnp.asarray(zeta_g, sht.dtype)),
        div=jnp.zeros(sht.spec_shape, sht.cdtype),
        phi=sht.analysis(jnp.asarray(phi_g, sht.dtype)),
    )


def semi_implicit_spherical_swe(sht: SphericalHarmonicTransform,
                                omega: float, *, phi_ref: float,
                                nu4: float = 0.0, order: int = 1):
    """Crank-Nicolson gravity-wave stepper for the spectral SWE.

    The linearized gravity-wave pair (L_div = -Lap(Phi), L_phi =
    -phi_ref*div) is trapezoidal; because the prognostic state is already
    spectral, the Helmholtz solve is one per-coefficient divide by
    (1 - a^2 lap phi_ref) — no transform needed. This lifts the CFL limit
    from sqrt(phi_ref) gravity waves to the advective speed (the method
    the reference declares for all models and implements for none,
    ref: weather_sim.hpp:50-56, weather_simulation.cpp:465-471).

    order=2 (opt-in, r5): two-time-level predictor-corrector — the
    nonlinear terms are evaluated at a CN-predicted midpoint, halving
    the splitting error at moderate dt for one extra tendency per step
    (see semi_implicit_swe's measured trade-off: at the large dt where
    the method earns its keep, wave-phase distortion dominates and
    order 1 is the efficiency point — it stays the default).
    """
    from njw_tpu.weather.integrators import Stepper

    lap = sht._lap  # (T+1, T+2) real eigenvalues, <= 0

    def nonlin(s: SphericalSWEState):
        full = swe_tendencies(s, sht, omega, nu4)
        return SphericalSWEState(
            zeta=full.zeta,
            div=full.div - (-lap * s.phi),
            phi=full.phi - (-phi_ref * s.div),
        )

    def advance(s: SphericalSWEState, n_val, dt_eff):
        a = 0.5 * dt_eff
        zeta_s = s.zeta + dt_eff * n_val.zeta
        div_s = s.div + dt_eff * n_val.div + a * (-lap * s.phi)
        phi_s = s.phi + dt_eff * n_val.phi + a * (-phi_ref * s.div)
        denom = 1.0 - (a * a) * lap * phi_ref
        div_n = (div_s - a * lap * phi_s) / denom
        phi_n = phi_s - a * phi_ref * div_n
        return SphericalSWEState(zeta=zeta_s, div=div_n, phi=phi_n)

    def step(carry, s: SphericalSWEState, dt):
        n0 = nonlin(s)
        if order == 1:
            return carry, advance(s, n0, dt)
        s_mid = advance(s, n0, 0.5 * dt)
        return carry, advance(s, nonlin(s_mid), dt)

    return Stepper(lambda s: (), step, "semi_implicit", 2)


# -- Simulation wiring -------------------------------------------------------

def make_spherical_sim(sim_cls, config, initial_condition: str,
                       **ic_params):
    """Build a Simulation on the spherical-harmonic grid.

    config.model selects the core: 'barotropic' -> BVE,
    'shallow_water'/'general' -> spectral SWE. grid_height = nlat,
    grid_width = nlon (must be 2*nlat). Physical constants default to
    Earth; override with ic_params radius= / omega= / nu4=.
    """
    nlat = config.grid_height
    nlon = config.grid_width
    if nlon != 2 * nlat:
        raise ValueError(
            f"spherical_harmonic grid needs grid_width == 2*grid_height "
            f"(got {nlon} x {nlat})")
    if config.boundary_condition != "periodic":
        raise ValueError("the sphere has no boundaries: bc must stay "
                         "'periodic' for grid_type='spherical_harmonic'")
    radius = float(ic_params.pop("radius", EARTH_RADIUS))
    omega = float(ic_params.pop("omega", EARTH_OMEGA))
    nu4 = float(ic_params.pop("nu4", 0.0))
    fold = ic_params.pop("fold_parity", None)  # None -> size-based auto
    sht = SphericalHarmonicTransform(nlat, radius=radius, fold_parity=fold)

    # IC/output construction goes through jit with the transform as a
    # PYTREE ARGUMENT, and the prognostic state crosses every jit boundary
    # PACKED as (real, imag) float pairs: on remote TPU backends complex
    # is only supported INSIDE compiled programs — a complex buffer at the
    # runtime layer (transfer, eager op, jit operand/result) wedges the
    # session (measured on axon/v5e r3). Packing is linear, so explicit
    # RK combinations of packed states are exactly RK on the complex state.
    def _build(fn, **kw):
        return jax.jit(lambda t: pack_state(fn(t, **kw)))(sht)

    model = config.model
    if model == "barotropic":
        if initial_condition in ("rossby_haurwitz", "uniform", "default"):
            state0 = _build(rossby_haurwitz_bve, **ic_params)
        elif initial_condition == "random":
            key = jax.random.key(config.random_seed)
            zg = 1e-5 * jax.random.normal(key, (nlat, nlon))
            state0 = jax.jit(
                lambda t, z: pack_state(
                    SphericalBarotropicState(zeta=t.analysis(z)))
            )(sht, zg)
        else:
            raise ValueError(
                f"unknown spherical barotropic IC {initial_condition!r} "
                "(use rossby_haurwitz | random)")
        tendency = lambda p: pack_state(
            bve_tendencies(unpack_state(p), sht, omega, nu4))

        @jax.jit
        def _bve_out(p, t):
            s = unpack_state(p)
            psi = t.inverse_laplacian(s.zeta)
            U, V = t.uv_from_psi_chi(psi, jnp.zeros_like(psi))
            c = t.cos_lat()
            return {"zeta": t.synthesis(s.zeta),
                    "psi": t.synthesis(psi),
                    "u": U / c, "v": V / c}

        output_fn = lambda s: _bve_out(s, sht)
    elif model in ("shallow_water", "general"):
        if initial_condition in ("williamson2", "zonal", "uniform",
                                 "default"):
            state0 = _build(williamson2_state, omega=omega, **ic_params)
        elif initial_condition in ("rossby_haurwitz", "williamson6"):
            state0 = _build(rossby_haurwitz_swe, omega=omega, **ic_params)
        else:
            raise ValueError(
                f"unknown spherical SWE IC {initial_condition!r} "
                "(use williamson2 | rossby_haurwitz)")
        tendency = lambda p: pack_state(
            swe_tendencies(unpack_state(p), sht, omega, nu4))
        g = config.gravity or 9.80616

        @jax.jit
        def _swe_out(p, t):
            s = unpack_state(p)
            psi = t.inverse_laplacian(s.zeta)
            chi = t.inverse_laplacian(s.div)
            U, V = t.uv_from_psi_chi(psi, chi)
            c = t.cos_lat()
            return {"h": t.synthesis(s.phi) / g,
                    "u": U / c, "v": V / c,
                    "zeta": t.synthesis(s.zeta),
                    "divergence": t.synthesis(s.div)}

        output_fn = lambda s: _swe_out(s, sht)
    else:
        raise ValueError(
            f"model {model!r} has no spherical-harmonic core "
            "(use barotropic | shallow_water)")

    stepper_factory = None
    if config.integration_method == "semi_implicit":
        if model == "barotropic":
            raise ValueError(
                "semi_implicit applies to models with fast gravity-wave "
                "modes; the spherical BVE has none — use rk4/rk2/euler.")
        # packed phi: component 0 is the real part; device_get + numpy
        # (eager complex ops are unavailable on remote TPU backends)
        phi_ref = float(np.asarray(jax.device_get(state0.phi))[0, 0, 0])
        raw = semi_implicit_spherical_swe(
            sht, omega, phi_ref=phi_ref, nu4=nu4,
            order=getattr(config, "si_order", 1))

        def _packed_step(carry, p, dt):
            carry, s2 = raw.step(carry, unpack_state(p), dt)
            return carry, pack_state(s2)

        from njw_tpu.weather.integrators import Stepper
        stepper_factory = lambda _t: Stepper(
            raw.init, _packed_step, raw.name, raw.stages)

    sim = sim_cls(
        state0, tendency, dt=config.dt, method=config.integration_method,
        grid=None, output_fn=output_fn, stepper_factory=stepper_factory,
    )
    sim.config = config
    sim.sht = sht
    sim.omega = omega
    return sim
