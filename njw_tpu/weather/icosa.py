"""Icosahedral-grid shallow water: the last GridType the reference declares.

The reference enum lists Icosahedral (ref: weather_sim.hpp:61-66) and never
implements it. This is a real icosahedral core, designed TPU-first:

* The sphere is split into the 10 rhombic panels of the icosahedron
  (NICAM-style rhomboidal decomposition); fields are stored STRUCTURED as
  ``(10, n, n)`` cell-centered arrays, so every stencil is a static slice
  — no gathers (the measured TPU anti-pattern) and no unstructured
  indirection.
* Panel-to-panel halo exchange is 8 static slice copies + rolls on the
  tiny panel axis (the 5-fold symmetry maps panel k edges to panels k+-1).
  Cell-centered storage removes the pentagon-point special cases entirely:
  the 12 icosahedron vertices are cell corners, and every cell keeps
  exactly 4 edge neighbors.
* Operators are least-squares tangent-plane reconstructions with
  precomputed per-cell weights: exact for linear fields, pure
  multiply-accumulate over 4 shifted slabs (VPU-shaped).
* Dynamics use the Cartesian vector-velocity method (Cote 1988 /
  Swarztrauber): velocity is a global 3-vector field constrained to the
  tangent plane, so panel boundaries need NO vector rotation and the
  Coriolis term is a literal ``-2 Omega x V``. Tendencies are projected
  onto the tangent plane per cell; since the projector is fixed per cell,
  RK combinations stay exactly tangent.

Validation: Williamson et al. (1992) TC1 (solid-body advection vs the
analytically rotated field) and TC2 (steady geostrophic flow) in
tests/test_weather_icosa.py.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from njw_tpu.utils.pytree import pytree_dataclass

EARTH_RADIUS = 6.37122e6
EARTH_OMEGA = 7.292e-5


# --------------------------------------------------------------------------
# Geometry (numpy, setup time)
# --------------------------------------------------------------------------

def _base_vertices():
    lat = np.arctan(0.5)
    N = np.array([0.0, 0.0, 1.0])
    U = [np.array([np.cos(lat) * np.cos(2 * np.pi * k / 5),
                   np.cos(lat) * np.sin(2 * np.pi * k / 5),
                   np.sin(lat)]) for k in range(5)]
    L = [np.array([np.cos(lat) * np.cos(2 * np.pi * (k + 0.5) / 5),
                   np.cos(lat) * np.sin(2 * np.pi * (k + 0.5) / 5),
                   -np.sin(lat)]) for k in range(5)]
    return N, -N, U, L


def panel_vertices(n: int) -> np.ndarray:
    """(10, n+1, n+1, 3) unit vertices by recursive great-circle bisection
    (n must be a power of 2).

    Northern panel k corners: (0,0)=N, (n,0)=U_k, (0,n)=U_{k+1}, (n,n)=L_k.
    Southern panel k corners: (0,0)=U_{k+1}, (n,0)=L_k, (0,n)=L_{k+1},
    (n,n)=S. The subdivision diagonal is the anti-diagonal, matching the
    icosahedron edge U_k-U_{k+1} so the global triangulation is consistent.
    """
    if n & (n - 1):
        raise ValueError(f"icosahedral n must be a power of 2, got {n}")
    N, S, U, L = _base_vertices()
    corners = [(N, U[k], U[(k + 1) % 5], L[k]) for k in range(5)]
    corners += [(U[(k + 1) % 5], L[k], L[(k + 1) % 5], S) for k in range(5)]
    out = np.zeros((10, n + 1, n + 1, 3))
    for p, (c00, c10, c01, c11) in enumerate(corners):
        V = np.zeros((2, 2, 3))
        V[0, 0], V[1, 0], V[0, 1], V[1, 1] = c00, c10, c01, c11
        m = 1
        while m < n:
            W = np.zeros((2 * m + 1, 2 * m + 1, 3))
            W[::2, ::2] = V
            W[1::2, ::2] = V[:-1, :] + V[1:, :]
            W[::2, 1::2] = V[:, :-1] + V[:, 1:]
            W[1::2, 1::2] = V[1:, :-1] + V[:-1, 1:]
            W /= np.linalg.norm(W, axis=-1, keepdims=True)
            V, m = W, 2 * m
        out[p] = V
    return out


def cell_centers(n: int) -> np.ndarray:
    """(10, n, n, 3) unit cell centers (normalized quad-vertex means)."""
    v = panel_vertices(n)
    c = v[:, :-1, :-1] + v[:, 1:, :-1] + v[:, :-1, 1:] + v[:, 1:, 1:]
    return c / np.linalg.norm(c, axis=-1, keepdims=True)


# --------------------------------------------------------------------------
# Halo exchange: 8 static slice copies (numpy and jnp share the recipe)
# --------------------------------------------------------------------------

def pad_halo(f, xp=jnp):
    """(10, n, n, ...) -> (10, n+2, n+2, ...) with 1-cell edge halos from
    the four neighboring panels (corner slots unused by the 4-neighbor
    stencil). Derivation of the 8 affine edge maps is pinned by the
    coordinate-oracle test (test_weather_icosa.py::test_halo_matches_coords).
    """
    n = f.shape[1]
    fN, fS = f[:5], f[5:]
    rN1 = xp.roll(fN, 1, 0)    # panel k-1 -> slot k
    rNm1 = xp.roll(fN, -1, 0)  # panel k+1 -> slot k
    rS1 = xp.roll(fS, 1, 0)
    rSm1 = xp.roll(fS, -1, 0)
    pad_w = [(0, 0), (1, 1), (1, 1)] + [(0, 0)] * (f.ndim - 3)
    p = xp.pad(f, pad_w)
    if xp is jnp:
        p = p.at[:5, 1:-1, 0].set(rN1[:, 0, :])       # (i,-1) = N_{k-1}(0,i)
        p = p.at[:5, 0, 1:-1].set(rNm1[:, :, 0])      # (-1,j) = N_{k+1}(j,0)
        p = p.at[:5, -1, 1:-1].set(rS1[:, 0, :])      # (n,j) = S_{k-1}(0,j)
        p = p.at[:5, 1:-1, -1].set(fS[:, :, 0])       # (i,n) = S_k(i,0)
        p = p.at[5:, 0, 1:-1].set(rNm1[:, n - 1, :])  # (-1,j)=N_{k+1}(n-1,j)
        p = p.at[5:, 1:-1, 0].set(fN[:, :, n - 1])    # (i,-1)=N_k(i,n-1)
        p = p.at[5:, -1, 1:-1].set(rS1[:, :, n - 1])  # (n,j)=S_{k-1}(j,n-1)
        p = p.at[5:, 1:-1, -1].set(rSm1[:, n - 1, :])  # (i,n)=S_{k+1}(n-1,i)
    else:
        p[:5, 1:-1, 0] = rN1[:, 0, :]
        p[:5, 0, 1:-1] = rNm1[:, :, 0]
        p[:5, -1, 1:-1] = rS1[:, 0, :]
        p[:5, 1:-1, -1] = fS[:, :, 0]
        p[5:, 0, 1:-1] = rNm1[:, n - 1, :]
        p[5:, 1:-1, 0] = fN[:, :, n - 1]
        p[5:, -1, 1:-1] = rS1[:, :, n - 1]
        p[5:, 1:-1, -1] = rSm1[:, n - 1, :]
    return p


def _shift_slabs(p):
    """The 4 edge-neighbor slabs of a padded array: i+1, i-1, j+1, j-1."""
    return (p[:, 2:, 1:-1], p[:, :-2, 1:-1],
            p[:, 1:-1, 2:], p[:, 1:-1, :-2])


# --------------------------------------------------------------------------
# Least-squares tangent-plane operators
# --------------------------------------------------------------------------

@pytree_dataclass
class IcosaOperators:
    """Precomputed per-cell geometry, passed as a PYTREE ARGUMENT through
    jit (runtime operands, not baked HLO constants)."""

    w: jnp.ndarray       # (4, 10, n, n, 3) LSQ gradient weights
    r: jnp.ndarray       # (10, n, n, 3) unit radial = cell centers
    east: jnp.ndarray    # (10, n, n, 3) local east basis
    north: jnp.ndarray   # (10, n, n, 3) local north basis
    radius: jnp.ndarray  # scalar sphere radius (m)

    @property
    def n(self) -> int:
        return self.r.shape[1]


def build_operators(n: int, radius: float = EARTH_RADIUS) -> IcosaOperators:
    """LSQ gradient weights: per cell, fit the model
    ``f_e - f_c ~= a (d_e . e1) + b (d_e . e2) + beta (d_e . r)``
    over the 4 edge chords d_e and return grad f = a e1 + b e2.

    The radial column absorbs the O(h^2) curvature component of the
    chords (all chords bend inward by |d|^2/2R), which would otherwise
    contaminate the tangential fit at O(h) near the asymmetric
    panel-edge stencils. With it, the gradient is EXACT for restrictions
    of linear functions of the embedding coordinates — the property the
    tests pin — and 2nd-order for smooth fields."""
    c = cell_centers(n)
    pc = pad_halo(c, xp=np)
    nbrs = np.stack([pc[:, 2:, 1:-1], pc[:, :-2, 1:-1],
                     pc[:, 1:-1, 2:], pc[:, 1:-1, :-2]])  # (4,10,n,n,3)
    d = (nbrs - c) * radius
    r = c

    z = np.array([0.0, 0.0, 1.0])
    east = np.cross(z, c)
    east /= np.maximum(np.linalg.norm(east, axis=-1, keepdims=True), 1e-12)
    north = np.cross(c, east)

    # A: (10,n,n,4,3) design matrix in the (east, north, radial) basis
    A = np.stack([np.einsum("e...i,...i->...e", d, east),
                  np.einsum("e...i,...i->...e", d, north),
                  np.einsum("e...i,...i->...e", d, r)], -1)
    AtA = np.einsum("...ei,...ej->...ij", A, A)
    W = np.einsum("...ij,...ej->...ie", np.linalg.inv(AtA), A)
    # tangential rows only; discard the curvature (beta) row
    w = (np.einsum("...e,...i->e...i", W[..., 0, :], east)
         + np.einsum("...e,...i->e...i", W[..., 1, :], north))

    f32 = lambda a: jnp.asarray(np.asarray(a, np.float32))
    return IcosaOperators(w=f32(w), r=f32(c), east=f32(east),
                          north=f32(north),
                          radius=jnp.float32(radius))


def gradient(f, ops: IcosaOperators, pad=pad_halo):
    """Tangential gradient of a scalar: (10,n,n) -> (10,n,n,3).

    `pad` supplies the halo exchange; the sharded path passes a
    ppermute-based exchange over panel pairs (parallel/icosa.py) and the
    physics below is shared unchanged — the same shift-parameterization
    pattern as the planar cores."""
    p = pad(f)
    out = jnp.zeros(f.shape + (3,), f.dtype)
    for e, s in enumerate(_shift_slabs(p)):
        out = out + ops.w[e] * (s - f)[..., None]
    return out


def gradient_vec(V, ops: IcosaOperators, pad=pad_halo):
    """Per-component gradient of a 3-vector field:
    (10,n,n,3) -> (10,n,n,3comp,3dir)."""
    p = pad(V)
    out = jnp.zeros(V.shape + (3,), V.dtype)
    for e, s in enumerate(_shift_slabs(p)):
        out = out + ops.w[e][..., None, :] * (s - V)[..., :, None]
    return out


def divergence(V, ops: IcosaOperators, pad=pad_halo):
    """LSQ divergence: (10,n,n,3) -> (10,n,n)."""
    p = pad(V)
    out = jnp.zeros(V.shape[:-1], V.dtype)
    for e, s in enumerate(_shift_slabs(p)):
        out = out + jnp.sum(ops.w[e] * (s - V), -1)
    return out


def laplacian(f, ops: IcosaOperators, pad=pad_halo):
    """div(grad f) — two halo exchanges; used for explicit diffusion."""
    return divergence(gradient(f, ops, pad), ops, pad)


# --------------------------------------------------------------------------
# Shallow water in Cartesian vector form
# --------------------------------------------------------------------------

@pytree_dataclass
class IcosaSWEState:
    V: jnp.ndarray  # (10, n, n, 3) tangent Cartesian velocity (m/s)
    h: jnp.ndarray  # (10, n, n) fluid depth (m)


def swe_tendencies_icosa(s: IcosaSWEState, ops: IcosaOperators,
                         g: float = 9.80616, omega: float = EARTH_OMEGA,
                         nu: float = 0.0, pad=pad_halo) -> IcosaSWEState:
    """dV/dt = P[-(V.grad)V - g grad h - 2 Omega x V],  P = I - r r^T;
    dh/dt = -(h div V + V . grad h).

    The tangential projection P absorbs the centripetal (constraint)
    force; because r is fixed per cell, any RK combination of projected
    tendencies keeps V exactly tangent."""
    V, h = s.V, s.h
    gh = gradient(h, ops, pad)
    gV = gradient_vec(V, ops, pad)
    adv = jnp.einsum("...d,...cd->...c", V, gV)
    zxV = jnp.stack([-V[..., 1], V[..., 0], jnp.zeros_like(V[..., 0])], -1)
    dV = -adv - g * gh - (2.0 * omega) * zxV
    dV = dV - jnp.sum(dV * ops.r, -1, keepdims=True) * ops.r
    dh = -(h * divergence(V, ops, pad) + jnp.sum(V * gh, -1))
    if nu:
        dV = dV + nu * jnp.stack(
            [laplacian(V[..., i], ops, pad) for i in range(3)], -1)
        dh = dh + nu * laplacian(h, ops, pad)
    return IcosaSWEState(V=dV, h=dh)


def advection_tendency(q, V, ops: IcosaOperators):
    """Passive-scalar advection dq/dt = -V . grad q (Williamson TC1)."""
    return -jnp.sum(V * gradient(q, ops), -1)


# --------------------------------------------------------------------------
# Initial conditions (Williamson et al. 1992)
# --------------------------------------------------------------------------

def solid_body_velocity(ops: IcosaOperators, u0: float) -> jnp.ndarray:
    """V = u0 (z x r): solid-body rotation about the polar axis
    (u = u0 cos(lat) eastward, v = 0)."""
    r = ops.r
    return u0 * jnp.stack(
        [-r[..., 1], r[..., 0], jnp.zeros_like(r[..., 0])], -1)


def williamson2_icosa(ops: IcosaOperators, omega: float = EARTH_OMEGA,
                      g: float = 9.80616,
                      u0: float = 2.0 * np.pi * EARTH_RADIUS / (12 * 86400),
                      gh0: float = 2.94e4) -> IcosaSWEState:
    """TC2 steady zonal geostrophic flow:
    gh = gh0 - (a Omega u0 + u0^2/2) sin^2(lat)."""
    a = ops.radius
    mu = ops.r[..., 2]
    gh = gh0 - (a * omega * u0 + 0.5 * u0 * u0) * mu * mu
    return IcosaSWEState(V=solid_body_velocity(ops, u0), h=gh / g)


def gaussian_hill(ops: IcosaOperators, lon0: float = 0.0,
                  lat0: float = 0.0, width: float = 0.3) -> jnp.ndarray:
    """Unit-amplitude Gaussian bump at (lon0, lat0); width in radians of
    great-circle arc."""
    x0 = np.array([np.cos(lat0) * np.cos(lon0),
                   np.cos(lat0) * np.sin(lon0), np.sin(lat0)])
    d2 = jnp.sum((ops.r - jnp.asarray(x0, jnp.float32)) ** 2, -1)
    return jnp.exp(-d2 / jnp.float32(width**2))


def uv_from_cartesian(V, ops: IcosaOperators):
    """Project the Cartesian velocity onto local (east, north)."""
    return jnp.sum(V * ops.east, -1), jnp.sum(V * ops.north, -1)


# --------------------------------------------------------------------------
# Simulation wiring
# --------------------------------------------------------------------------

def make_icosa_sim(sim_cls, config, initial_condition: str, **ic_params):
    """Build a Simulation on the icosahedral grid.

    config.grid_height = n (cells per rhombus edge, power of 2); total
    cells = 10 n^2. Models: 'shallow_water' (default); IC 'williamson2'
    (alias zonal/uniform/default) or 'gaussian' (TC2 flow carrying a
    Gaussian height anomaly)."""
    n = config.grid_height
    omega = float(ic_params.pop("omega", EARTH_OMEGA))
    radius = float(ic_params.pop("radius", EARTH_RADIUS))
    g = config.gravity or 9.80616
    nu = config.viscosity
    ops = build_operators(n, radius=radius)

    if config.model not in ("shallow_water", "general"):
        raise ValueError("icosahedral grid implements the shallow_water "
                         f"core (got model={config.model!r})")
    if initial_condition in ("williamson2", "zonal", "uniform", "default",
                             "vortex"):
        state0 = williamson2_icosa(ops, omega=omega, g=g, **ic_params)
    elif initial_condition == "gaussian":
        base = williamson2_icosa(ops, omega=omega, g=g)
        amp = float(ic_params.pop("amplitude", 100.0))
        state0 = IcosaSWEState(
            V=base.V, h=base.h + amp * gaussian_hill(ops, **ic_params))
    else:
        raise ValueError(
            f"unknown icosahedral IC {initial_condition!r} "
            "(use williamson2 | gaussian)")

    tendency = lambda s: swe_tendencies_icosa(s, ops, g=g, omega=omega,
                                              nu=nu)

    def output_fn(s):
        u, v = uv_from_cartesian(s.V, ops)
        return {"h": s.h, "u": u, "v": v}

    sim = sim_cls(state0, tendency, dt=config.dt,
                  method=config.integration_method, grid=None,
                  output_fn=output_fn)
    sim.config = config
    sim.icosa_ops = ops
    return sim
