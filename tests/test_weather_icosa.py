"""Icosahedral-grid SWE tests (Williamson et al. 1992 TC1/TC2).

The reference declares GridType::Icosahedral and never implements it
(ref: weather_sim.hpp:61-66); these tests pin the TPU-native core:
coordinate-oracle halo exchange, exact LSQ operators on linear fields,
solid-body advection vs the analytic rotation, and steady geostrophic
flow staying steady.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from njw_tpu.weather.icosa import (
    EARTH_OMEGA,
    EARTH_RADIUS,
    IcosaSWEState,
    advection_tendency,
    build_operators,
    cell_centers,
    divergence,
    gaussian_hill,
    gradient,
    make_icosa_sim,
    pad_halo,
    panel_vertices,
    solid_body_velocity,
    swe_tendencies_icosa,
    uv_from_cartesian,
    williamson2_icosa,
)


def test_grid_geometry():
    n = 8
    v = panel_vertices(n)
    c = cell_centers(n)
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-12)
    np.testing.assert_allclose(np.linalg.norm(c, axis=-1), 1.0, atol=1e-12)
    # unique vertices of the full sphere: 10 n^2 + 2
    uniq = np.unique(np.round(v.reshape(-1, 3), 9), axis=0)
    assert uniq.shape[0] == 10 * n * n + 2
    # cell centers are all distinct
    uc = np.unique(np.round(c.reshape(-1, 3), 9), axis=0)
    assert uc.shape[0] == 10 * n * n
    with pytest.raises(ValueError):
        panel_vertices(12)  # not a power of 2


def test_halo_matches_coords():
    """Every halo slot must hold the coordinates of a REAL cell, and one
    geometrically adjacent to the edge cell it neighbors."""
    n = 8
    c = cell_centers(n)
    pc = pad_halo(c, xp=np)
    allc = c.reshape(-1, 3)
    h = np.linalg.norm(c[0, 0, 0] - c[0, 0, 1])  # typical spacing
    for p in range(10):
        slots = ([(0, j) for j in range(1, n + 1)]
                 + [(n + 1, j) for j in range(1, n + 1)]
                 + [(i, 0) for i in range(1, n + 1)]
                 + [(i, n + 1) for i in range(1, n + 1)])
        for (ii, jj) in slots:
            x = pc[p, ii, jj]
            assert np.linalg.norm(allc - x, axis=1).min() < 1e-12
            si = min(max(ii, 1), n)
            sj = min(max(jj, 1), n)
            assert np.linalg.norm(x - pc[p, si, sj]) < 1.6 * h


def test_gradient_exact_on_linear_fields():
    """LSQ gradient == tangential projection of the 3-D gradient, exactly,
    for fields linear in the embedding coordinates."""
    ops = build_operators(16, radius=1.0)
    r = np.asarray(ops.r, np.float64)
    g3 = np.array([0.3, -1.1, 0.7])
    f = jnp.asarray(r @ g3, jnp.float32)
    got = np.asarray(gradient(f, ops), np.float64)
    want = g3 - (r @ g3)[..., None] * r  # P g3 (radius 1: grad = P g)
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_divergence_of_solid_body_is_zero():
    ops = build_operators(16, radius=1.0)
    V = solid_body_velocity(ops, 1.0)
    d = np.asarray(divergence(V, ops))
    assert np.abs(d).max() < 5e-4  # analytic div = 0; O(h^2) truncation


def test_gradient_second_order_convergence():
    """Gradient of sin(lat): truncation error drops ~4x from n=8 to n=16."""
    errs = []
    for n in (8, 16):
        ops = build_operators(n, radius=1.0)
        r = np.asarray(ops.r, np.float64)
        f = jnp.asarray(r[..., 2], jnp.float32)  # sin(lat) = z
        got = np.asarray(gradient(f, ops), np.float64)
        z = np.array([0.0, 0.0, 1.0])
        want = z - r[..., 2:3] * r  # P e_z
        errs.append(np.sqrt(((got - want) ** 2).sum(-1)).mean())
    # linear fields are exact (previous test); z restricted to the sphere
    # IS linear, so both errors are near float32 roundoff
    assert errs[1] < 1e-4


def test_tc1_advection_matches_analytic_rotation():
    """Solid-body advection: after time t the exact solution is the
    initial field evaluated at longitude lon - omega t."""
    n = 16
    ops = build_operators(n, radius=1.0)
    omega_rot = 1.0  # rad/s on unit sphere
    V = solid_body_velocity(ops, omega_rot)  # |V| = cos(lat)
    q0 = gaussian_hill(ops, lon0=0.0, lat0=0.3, width=0.5)

    dt = 0.02
    steps = 50  # t = 1 rad of rotation

    @jax.jit
    def run(q, V, ops):
        def body(q, _):
            k1 = advection_tendency(q, V, ops)
            k2 = advection_tendency(q + 0.5 * dt * k1, V, ops)
            k3 = advection_tendency(q + 0.5 * dt * k2, V, ops)
            k4 = advection_tendency(q + dt * k3, V, ops)
            return q + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4), None
        return jax.lax.scan(body, q, None, length=steps)[0]

    q_end = np.asarray(run(q0, V, ops))
    q_exact = np.asarray(gaussian_hill(ops, lon0=1.0, lat0=0.3, width=0.5))
    rel = np.sqrt(((q_end - q_exact) ** 2).mean()) / np.sqrt(
        (q_exact**2).mean())
    assert rel < 0.05, rel


def test_tc2_steady_state_stays_steady():
    """Williamson TC2: geostrophically balanced zonal flow must stay
    near-steady for a model day (the discrete truncation drift is O(h^2),
    far below the field amplitude)."""
    n = 16
    ops = build_operators(n)
    s0 = williamson2_icosa(ops)
    dt = 600.0  # s
    steps = 144  # one model day

    @jax.jit
    def run(s, ops):
        def body(s, _):
            def rhs(x):
                return swe_tendencies_icosa(x, ops)
            k1 = rhs(s)
            ax = lambda a, k: jax.tree.map(lambda si, ki: si + a * ki, s, k)
            k2 = rhs(ax(0.5 * dt, k1))
            k3 = rhs(ax(0.5 * dt, k2))
            k4 = rhs(ax(dt, k3))
            comb = jax.tree.map(
                lambda a, b, c, d: a + 2 * b + 2 * c + d, k1, k2, k3, k4)
            return jax.tree.map(lambda si, ci: si + dt / 6.0 * ci, s, comb), None
        return jax.lax.scan(body, s, None, length=steps)[0]

    s_end = run(s0, ops)
    h0 = np.asarray(s0.h)
    h1 = np.asarray(s_end.h)
    assert np.isfinite(h1).all()
    rel = np.sqrt(((h1 - h0) ** 2).mean()) / np.sqrt((h0**2).mean())
    assert rel < 2e-3, rel
    # velocity stays exactly tangent (fixed per-cell projector + RK4)
    vr = np.abs(np.asarray(jnp.sum(s_end.V * ops.r, -1)))
    assert vr.max() < 1e-3 * np.abs(np.asarray(s_end.V)).max()


def test_icosa_sim_driver_and_output():
    from njw_tpu.weather.model import SimConfig, Simulation

    cfg = SimConfig(model="shallow_water", grid_type="icosahedral",
                    grid_height=8, grid_width=8, dt=900.0,
                    max_steps=8, output_interval=4)
    sim = make_icosa_sim(Simulation, cfg, "gaussian", amplitude=50.0)
    sim.run(8, output_interval=4)
    snap = sim.snapshots[-1]
    assert snap["h"].shape == (10, 8, 8)
    assert np.isfinite(snap["h"]).all()
    assert np.isfinite(snap["u"]).all()
    # zonal jet dominates: u > 0 on average (eastward TC2 base flow)
    assert snap["u"].mean() > 0.0


def test_uv_projection_roundtrip():
    ops = build_operators(8)
    V = solid_body_velocity(ops, 10.0)
    u, v = uv_from_cartesian(V, ops)
    lat = np.arcsin(np.asarray(ops.r[..., 2]))
    np.testing.assert_allclose(np.asarray(u), 10.0 * np.cos(lat), atol=1e-3)
    np.testing.assert_allclose(np.asarray(v), 0.0, atol=1e-3)
