"""Barotropic vorticity core: Poisson inversion, Arakawa conservation,
Rossby wave dispersion sanity."""
import jax.numpy as jnp
import numpy as np
import pytest

from njw_tpu.ops.spectral import poisson_solve
from njw_tpu.weather import GridSpec, PhysicsParams, SimConfig, Simulation
from njw_tpu.weather.barotropic import (
    BarotropicState, arakawa_jacobian, barotropic_tendencies,
    invert_vorticity, velocities,
)
from njw_tpu.weather.dynamics import laplacian


GRID = GridSpec(nx=64, ny=64, dx=1.0, dy=1.0)


def _random_field(seed, shape=(64, 64)):
    rng = np.random.default_rng(seed)
    f = rng.standard_normal(shape).astype(np.float32)
    return jnp.asarray(f - f.mean())


class TestPoisson:
    def test_inversion_consistent_with_fd_laplacian(self):
        """laplacian5 symbol: Laplacian(poisson_solve(f)) == f exactly
        (up to roundoff) for zero-mean f."""
        f = _random_field(0)
        psi = poisson_solve(f, 1.0, 1.0, kind="laplacian5")
        back = laplacian(psi, 1.0, 1.0, "periodic")
        np.testing.assert_allclose(np.asarray(back), np.asarray(f),
                                   rtol=1e-3, atol=5e-4)

    def test_single_mode_exact(self):
        """For f = sin(kx), psi must be -f/k_eff^2."""
        n = 64
        x = jnp.arange(n) * (2 * jnp.pi / n)
        f = jnp.broadcast_to(jnp.sin(x)[None, :], (n, n)).astype(jnp.float32)
        psi = poisson_solve(f, 1.0, 1.0, kind="laplacian5")
        k_eff2 = 2.0 * (1.0 - np.cos(2 * np.pi / n))
        np.testing.assert_allclose(
            np.asarray(psi), -np.asarray(f) / k_eff2, rtol=1e-4, atol=1e-4
        )


class TestArakawa:
    def test_jacobian_antisymmetry(self):
        p, z = _random_field(1), _random_field(2)
        j_pz = arakawa_jacobian(p, z, 1.0, 1.0)
        j_zp = arakawa_jacobian(z, p, 1.0, 1.0)
        np.testing.assert_allclose(
            np.asarray(j_pz), -np.asarray(j_zp), rtol=1e-4, atol=1e-5
        )

    def test_jacobian_conserves_mean_vorticity(self):
        """sum J(p, z) = 0 (discrete integral property)."""
        p, z = _random_field(3), _random_field(4)
        j = arakawa_jacobian(p, z, 1.0, 1.0)
        assert abs(np.asarray(j, dtype=np.float64).sum()) < 1e-3

    def test_enstrophy_conservation_semidiscrete(self):
        """sum z * J(p, z) = 0: the Arakawa form conserves enstrophy."""
        p, z = _random_field(5), _random_field(6)
        j = arakawa_jacobian(p, z, 1.0, 1.0)
        val = float((np.asarray(z, np.float64) * np.asarray(j, np.float64)).sum())
        assert abs(val) < 1e-2

    def test_energy_conservation_semidiscrete(self):
        """sum p * J(p, z) = 0: conserves kinetic energy."""
        p, z = _random_field(7), _random_field(8)
        j = arakawa_jacobian(p, z, 1.0, 1.0)
        val = float((np.asarray(p, np.float64) * np.asarray(j, np.float64)).sum())
        assert abs(val) < 1e-2


class TestBarotropicModel:
    def test_simulation_runs_and_conserves_enstrophy(self):
        cfg = SimConfig(model="barotropic", grid_width=64, grid_height=64,
                        dt=0.05, integration_method="rk4")
        sim = Simulation.from_config(cfg, "vortex", strength=5.0)
        z0 = np.asarray(sim.state.zeta).astype(np.float64)
        ens0 = float((z0 ** 2).sum())
        sim.step(200)
        z1 = np.asarray(sim.state.zeta).astype(np.float64)
        ens1 = float((z1 ** 2).sum())
        assert np.all(np.isfinite(z1))
        # Arakawa + RK4: enstrophy drift stays small over 200 steps
        assert abs(ens1 - ens0) / max(ens0, 1e-30) < 5e-3

    def test_velocities_are_nondivergent(self):
        zeta = _random_field(9)
        psi = invert_vorticity(zeta, GRID)
        u, v = velocities(psi, GRID)
        from njw_tpu.weather.dynamics import d_dx, d_dy

        div = d_dx(u, 1.0, "periodic") + d_dy(v, 1.0, "periodic")
        assert float(jnp.max(jnp.abs(div))) < 1e-4

    def test_beta_term_activates(self):
        zeta = _random_field(10)
        s = BarotropicState(zeta=zeta)
        t0 = barotropic_tendencies(s, GRID, PhysicsParams())
        t1 = barotropic_tendencies(s, GRID, PhysicsParams(beta=1e-2))
        assert not np.allclose(np.asarray(t0.zeta), np.asarray(t1.zeta))


class TestBarotropicOracle:
    """BASELINE.md:49-50 bar for the barotropic core (the third
    dynamical core; VERDICT r4 #4 — it previously had no NumPy
    time-stepping oracle at all)."""

    def test_tendency_matches_numpy_oracle(self):
        from njw_tpu.weather.dynamics import diagnostics
        from njw_tpu.weather.ics import make_initial_state
        from njw_tpu.weather.oracle import barotropic_tendency_np

        params = PhysicsParams(coriolis_f=0.0, beta=1e-3, viscosity=1e-3)
        s = make_initial_state("vortex", GRID, strength=2.0)
        z0 = diagnostics(s, GRID)["vorticity"]
        t_jnp = barotropic_tendencies(BarotropicState(zeta=z0), GRID,
                                      params).zeta
        t_np = barotropic_tendency_np(np.asarray(z0), dx=1.0, dy=1.0,
                                      beta=1e-3, viscosity=1e-3)
        np.testing.assert_allclose(np.asarray(t_jnp), t_np, rtol=1e-4,
                                   atol=1e-5)

    def test_rk4_oracle_1000_steps(self):
        """Tolerance policy: normalized 5e-3 — the oracle's np.fft runs
        in complex128 vs the model's complex64, and the 4 spectral
        inversions/step amplify that roundoff through the Jacobian to a
        measured ~1.5e-3 at 1000 steps; a wrong inversion symbol or
        shifted Jacobian shows up at O(1)."""
        from njw_tpu.weather.oracle import BarotropicOracle

        cfg = SimConfig(model="barotropic", grid_width=64, grid_height=64,
                        dx=1.0, dy=1.0, dt=0.05, beta=1e-3,
                        viscosity=1e-3, backend="xla")
        sim = Simulation.from_config(cfg, "vortex", strength=2.0)
        z0 = np.asarray(sim.state.zeta).copy()
        sim.step(1000)
        ref = BarotropicOracle(dx=1.0, dy=1.0, beta=1e-3,
                               viscosity=1e-3).run(z0, 0.05, 1000)
        got = np.asarray(sim.state.zeta)
        assert np.isfinite(got).all()
        scale = np.abs(ref).max() + 1e-30
        np.testing.assert_allclose(got / scale, ref / scale, rtol=0,
                                   atol=5e-3)


class TestBaroPallasKernel:
    def test_stage_matches_xla(self):
        """Fused Arakawa stage kernel == XLA tendency+axpy (interpret)."""
        from njw_tpu.ops.baro_stencil import baro_stage_pallas

        grid = GridSpec(nx=128, ny=32, dx=1.0, dy=1.0)
        params = PhysicsParams(beta=0.3, viscosity=0.02)
        z = _random_field(3, (32, 128))
        base = _random_field(4, (32, 128))
        psi = invert_vorticity(z, grid)
        out = baro_stage_pallas(psi, z, base, grid=grid, c_dt=0.7,
                                beta=0.3, nu=0.02, by=8, interpret=True)
        t = barotropic_tendencies(BarotropicState(zeta=z), grid, params)
        ref = base + 0.7 * t.zeta
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_rk4_stepper_matches_xla_rk4(self):
        from njw_tpu.ops.baro_stencil import make_baro_pallas_rk4_stepper
        from njw_tpu.weather.integrators import make_stepper

        grid = GridSpec(nx=128, ny=32, dx=1.0, dy=1.0)
        params = PhysicsParams(beta=0.1)
        z = _random_field(5, (32, 128)) * 0.1
        s = BarotropicState(zeta=z)
        pallas_st = make_baro_pallas_rk4_stepper(grid, params, dt=0.05,
                                                 interpret=True)
        _, out_p = pallas_st.step((), s, None)
        xla_st = make_stepper(
            "rk4", lambda x: barotropic_tendencies(x, grid, params))
        _, out_x = xla_st.step((), s, jnp.float32(0.05))
        np.testing.assert_allclose(np.asarray(out_p.zeta),
                                   np.asarray(out_x.zeta),
                                   rtol=1e-5, atol=1e-5)

    def test_sim_backend_pallas(self):
        """backend='pallas' wires the fused stepper into the Simulation."""
        cfg = SimConfig(model="barotropic", grid_width=128, grid_height=32,
                        dt=0.05, integration_method="rk4",
                        backend="pallas")
        sim = Simulation.from_config(cfg, "vortex", strength=2.0)
        assert sim.stepper.name == "baro_rk4_pallas"
        sim.step(5)
        assert bool(jnp.isfinite(sim.state.zeta).all())
