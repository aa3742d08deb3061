"""SWE core: jnp path vs NumPy oracle, conservation, integrator behavior.

Mirrors the reference's gtest coverage (ref:
src/weather-sim/cpp/test/weather_simulation_test.cpp:82-200: create / init /
step / all-integrators-run / RK4-changes-state) and adds what the reference
lacks: accelerated-vs-oracle allclose tests (BASELINE mandate).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from njw_tpu.weather import (
    GridSpec, PhysicsParams, Simulation, SimConfig, WeatherState,
    diagnostics, make_initial_state, make_tendency_fn,
)
from njw_tpu.weather.oracle import SWEOracle, diagnostics_np


def _mk(nx=64, ny=64, bc="periodic", **phys):
    grid = GridSpec(nx=nx, ny=ny, bc=bc)
    params = PhysicsParams(**phys)
    return grid, params


class TestTendencies:
    @pytest.mark.parametrize("bc", ["periodic", "clamped"])
    def test_matches_oracle(self, bc):
        grid, params = _mk(bc=bc, coriolis_f=1e-4)
        s = make_initial_state("vortex", grid)
        t = make_tendency_fn("shallow_water", grid, params)(s)
        du, dv, dh = SWEOracle(bc=bc, coriolis_f=1e-4).tendency(
            (np.asarray(s.u), np.asarray(s.v), np.asarray(s.h))
        )
        np.testing.assert_allclose(np.asarray(t.u), du, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(t.v), dv, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(t.h), dh, rtol=1e-6, atol=1e-6)

    def test_uniform_state_is_steady(self):
        """A uniform resting state must have zero tendencies."""
        grid, params = _mk()
        s = make_initial_state("uniform", grid)
        s = WeatherState(u=s.u, v=s.v, h=s.h)
        t = make_tendency_fn("shallow_water", grid, params)(s)
        for f in (t.u, t.v, t.h):
            np.testing.assert_allclose(np.asarray(f), 0.0, atol=1e-7)

    def test_viscosity_term(self):
        grid, params = _mk(viscosity=0.1)
        s = make_initial_state("random", grid, seed=3)
        s = WeatherState(u=s.u, v=s.v, h=s.h)
        t_visc = make_tendency_fn("shallow_water", grid, params)(s)
        t_novisc = make_tendency_fn("shallow_water", grid, PhysicsParams())(s)
        assert not np.allclose(np.asarray(t_visc.u), np.asarray(t_novisc.u))


class TestIntegrators:
    @pytest.mark.parametrize(
        "method", ["euler", "rk2", "rk4", "adams_bashforth", "semi_implicit"]
    )
    def test_runs_and_changes_state(self, method):
        """All five reference-named methods run and evolve the state
        (ref: weather_simulation_test.cpp:153-196)."""
        cfg = SimConfig(grid_width=64, grid_height=64, dt=0.01,
                        integration_method=method)
        sim = Simulation.from_config(cfg, "vortex")
        h0 = np.asarray(sim.state.h).copy()
        sim.step(5)
        h5 = np.asarray(sim.state.h)
        assert np.all(np.isfinite(h5))
        assert not np.allclose(h0, h5)

    @pytest.mark.parametrize("method", ["euler", "rk2", "rk4", "adams_bashforth"])
    def test_matches_oracle_100_steps(self, method):
        grid, _ = _mk()
        s = make_initial_state("vortex", grid, strength=2.0)
        cfg = SimConfig(grid_width=64, grid_height=64, dt=0.01,
                        integration_method=method)
        sim = Simulation.from_config(cfg, "vortex", strength=2.0)
        sim.step(100)
        assert np.all(np.isfinite(np.asarray(sim.state.h)))
        u, v, h = SWEOracle().run(
            (np.asarray(s.u), np.asarray(s.v), np.asarray(s.h)),
            0.01, 100, method,
        )
        np.testing.assert_allclose(np.asarray(sim.state.h), h, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(sim.state.u), u, rtol=2e-4, atol=2e-3)

    def test_rk4_oracle_1000_steps(self):
        """BASELINE correctness bar: allclose after 1000 steps."""
        grid, _ = _mk()
        s = make_initial_state("vortex", grid, strength=2.0)
        cfg = SimConfig(grid_width=64, grid_height=64, dt=0.01)
        sim = Simulation.from_config(cfg, "vortex", strength=2.0)
        sim.step(1000)
        assert np.all(np.isfinite(np.asarray(sim.state.h)))
        u, v, h = SWEOracle().run(
            (np.asarray(s.u), np.asarray(s.v), np.asarray(s.h)), 0.01, 1000
        )
        assert np.all(np.isfinite(h))
        np.testing.assert_allclose(np.asarray(sim.state.h), h, rtol=1e-3, atol=1e-3)

    def test_semi_implicit_stable_beyond_explicit_cfl(self):
        """The implicit gravity-wave treatment must stay stable at a dt
        where explicit Euler blows up (the whole point of the method)."""
        # Gravity-wave CFL at sqrt(g*10) ~ 9.9 m/s, dx=1 is dt ~ 0.07;
        # dt=0.2 is ~3x beyond it. The jet is kept weak (2 m/s) because
        # semi-implicit only lifts the *gravity-wave* CFL — the explicit
        # advective CFL (u_max*dt/dx) still applies.
        dt_big = 0.2
        cfg = SimConfig(grid_width=64, grid_height=64, dt=dt_big,
                        integration_method="semi_implicit")
        sim = Simulation.from_config(cfg, "jet_stream", strength=2.0)
        sim.step(50)
        assert np.all(np.isfinite(np.asarray(sim.state.h)))

        cfg_e = SimConfig(grid_width=64, grid_height=64, dt=dt_big,
                          integration_method="euler")
        sim_e = Simulation.from_config(cfg_e, "jet_stream", strength=2.0)
        sim_e.step(50)
        assert not np.all(np.isfinite(np.asarray(sim_e.state.h)))


class TestConservation:
    def test_mass_conservation_periodic(self):
        """Total height (mass) is conserved by the flux-form dh/dt under
        periodic BC up to float accumulation."""
        cfg = SimConfig(grid_width=128, grid_height=128, dt=0.005)
        sim = Simulation.from_config(cfg, "vortex", strength=2.0)
        m0 = float(np.asarray(sim.state.h, np.float64).sum())
        sim.step(200)
        assert np.all(np.isfinite(np.asarray(sim.state.h)))
        m1 = float(np.asarray(sim.state.h, np.float64).sum())
        assert abs(m1 - m0) / abs(m0) < 1e-4


class TestDiagnostics:
    def test_matches_oracle(self):
        grid, _ = _mk(bc="clamped")
        s = make_initial_state("breaking_wave", grid)
        d = diagnostics(s, grid)
        vort, div = diagnostics_np(
            np.asarray(s.u), np.asarray(s.v), dx=1.0, dy=1.0, bc="clamped"
        )
        np.testing.assert_allclose(np.asarray(d["vorticity"]), vort, atol=1e-6)
        np.testing.assert_allclose(np.asarray(d["divergence"]), div, atol=1e-6)

    def test_pure_rotation_has_positive_vorticity(self):
        grid, _ = _mk()
        s = make_initial_state("vortex", grid, strength=5.0)
        d = diagnostics(s, grid)
        # cyclonic vortex: positive vorticity at the core
        assert float(d["vorticity"][32, 32]) > 0


class TestSimulationDriver:
    def test_snapshots_stored_at_interval(self):
        cfg = SimConfig(grid_width=32, grid_height=32, dt=0.01)
        sim = Simulation.from_config(cfg, "vortex")
        sim.run(50, output_interval=10)
        assert len(sim.snapshots) == 5
        assert sim.snapshots[-1]["step"] == 50
        assert "vorticity" in sim.snapshots[0]

    def test_metrics_populated(self):
        cfg = SimConfig(grid_width=32, grid_height=32, dt=0.01)
        sim = Simulation.from_config(cfg, "vortex")
        sim.run(20)
        m = sim.metrics
        assert m.num_steps == 20
        assert m.grid_points == 32 * 32
        assert m.steps_per_second > 0
        assert m.grid_points_per_second > 0

    def test_donate_flag_equivalent(self):
        """donate=True (the HBM-limited opt-in) is numerically identical
        to the measured-faster no-donation default (BENCH_NOTES r4
        donation table: donation pessimizes the compiled scan body 19%
        on v5e, so it is off unless opted in)."""
        grid = GridSpec(nx=32, ny=32)
        params = PhysicsParams(coriolis_f=1e-4)
        tendency = make_tendency_fn("shallow_water", grid, params)
        full0 = make_initial_state("vortex", grid)
        s0 = WeatherState(u=full0.u, v=full0.v, h=full0.h)
        outs = []
        for donate in (False, True):
            sim = Simulation(jax.tree.map(jnp.copy, s0), tendency,
                             dt=0.01, method="rk4", grid=grid,
                             donate=donate)
            sim.step(20)
            outs.append(np.asarray(sim.state.h))
        np.testing.assert_array_equal(outs[0], outs[1])


class TestReflectiveOutflowBC:
    """ref declares BoundaryCondition::{Reflective,Outflow}
    (weather_sim.hpp:40-45) but never implements them; these are real."""

    def _sim(self, bc, steps=100, n=64):
        from njw_tpu.weather import SimConfig, Simulation

        cfg = SimConfig(grid_width=n, grid_height=n, dt=0.005,
                        integration_method="rk4",
                        boundary_condition=bc, backend="xla")
        # random IC: nonzero velocity AT the walls, so the reflective
        # ghost sign flip actually bites
        sim = Simulation.from_config(cfg, "random")
        sim.step(steps)
        return sim

    @pytest.mark.parametrize("bc", ["outflow", "reflective"])
    def test_matches_oracle(self, bc):
        from njw_tpu.weather import SimConfig, Simulation
        from njw_tpu.weather.grid import GridSpec
        from njw_tpu.weather.ics import make_initial_state
        from njw_tpu.weather.oracle import SWEOracle

        n = 48
        grid = GridSpec(nx=n, ny=n, bc=bc)
        s0 = make_initial_state("vortex", grid, strength=2.0)
        cfg = SimConfig(grid_width=n, grid_height=n, dt=0.005,
                        integration_method="rk4", boundary_condition=bc,
                        backend="xla", coriolis_f=1e-4)
        sim = Simulation.from_config(cfg, "vortex", strength=2.0)
        sim.step(200)
        u, v, h = SWEOracle(bc=bc, coriolis_f=1e-4).run(
            (np.asarray(s0.u), np.asarray(s0.v), np.asarray(s0.h)),
            0.005, 200, "rk4")
        np.testing.assert_allclose(np.asarray(sim.state.h), h,
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(sim.state.u), u,
                                   rtol=1e-4, atol=1e-4)

    def test_reflective_differs_from_outflow(self):
        a = self._sim("reflective")
        b = self._sim("outflow")
        assert float(np.abs(np.asarray(a.state.u)
                            - np.asarray(b.state.u)).max()) > 1e-6

    def test_reflective_wave_bounces(self):
        """A height bump in a closed (reflective) basin must keep its
        mass in the domain and stay finite after many wall reflections."""
        from njw_tpu.weather import SimConfig, Simulation

        n = 64
        cfg = SimConfig(grid_width=n, grid_height=n, dt=0.005,
                        integration_method="rk4",
                        boundary_condition="reflective", backend="xla")
        sim = Simulation.from_config(cfg, "mountain")
        m0 = float(np.asarray(sim.state.h).sum())
        sim.step(500)
        h = np.asarray(sim.state.h)
        assert np.isfinite(h).all()
        # mass drift tiny relative to total (no flux through walls)
        assert abs(float(h.sum()) - m0) / abs(m0) < 5e-3
