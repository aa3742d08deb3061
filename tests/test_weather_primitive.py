"""Primitive-equations core: steady states, oracle match, conservation."""
import jax.numpy as jnp
import numpy as np
import pytest

from njw_tpu.weather import GridSpec, PhysicsParams, SimConfig, Simulation
from njw_tpu.weather.oracle import pe_tendencies_np
from njw_tpu.weather.primitive import (
    PEState, hydrostatic_geopotential, pe_initial_state, pe_tendencies,
    sigma_levels,
)

GRID = GridSpec(nx=48, ny=32, levels=5, dx=1e5, dy=1e5)  # 100 km cells
PARAMS = PhysicsParams(coriolis_f=1e-4)


class TestBasics:
    def test_sigma_levels(self):
        full, half = sigma_levels(4)
        np.testing.assert_allclose(np.asarray(full), [0.125, 0.375, 0.625, 0.875])
        np.testing.assert_allclose(np.asarray(half), [0, 0.25, 0.5, 0.75, 1.0])

    def test_geopotential_isothermal_column(self):
        """For uniform T, Phi_k = R T ln(1/sigma_k) exactly."""
        L = 8
        T = jnp.full((L, 4, 4), 250.0, jnp.float32)
        phi = hydrostatic_geopotential(T, L)
        sig, _ = sigma_levels(L)
        expected = 287.04 * 250.0 * (-np.log(np.asarray(sig)))
        np.testing.assert_allclose(
            np.asarray(phi[:, 0, 0]), expected, rtol=1e-5
        )
        # monotonic: higher levels (smaller sigma) have larger Phi
        assert np.all(np.diff(np.asarray(phi[:, 0, 0])) < 0)


class TestSteadyStates:
    def test_resting_isothermal_atmosphere_is_steady(self):
        """u=v=0, uniform T and ps: every tendency must vanish."""
        s = pe_initial_state(GRID, u_jet=0.0, lapse=0.0, deltaT_y=0.0)
        t = pe_tendencies(s, GRID, PARAMS)
        for name in ("u", "v", "T", "q", "ps"):
            np.testing.assert_allclose(
                np.asarray(getattr(t, name)), 0.0, atol=1e-5,
                err_msg=f"tendency {name} not zero in resting state",
            )

    def test_resting_stratified_atmosphere_is_steady(self):
        """Vertical stratification alone (no horizontal gradients) is
        steady: Phi gradient vanishes horizontally."""
        s = pe_initial_state(GRID, u_jet=0.0, lapse=60.0, deltaT_y=0.0)
        t = pe_tendencies(s, GRID, PARAMS)
        np.testing.assert_allclose(np.asarray(t.u), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(t.ps), 0.0, atol=1e-5)


class TestOracle:
    @pytest.mark.parametrize("bc", ["periodic", "clamped"])
    def test_tendencies_match_numpy_oracle(self, bc):
        grid = GridSpec(nx=48, ny=32, levels=5, dx=1e5, dy=1e5, bc=bc)
        s = pe_initial_state(grid, u_jet=15.0, perturb=1.0)
        t = pe_tendencies(s, grid, PARAMS)
        du, dv, dT, dq, dps = pe_tendencies_np(
            *(np.asarray(x) for x in (s.u, s.v, s.T, s.q, s.ps)),
            dx=grid.dx, dy=grid.dy, bc=bc, coriolis_f=1e-4,
        )
        np.testing.assert_allclose(np.asarray(t.u), du, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(t.v), dv, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(t.T), dT, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(t.q), dq, rtol=1e-4, atol=1e-8)
        np.testing.assert_allclose(np.asarray(t.ps), dps, rtol=1e-4, atol=1e-6)

    def test_rk4_oracle_1000_steps(self):
        """BASELINE.md:49-50 bar for the PE core: prognostic fields
        allclose with the independent NumPy CPU reference after 1000
        RK4 steps (mirrors test_weather_swe.test_rk4_oracle_1000_steps).
        Tolerance policy: per-field scale-normalized 1e-3 — measured
        f32 jnp-vs-numpy drift at this horizon is ~6e-5; a halo/shift
        bug shows up at O(1)."""
        from njw_tpu.weather.oracle import PEOracle

        cfg = SimConfig(model="primitive", grid_width=48, grid_height=48,
                        num_levels=4, dx=1e5, dy=1e5, dt=30.0,
                        coriolis_f=1e-4, backend="xla")
        sim = Simulation.from_config(cfg, "baroclinic", u_jet=10.0,
                                     perturb=0.5)
        s0 = tuple(np.asarray(getattr(sim.state, n)).copy()
                   for n in ("u", "v", "T", "q", "ps"))
        sim.step(1000)
        ref = PEOracle(dx=1e5, dy=1e5, bc="periodic",
                       coriolis_f=1e-4).run(s0, 30.0, 1000)
        for name, r in zip(("u", "v", "T", "q", "ps"), ref):
            a = np.asarray(getattr(sim.state, name))
            assert np.isfinite(a).all(), name
            scale = np.abs(r).max() + 1e-30
            np.testing.assert_allclose(a / scale, r / scale, rtol=0,
                                       atol=1e-3, err_msg=name)


class TestSimulation:
    def _cfg(self, **kw):
        base = dict(model="primitive", grid_width=48, grid_height=32,
                    num_levels=5, dx=1e5, dy=1e5, dt=30.0,
                    integration_method="rk4", coriolis_f=1e-4)
        base.update(kw)
        return SimConfig(**base)

    def test_runs_and_stays_finite(self):
        sim = Simulation.from_config(self._cfg(), "baroclinic", perturb=0.5)
        sim.step(100)
        for f in (sim.state.u, sim.state.T, sim.state.ps):
            assert np.all(np.isfinite(np.asarray(f)))
        # surface pressure should stay near its initial value
        ps = np.asarray(sim.state.ps)
        assert 900.0 < ps.mean() < 1100.0

    def test_mass_conservation(self):
        """sum(ps) is conserved (flux-form continuity telescopes)."""
        sim = Simulation.from_config(self._cfg(), "baroclinic", perturb=0.5)
        m0 = float(np.asarray(sim.state.ps, np.float64).sum())
        sim.step(50)
        m1 = float(np.asarray(sim.state.ps, np.float64).sum())
        assert abs(m1 - m0) / m0 < 1e-5

    def test_jet_generates_meridional_flow(self):
        """Unbalanced jet must excite v (geostrophic adjustment)."""
        sim = Simulation.from_config(self._cfg(), "baroclinic")
        assert float(jnp.max(jnp.abs(sim.state.v))) == 0.0
        sim.step(20)
        assert float(jnp.max(jnp.abs(sim.state.v))) > 0.0

    def test_snapshots_contain_pe_fields(self):
        sim = Simulation.from_config(self._cfg(), "baroclinic")
        sim.run(10, output_interval=5)
        assert set(sim.snapshots[0]) >= {"u", "v", "T", "q", "ps"}


class TestPEPallasKernel:
    def test_stage_matches_xla(self):
        """Fused PE tendency+axpy kernel == XLA path (interpret mode)."""
        import jax

        from njw_tpu.ops.pe_stencil import pe_stage_pallas

        grid = GridSpec(nx=128, ny=32, levels=5, dx=1e5, dy=1e5)
        s = pe_initial_state(grid, u_jet=10.0, perturb=0.5)
        out = pe_stage_pallas(s, s, grid=grid, c_dt=15.0, coriolis_f=1e-4,
                              by=8, interpret=True)
        t = pe_tendencies(s, grid, PARAMS)
        ref = jax.tree.map(lambda b, k: b + 15.0 * k, s, t)
        for name in ("u", "v", "T", "q", "ps"):
            np.testing.assert_allclose(
                np.asarray(getattr(out, name)),
                np.asarray(getattr(ref, name)),
                rtol=1e-5, atol=1e-4, err_msg=name)

    def test_rk4_stepper_matches_xla_rk4(self):
        import jax.numpy as jnp

        from njw_tpu.ops.pe_stencil import make_pe_pallas_rk4_stepper
        from njw_tpu.weather.integrators import make_stepper

        grid = GridSpec(nx=128, ny=32, levels=4, dx=1e5, dy=1e5)
        s = pe_initial_state(grid, u_jet=10.0, perturb=0.5)
        pallas_st = make_pe_pallas_rk4_stepper(grid, PARAMS, dt=30.0,
                                               interpret=True)
        _, out_p = pallas_st.step((), s, None)
        xla_st = make_stepper("rk4", lambda x: pe_tendencies(x, grid, PARAMS))
        _, out_x = xla_st.step((), s, jnp.float32(30.0))
        for name in ("u", "v", "T", "ps"):
            np.testing.assert_allclose(
                np.asarray(getattr(out_p, name)),
                np.asarray(getattr(out_x, name)),
                rtol=1e-5, atol=1e-4, err_msg=name)

    def test_fused_rk4_x_blocked_matches_xla(self):
        """Whole-RK4 fused kernel with bx < nx and multiple row blocks
        (corner slabs live — halo rows' x pads feed interior outputs
        after multi-stage chaining) == XLA RK4 step."""
        import jax.numpy as jnp

        from njw_tpu.ops.pe_stencil import pe_rk4_step_pallas
        from njw_tpu.weather.integrators import make_stepper

        grid = GridSpec(nx=256, ny=32, levels=4, dx=1e5, dy=1e5)
        s = pe_initial_state(grid, u_jet=10.0, perturb=0.5)
        out_p = pe_rk4_step_pallas(s, grid=grid, dt=30.0,
                                   coriolis_f=1e-4, by=8, bx=128,
                                   interpret=True)
        xla_st = make_stepper("rk4",
                              lambda x: pe_tendencies(x, grid, PARAMS))
        _, out_x = xla_st.step((), s, jnp.float32(30.0))
        for name in ("u", "v", "T", "q", "ps"):
            np.testing.assert_allclose(
                np.asarray(getattr(out_p, name)),
                np.asarray(getattr(out_x, name)),
                rtol=1e-5, atol=1e-4, err_msg=name)

    def test_fused_rk4_multi_step_stays_close(self):
        """5 fused whole-RK4 steps track the XLA stepper."""
        import jax.numpy as jnp

        from njw_tpu.ops.pe_stencil import pe_rk4_step_pallas
        from njw_tpu.weather.integrators import make_stepper

        grid = GridSpec(nx=128, ny=32, levels=3, dx=1e5, dy=1e5)
        sp = sx = pe_initial_state(grid, u_jet=8.0, perturb=0.4)
        xla_st = make_stepper("rk4",
                              lambda x: pe_tendencies(x, grid, PARAMS))
        for _ in range(5):
            sp = pe_rk4_step_pallas(sp, grid=grid, dt=20.0,
                                    coriolis_f=1e-4, by=8, bx=128,
                                    interpret=True)
            _, sx = xla_st.step((), sx, jnp.float32(20.0))
        np.testing.assert_allclose(np.asarray(sp.ps), np.asarray(sx.ps),
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(sp.u), np.asarray(sx.u),
                                   rtol=1e-3, atol=1e-3)

    def test_stage_x_blocked_matches_xla(self):
        """x-blocked path (bx < nx, 128-lane halo slabs) == XLA path —
        the BASELINE config-5 enabler (r2)."""
        import jax

        from njw_tpu.ops.pe_stencil import pe_stage_pallas

        grid = GridSpec(nx=256, ny=16, levels=4, dx=1e5, dy=1e5)
        s = pe_initial_state(grid, u_jet=10.0, perturb=0.5)
        out = pe_stage_pallas(s, s, grid=grid, c_dt=15.0, coriolis_f=1e-4,
                              by=8, bx=128, interpret=True)
        t = pe_tendencies(s, grid, PARAMS)
        ref = jax.tree.map(lambda b, k: b + 15.0 * k, s, t)
        for name in ("u", "v", "T", "q", "ps"):
            np.testing.assert_allclose(
                np.asarray(getattr(out, name)),
                np.asarray(getattr(ref, name)),
                rtol=1e-5, atol=1e-4, err_msg=name)

    def test_stage_local_matches_xla(self):
        """Halo-padded local variant (the sharded fast path) == XLA path
        when fed true periodic halos."""
        import jax

        from njw_tpu.ops.pe_stencil import pe_stage_pallas_local

        grid = GridSpec(nx=128, ny=32, levels=4, dx=1e5, dy=1e5)
        s = pe_initial_state(grid, u_jet=10.0, perturb=0.5)

        def pad8(f):
            return jnp.concatenate(
                [f[..., -8:, :], f, f[..., :8, :]], axis=-2)

        out = pe_stage_pallas_local(
            pad8(s.u), pad8(s.v), pad8(s.T), pad8(s.q), pad8(s.ps), s,
            ly=32, nx=128, L=4, c_dt=15.0, coriolis_f=1e-4,
            dx=1e5, dy=1e5, by=8, interpret=True)
        t = pe_tendencies(s, grid, PARAMS)
        ref = jax.tree.map(lambda b, k: b + 15.0 * k, s, t)
        for name in ("u", "v", "T", "q", "ps"):
            np.testing.assert_allclose(
                np.asarray(getattr(out, name)),
                np.asarray(getattr(ref, name)),
                rtol=1e-5, atol=1e-4, err_msg=name)

    def test_supported_predicate(self):
        from njw_tpu.ops.pe_stencil import pe_pallas_supported

        assert pe_pallas_supported(
            GridSpec(nx=512, ny=512, levels=20, dx=1e5, dy=1e5), PARAMS)
        # BASELINE config 5 must now be eligible (x-blocking, r2)
        assert pe_pallas_supported(
            GridSpec(nx=2048, ny=2048, levels=40, dx=1e5, dy=1e5), PARAMS)
        assert not pe_pallas_supported(
            GridSpec(nx=100, ny=512, levels=20), PARAMS)  # nx%128
        assert not pe_pallas_supported(
            GridSpec(nx=512, ny=512, levels=20, bc="clamped"), PARAMS)


class TestPETerrain:
    """Non-flat lower boundary (orography) for the PE core — ROADMAP r1;
    the reference has no terrain anywhere."""

    def _mountain(self, grid, height_gp=2000.0):
        y, x = np.mgrid[0:grid.ny, 0:grid.nx].astype(np.float32)
        cy, cx = (grid.ny - 1) / 2, (grid.nx - 1) / 2
        return height_gp * np.exp(-(((y - cy) / 6) ** 2
                                    + ((x - cx) / 6) ** 2))

    def test_resting_isothermal_atmosphere_stays_at_rest(self):
        """The classic pressure-gradient-error test: with uniform T and
        hydrostatically-adjusted ps, the discrete PGF over terrain must
        cancel EXACTLY (phi_x = -R T lnps_x term by term)."""
        from njw_tpu.weather.primitive import (
            pe_initial_state, pe_tendencies,
        )

        grid = GridSpec(nx=48, ny=32, levels=5, dx=1e5, dy=1e5)
        phi_s = jnp.asarray(self._mountain(grid))
        s = pe_initial_state(grid, u_jet=0.0, lapse=0.0, deltaT_y=0.0,
                             phi_s=phi_s)
        t = pe_tendencies(s, grid, PARAMS, phi_s=phi_s)
        assert float(jnp.max(jnp.abs(t.u))) < 1e-3
        assert float(jnp.max(jnp.abs(t.v))) < 1e-3

    def test_matches_oracle_with_terrain(self):
        from njw_tpu.weather.oracle import pe_tendencies_np
        from njw_tpu.weather.primitive import (
            pe_initial_state, pe_tendencies,
        )

        grid = GridSpec(nx=48, ny=32, levels=4, dx=1e5, dy=1e5)
        phi_s = self._mountain(grid, 1500.0)
        s = pe_initial_state(grid, u_jet=10.0, perturb=0.5,
                             phi_s=jnp.asarray(phi_s))
        t = pe_tendencies(s, grid, PARAMS, phi_s=jnp.asarray(phi_s))
        ref = pe_tendencies_np(
            np.asarray(s.u), np.asarray(s.v), np.asarray(s.T),
            np.asarray(s.q), np.asarray(s.ps), dx=1e5, dy=1e5,
            bc="periodic", coriolis_f=1e-4, phi_s=phi_s)
        for got, want, name in zip((t.u, t.v, t.T, t.ps),
                                   (ref[0], ref[1], ref[2], ref[4]),
                                   ("u", "v", "T", "ps")):
            np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4,
                                       atol=1e-4, err_msg=name)

    def test_sim_factory_with_orography(self):
        from njw_tpu.weather import SimConfig, Simulation

        grid_n = 48
        cfg = SimConfig(model="primitive", grid_width=grid_n,
                        grid_height=32, num_levels=4, dx=1e5, dy=1e5,
                        dt=20.0, coriolis_f=1e-4, backend="auto")
        g = GridSpec(nx=grid_n, ny=32, levels=4, dx=1e5, dy=1e5)
        phi_s = self._mountain(g, 1000.0)
        sim = Simulation.from_config(cfg, "baroclinic", u_jet=8.0,
                                     orography=phi_s)
        sim.step(10)
        assert bool(jnp.isfinite(sim.state.ps).all())
        # flow over the mountain generates vertical structure
        assert float(jnp.max(jnp.abs(sim.state.v))) > 0.0

    def test_stage_kernel_carries_terrain(self):
        """The fused PE stage kernel with phi_s == the XLA tendency path
        with terrain (interpret mode) — r2 fast-path exclusion closed."""
        from njw_tpu.ops.pe_stencil import pe_stage_pallas
        from njw_tpu.weather.primitive import (
            pe_initial_state, pe_tendencies,
        )

        grid = GridSpec(nx=128, ny=32, levels=4, dx=1e5, dy=1e5)
        phi_s = jnp.asarray(self._mountain(grid, 1500.0))
        s = pe_initial_state(grid, u_jet=8.0, perturb=0.5, phi_s=phi_s)
        c = 13.0
        got = pe_stage_pallas(s, s, grid=grid, c_dt=c, coriolis_f=1e-4,
                              by=8, bx=128, phi_s=phi_s, interpret=True)
        t = pe_tendencies(s, grid, PARAMS, phi_s=phi_s)
        import jax

        want = jax.tree.map(lambda a, b: a + c * b, s, t)
        for name in ("u", "v", "T", "q", "ps"):
            np.testing.assert_allclose(
                np.asarray(getattr(got, name)),
                np.asarray(getattr(want, name)),
                rtol=2e-4, atol=2e-4, err_msg=name)

    def test_pallas_stepper_with_terrain_matches_xla_rk4(self):
        """Full RK4 step via the terrain-carrying kernel == the XLA
        integrator with orography (backend='pallas' forces interpret)."""
        from njw_tpu.weather import SimConfig, Simulation

        grid_n = 128
        cfg_p = SimConfig(model="primitive", grid_width=grid_n,
                          grid_height=32, num_levels=3, dx=1e5, dy=1e5,
                          dt=20.0, coriolis_f=1e-4, backend="pallas")
        cfg_x = SimConfig(model="primitive", grid_width=grid_n,
                          grid_height=32, num_levels=3, dx=1e5, dy=1e5,
                          dt=20.0, coriolis_f=1e-4, backend="xla")
        g = GridSpec(nx=grid_n, ny=32, levels=3, dx=1e5, dy=1e5)
        phi_s = self._mountain(g, 1000.0)
        kw = dict(u_jet=6.0, perturb=0.3, orography=phi_s)
        sp = Simulation.from_config(cfg_p, "baroclinic", **kw)
        sx = Simulation.from_config(cfg_x, "baroclinic", **kw)
        assert sp.stepper.name in ("pe_rk4_pallas",
                                   "pe_rk4_pallas_fused")
        sp.step(5)
        sx.step(5)
        np.testing.assert_allclose(np.asarray(sp.state.ps),
                                   np.asarray(sx.state.ps),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sp.state.u),
                                   np.asarray(sx.state.u),
                                   rtol=1e-4, atol=1e-4)


class TestPEReflective:
    """Reflective (no-flux wall) BC for the PE core — VERDICT r2 weak #5.
    The wall-normal velocity ghost flips sign, same rule as the SWE core
    (ref BC enum: weather_sim.hpp:40-45)."""

    def _grid(self, bc):
        return GridSpec(nx=48, ny=32, levels=5, dx=1e5, dy=1e5, bc=bc)

    def _state(self, grid):
        # nonzero winds AT the walls so the ghost sign flip matters
        s = pe_initial_state(grid, u_jet=15.0, perturb=1.0)
        v = s.v + 3.0 * jnp.sin(
            jnp.arange(grid.nx, dtype=jnp.float32) / 5.0)[None, None, :]
        return PEState(u=s.u, v=v, T=s.T, q=s.q, ps=s.ps)

    def test_tendencies_match_numpy_oracle(self):
        grid = self._grid("reflective")
        s = self._state(grid)
        t = pe_tendencies(s, grid, PARAMS)
        du, dv, dT, dq, dps = pe_tendencies_np(
            *(np.asarray(x) for x in (s.u, s.v, s.T, s.q, s.ps)),
            dx=grid.dx, dy=grid.dy, bc="reflective", coriolis_f=1e-4,
        )
        np.testing.assert_allclose(np.asarray(t.u), du, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(t.v), dv, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(t.T), dT, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(t.q), dq, rtol=1e-4, atol=1e-8)
        np.testing.assert_allclose(np.asarray(t.ps), dps, rtol=1e-4,
                                   atol=1e-6)

    def test_reflective_differs_from_outflow(self):
        s = self._state(self._grid("reflective"))
        t_r = pe_tendencies(s, self._grid("reflective"), PARAMS)
        t_o = pe_tendencies(s, self._grid("outflow"), PARAMS)
        assert not np.allclose(np.asarray(t_r.u), np.asarray(t_o.u))

    def test_closed_basin_conserves_mass(self):
        """No-flux walls: sum(ps) telescopes to exact conservation
        (the flipped ghost makes the boundary flux antisymmetric)."""
        from njw_tpu.weather import SimConfig, Simulation

        cfg = SimConfig(model="primitive", grid_width=48, grid_height=32,
                        num_levels=5, dx=1e5, dy=1e5, dt=30.0,
                        coriolis_f=1e-4, boundary_condition="reflective")
        sim = Simulation.from_config(cfg, "baroclinic", u_jet=10.0,
                                     perturb=0.5)
        m0 = float(np.asarray(sim.state.ps, np.float64).sum())
        sim.step(50)
        assert np.all(np.isfinite(np.asarray(sim.state.ps)))
        m1 = float(np.asarray(sim.state.ps, np.float64).sum())
        assert abs(m1 - m0) / m0 < 1e-5


class TestPESemiImplicit:
    """Semi-implicit PE stepper: vertical-normal-mode Helmholtz solve
    (ref declares SemiImplicit for all models at weather_sim.hpp:50-56 and
    falls back to Euler at weather_simulation.cpp:465-471)."""

    def _cfg(self, dt, method="semi_implicit"):
        from njw_tpu.weather import SimConfig

        return SimConfig(model="primitive", grid_width=48, grid_height=32,
                         num_levels=5, dx=1e5, dy=1e5, dt=dt,
                         integration_method=method, coriolis_f=1e-4)

    def test_resting_state_stays_resting(self):
        from njw_tpu.weather import Simulation

        sim = Simulation.from_config(self._cfg(600.0), "resting")
        sim.step(10)
        # bound is f32 FFT-roundtrip rounding (2 solves/step since the
        # r5 order-2 predictor-corrector), not physical drift
        assert float(jnp.max(jnp.abs(sim.state.u))) < 3e-4
        assert float(jnp.max(jnp.abs(sim.state.v))) < 3e-4

    def test_small_dt_consistency_with_rk4(self):
        """At dt << CFL both methods integrate the same ODE: states agree
        to the O(dt^2) truncation difference."""
        from njw_tpu.weather import Simulation

        kw = dict(u_jet=8.0, perturb=0.5)
        si = Simulation.from_config(self._cfg(5.0), "baroclinic", **kw)
        rk = Simulation.from_config(self._cfg(5.0, "rk4"), "baroclinic",
                                    **kw)
        si.step(40)
        rk.step(40)
        np.testing.assert_allclose(np.asarray(si.state.ps),
                                   np.asarray(rk.state.ps), rtol=2e-4)
        np.testing.assert_allclose(np.asarray(si.state.u),
                                   np.asarray(rk.state.u), atol=2e-2)

    def test_stable_beyond_explicit_gravity_wave_cfl(self):
        """The point of the method: the external (Lamb) mode at
        ~sqrt(R T) ~ 290 m/s limits explicit dt to ~dx/(c sqrt(2)) ~ 240 s
        on this grid; semi-implicit must survive a dt several times that
        while explicit euler blows up."""
        from njw_tpu.weather import Simulation

        dt_big = 900.0
        si = Simulation.from_config(self._cfg(dt_big), "baroclinic",
                                    u_jet=5.0, perturb=0.5)
        si.step(50)
        assert np.all(np.isfinite(np.asarray(si.state.ps)))
        assert np.all(np.isfinite(np.asarray(si.state.u)))

        eu = Simulation.from_config(self._cfg(dt_big, "euler"),
                                    "baroclinic", u_jet=5.0, perturb=0.5)
        eu.step(50)
        assert not np.all(np.isfinite(np.asarray(eu.state.ps)))
