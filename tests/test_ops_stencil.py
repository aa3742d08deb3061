"""Fused Pallas RK4 SWE kernel vs the XLA integrator (interpret mode on
CPU; the same kernel compiles natively on TPU — see bench.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from njw_tpu.ops.stencil import (
    pallas_supported, swe_rk4_step_pallas, _pick_by,
)
from njw_tpu.weather import (
    GridSpec, PhysicsParams, SimConfig, Simulation, WeatherState,
    make_initial_state, make_tendency_fn,
)
from njw_tpu.weather.integrators import make_stepper


GRID = GridSpec(nx=128, ny=64)
PARAMS = PhysicsParams(coriolis_f=1e-4)


def _xla_rk4(s, dt, grid=GRID, params=PARAMS):
    st = make_stepper("rk4", make_tendency_fn("shallow_water", grid, params))
    _, out = st.step((), s, jnp.float32(dt))
    return out


class TestFusedKernel:
    @pytest.mark.parametrize("by", [8, 16, 32])
    def test_matches_xla_rk4(self, by):
        s = make_initial_state("vortex", GRID, strength=2.0)
        dt = 0.01
        u, v, h = swe_rk4_step_pallas(
            s.u, s.v, s.h, grid=GRID, dt=dt, coriolis_f=1e-4, by=by,
            interpret=True,
        )
        ref = _xla_rk4(WeatherState(u=s.u, v=s.v, h=s.h), dt)
        np.testing.assert_allclose(np.asarray(u), np.asarray(ref.u),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(v), np.asarray(ref.v),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(h), np.asarray(ref.h),
                                   rtol=1e-5, atol=1e-6)

    def test_multi_step_stays_close(self):
        s = make_initial_state("breaking_wave", GRID, amplitude=0.3)
        dt = 0.005
        u, v, h = s.u, s.v, s.h
        ref = WeatherState(u=u, v=v, h=h)
        for _ in range(5):
            u, v, h = swe_rk4_step_pallas(
                u, v, h, grid=GRID, dt=dt, by=16, interpret=True
            )
            ref = _xla_rk4(ref, dt, GRID, PhysicsParams())
        # note: kernel built with f=0 here, matching PhysicsParams()
        np.testing.assert_allclose(np.asarray(h), np.asarray(ref.h),
                                   rtol=1e-4, atol=1e-5)

    def test_folded_variant_matches_base(self):
        """Scale-folded tendency (fewer VPU mults) == base arithmetic to
        float rounding."""
        s = make_initial_state("vortex", GRID, strength=2.0)
        base = swe_rk4_step_pallas(s.u, s.v, s.h, grid=GRID, dt=0.01,
                                   coriolis_f=1e-4, by=16, interpret=True)
        fold = swe_rk4_step_pallas(s.u, s.v, s.h, grid=GRID, dt=0.01,
                                   coriolis_f=1e-4, by=16, interpret=True,
                                   variant="folded")
        for a, b in zip(base, fold):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_slices_variant_matches_base(self):
        """Static slice+concat shifts (the r4 default: +25% on v5e,
        BENCH_NOTES) == dynamic-rotate arithmetic to float rounding."""
        s = make_initial_state("vortex", GRID, strength=2.0)
        base = swe_rk4_step_pallas(s.u, s.v, s.h, grid=GRID, dt=0.01,
                                   coriolis_f=1e-4, by=16, interpret=True,
                                   variant="base")
        sl = swe_rk4_step_pallas(s.u, s.v, s.h, grid=GRID, dt=0.01,
                                 coriolis_f=1e-4, by=16, interpret=True,
                                 variant="slices")
        for a, b in zip(base, sl):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_bf16_variant_within_documented_band(self):
        s = make_initial_state("vortex", GRID, strength=2.0)
        ref = _xla_rk4(WeatherState(u=s.u, v=s.v, h=s.h), 0.01)
        u, v, h = swe_rk4_step_pallas(s.u, s.v, s.h, grid=GRID, dt=0.01,
                                      coriolis_f=1e-4, by=16,
                                      interpret=True, variant="bf16")
        scale = float(jnp.max(jnp.abs(ref.h)))
        assert float(jnp.max(jnp.abs(h - ref.h))) / scale < 2e-2
        # and it must actually differ from f32 (the cast happened)
        assert float(jnp.max(jnp.abs(h - ref.h))) > 0

    def test_viscosity_in_kernel_matches_xla(self):
        """The 5-point Laplacian viscosity term runs IN the fused kernel
        (r2 exclusion closed)."""
        nu = 0.02
        params = PhysicsParams(coriolis_f=1e-4, viscosity=nu)
        s = make_initial_state("vortex", GRID, strength=2.0)
        u, v, h = swe_rk4_step_pallas(s.u, s.v, s.h, grid=GRID, dt=0.01,
                                      coriolis_f=1e-4, viscosity=nu,
                                      by=16, interpret=True)
        ref = _xla_rk4(WeatherState(u=s.u, v=s.v, h=s.h), 0.01,
                       params=params)
        np.testing.assert_allclose(np.asarray(u), np.asarray(ref.u),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(h), np.asarray(ref.h),
                                   rtol=1e-5, atol=1e-6)

    def test_viscous_config_now_eligible(self):
        assert pallas_supported(GRID,
                                PhysicsParams(coriolis_f=1e-4,
                                              viscosity=0.01),
                                "shallow_water", "rk4")

    def test_rejects_bad_shapes(self):
        grid = GridSpec(nx=100, ny=64)  # nx not multiple of 128
        z = jnp.zeros((64, 100), jnp.float32)
        with pytest.raises(ValueError, match="nx%128"):
            swe_rk4_step_pallas(z, z, z, grid=grid, dt=0.01, interpret=True)


class TestEligibility:
    def test_supported_configuration(self):
        assert pallas_supported(GRID, PARAMS, "shallow_water", "rk4")

    @pytest.mark.parametrize(
        "grid,params,model,method",
        [
            (GridSpec(nx=128, ny=64, bc="clamped"), PARAMS, "shallow_water", "rk4"),
            (GRID, PARAMS, "barotropic", "rk4"),
            (GRID, PARAMS, "shallow_water", "rk2"),
            (GRID, PhysicsParams(beta=0.1), "shallow_water", "rk4"),
            (GridSpec(nx=100, ny=64), PARAMS, "shallow_water", "rk4"),
        ],
    )
    def test_unsupported_falls_back(self, grid, params, model, method):
        assert not pallas_supported(grid, params, model, method)

    def test_simulation_backend_pallas_interpret(self):
        cfg = SimConfig(grid_width=128, grid_height=64, dt=0.01,
                        backend="pallas", coriolis_f=1e-4)
        sim = Simulation.from_config(cfg, "vortex", strength=2.0)
        assert sim.stepper.name == "rk4_pallas"
        sim.step(3)
        assert np.all(np.isfinite(np.asarray(sim.state.h)))

        cfg_x = SimConfig(grid_width=128, grid_height=64, dt=0.01,
                          backend="xla", coriolis_f=1e-4)
        sim_x = Simulation.from_config(cfg_x, "vortex", strength=2.0)
        sim_x.step(3)
        np.testing.assert_allclose(
            np.asarray(sim.state.h), np.asarray(sim_x.state.h),
            rtol=1e-5, atol=1e-6,
        )


def test_pick_by_respects_vmem():
    # with the raised scoped-vmem cap, 2048^2 selects the measured-fastest
    # 64-row strips; tiny grids still get valid divisors
    assert _pick_by(2048, 2048, 16 << 20) == 64
    assert _pick_by(64, 128, 16 << 20) >= 8


def test_multistep_fused_matches_two_single_steps():
    """2 fused RK4 steps == 2 applications of the 1-step kernel exactly."""
    from njw_tpu.ops.stencil import swe_rk4_multistep_pallas

    s = make_initial_state("vortex", GRID, strength=2.0)
    dt = 0.01
    # variant='base' (rolls): the multistep kernel uses rolls, and the
    # comparison is bit-exact only like-for-like (slices differ by FMA
    # contraction order, ~1 ulp)
    u, v, h = swe_rk4_step_pallas(s.u, s.v, s.h, grid=GRID, dt=dt,
                                  coriolis_f=1e-4, by=16, interpret=True,
                                  variant="base")
    u, v, h = swe_rk4_step_pallas(u, v, h, grid=GRID, dt=dt,
                                  coriolis_f=1e-4, by=16, interpret=True,
                                  variant="base")
    u2, v2, h2 = swe_rk4_multistep_pallas(
        s.u, s.v, s.h, grid=GRID, dt=dt, coriolis_f=1e-4, by=16,
        n_fused=2, interpret=True)
    np.testing.assert_array_equal(np.asarray(h2), np.asarray(h))
    np.testing.assert_array_equal(np.asarray(u2), np.asarray(u))
