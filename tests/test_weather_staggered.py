"""Arakawa C-grid (staggered) SWE core: the conservation properties the
scheme exists for, and the computational-mode superiority over the A-grid
(ref declares GridType::Staggered at weather_sim.hpp:61-66 and never
implements any non-Cartesian grid)."""
import jax.numpy as jnp
import numpy as np
import pytest

from njw_tpu.weather import (
    GridSpec, PhysicsParams, SimConfig, Simulation, WeatherState,
)
from njw_tpu.weather.staggered import (
    geostrophic_balance_state, potential_enstrophy, swe_tendencies_cgrid,
    total_energy,
)

GRID = GridSpec(nx=64, ny=64, grid_type="staggered")
PARAMS = PhysicsParams(coriolis_f=1e-4)


def _smooth_state(grid, amp=0.2, depth=10.0, seed=3):
    """Smooth periodic random-ish state (low-wavenumber superposition)."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:grid.ny, 0:grid.nx]
    f = np.zeros((grid.ny, grid.nx))
    g = np.zeros_like(f)
    hh = np.zeros_like(f)
    for _ in range(4):
        ky, kx = rng.integers(1, 4, 2)
        py, px = rng.uniform(0, 2 * np.pi, 2)
        f += rng.normal() * np.sin(2 * np.pi * ky * y / grid.ny + py) \
            * np.cos(2 * np.pi * kx * x / grid.nx + px)
        g += rng.normal() * np.cos(2 * np.pi * kx * y / grid.ny + px) \
            * np.sin(2 * np.pi * ky * x / grid.nx + py)
        hh += rng.normal() * np.sin(2 * np.pi * kx * x / grid.nx + py) \
            * np.sin(2 * np.pi * ky * y / grid.ny + px)
    return WeatherState(
        u=jnp.asarray(amp * f, jnp.float32),
        v=jnp.asarray(amp * g, jnp.float32),
        h=jnp.asarray(depth + amp * hh, jnp.float32))


def _rk4_run(s, grid, params, dt, n):
    from njw_tpu.weather.integrators import make_stepper

    st = make_stepper("rk4", lambda x: swe_tendencies_cgrid(x, grid,
                                                            params))
    for _ in range(n):
        _, s = st.step((), s, jnp.float32(dt))
    return s


class TestConservation:
    def test_mass_tendency_is_exactly_zero(self):
        """Flux-form continuity telescopes: sum(dh) == 0 to rounding."""
        s = _smooth_state(GRID)
        t = swe_tendencies_cgrid(s, GRID, PARAMS)
        dh = np.asarray(t.h, np.float64)
        assert abs(dh.sum()) < 1e-3 * np.abs(dh).sum()

    def test_mass_conserved_over_run(self):
        s = _smooth_state(GRID)
        m0 = float(np.asarray(s.h, np.float64).sum())
        s = _rk4_run(s, GRID, PARAMS, 0.005, 200)
        assert np.isfinite(np.asarray(s.h)).all()
        m1 = float(np.asarray(s.h, np.float64).sum())
        assert abs(m1 - m0) / m0 < 1e-6

    def test_energy_near_conserved(self):
        """Total energy drift stays small over 500 RK4 steps (spatially
        the scheme conserves energy only approximately — Sadourny's
        enstrophy form — but drift must be far below advective mixing)."""
        s = _smooth_state(GRID)
        e0 = float(total_energy(s, GRID, PARAMS))
        s = _rk4_run(s, GRID, PARAMS, 0.005, 500)
        e1 = float(total_energy(s, GRID, PARAMS))
        assert abs(e1 - e0) / abs(e0) < 5e-3

    def test_potential_enstrophy_conserved(self):
        """The invariant of Sadourny's enstrophy form."""
        s = _smooth_state(GRID)
        z0 = float(potential_enstrophy(s, GRID, PARAMS))
        s = _rk4_run(s, GRID, PARAMS, 0.005, 500)
        z1 = float(potential_enstrophy(s, GRID, PARAMS))
        assert abs(z1 - z0) / abs(z0) < 5e-3


class TestBalance:
    def test_geostrophic_state_stays_balanced(self):
        """A discretely balanced state must not fall apart: after many
        steps the height field stays within a few % of the initial
        perturbation amplitude."""
        grid = GridSpec(nx=64, ny=64, dx=1e4, dy=1e4,
                        grid_type="staggered")
        params = PhysicsParams(coriolis_f=1e-4)
        amp = 0.1
        s0 = geostrophic_balance_state(grid, params, amplitude=amp)
        s = _rk4_run(s0, grid, params, dt=50.0, n=200)
        drift = float(jnp.max(jnp.abs(s.h - s0.h)))
        assert drift < 0.15 * amp


class TestComputationalMode:
    def test_cgrid_sees_checkerboard_the_agrid_cannot(self):
        """The A-grid central difference is BLIND to a 2-cell checkerboard
        in h (its null mode — the reason staggered grids exist); the
        C-grid's compact gradient responds to it."""
        from njw_tpu.weather.dynamics import swe_tendencies

        ny = nx = 32
        y, x = np.mgrid[0:ny, 0:nx]
        checker = 10.0 + 0.5 * ((-1.0) ** (x + y)).astype(np.float32)
        z = jnp.zeros((ny, nx), jnp.float32)
        s = WeatherState(u=z, v=z, h=jnp.asarray(checker))

        a_grid = GridSpec(nx=nx, ny=ny)
        t_a = swe_tendencies(s, a_grid, PhysicsParams())
        assert float(jnp.max(jnp.abs(t_a.u))) < 1e-6  # blind

        c_grid = GridSpec(nx=nx, ny=ny, grid_type="staggered")
        t_c = swe_tendencies_cgrid(s, c_grid, PhysicsParams())
        assert float(jnp.max(jnp.abs(t_c.u))) > 1.0   # sees it


class TestDriverIntegration:
    def test_simulation_runs_and_conserves_mass(self):
        cfg = SimConfig(grid_width=64, grid_height=64, dt=0.005,
                        grid_type="staggered", coriolis_f=1e-4)
        sim = Simulation.from_config(cfg, "vortex", strength=2.0)
        assert sim.stepper.name == "rk4"   # XLA path (no Pallas for C-grid)
        m0 = float(np.asarray(sim.state.h, np.float64).sum())
        sim.step(100)
        assert np.isfinite(np.asarray(sim.state.h)).all()
        m1 = float(np.asarray(sim.state.h, np.float64).sum())
        assert abs(m1 - m0) / m0 < 1e-6

    def test_nonperiodic_staggered_rejected(self):
        with pytest.raises(ValueError, match="periodic-only"):
            GridSpec(nx=32, ny=32, grid_type="staggered",
                     bc="clamped").validate()

    def test_unknown_grid_type_rejected(self):
        with pytest.raises(ValueError, match="unknown grid type"):
            GridSpec(nx=32, ny=32, grid_type="icosahedral").validate()
