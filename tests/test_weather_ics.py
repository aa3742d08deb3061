"""Initial-condition registry tests (mirrors ref gtest coverage:
src/weather-sim/cpp/test/initial_conditions_test.cpp)."""
import numpy as np
import pytest

from njw_tpu.weather import GridSpec, make_initial_state
from njw_tpu.weather.ics import IC_REGISTRY

GRID = GridSpec(nx=64, ny=48)

ALL_ICS = sorted(IC_REGISTRY)


def test_registry_has_all_nine_reference_ics():
    """Same nine names as the reference factory
    (ref: initial_conditions.cpp:16-45)."""
    expected = {
        "uniform", "random", "zonal_flow", "vortex", "jet_stream",
        "breaking_wave", "front", "mountain", "atmospheric_profile",
    }
    assert expected <= set(IC_REGISTRY)


@pytest.mark.parametrize("name", ALL_ICS)
def test_ic_produces_finite_fields(name):
    s = make_initial_state(name, GRID)
    for f in (s.u, s.v, s.h):
        assert f.shape == GRID.shape
        assert np.all(np.isfinite(np.asarray(f)))


def test_unknown_ic_raises():
    with pytest.raises(ValueError, match="unknown initial condition"):
        make_initial_state("nope", GRID)


def test_uniform_values():
    s = make_initial_state("uniform", GRID, u=1.0, v=2.0, h=3.0)
    assert np.allclose(np.asarray(s.u), 1.0)
    assert np.allclose(np.asarray(s.v), 2.0)
    assert np.allclose(np.asarray(s.h), 3.0)


def test_random_is_seeded_and_bounded():
    a = make_initial_state("random", GRID, amplitude=0.5, seed=7)
    b = make_initial_state("random", GRID, amplitude=0.5, seed=7)
    c = make_initial_state("random", GRID, amplitude=0.5, seed=8)
    np.testing.assert_array_equal(np.asarray(a.u), np.asarray(b.u))
    assert not np.array_equal(np.asarray(a.u), np.asarray(c.u))
    assert np.max(np.abs(np.asarray(a.u))) <= 0.5
    assert np.min(np.asarray(a.h)) >= 9.5 and np.max(np.asarray(a.h)) <= 10.5


def test_zonal_flow_profile():
    s = make_initial_state("zonal_flow", GRID, u_max=10.0)
    u = np.asarray(s.u)
    # maximum at mid-latitude, ~zero at walls (ref: initial_conditions.cpp:158)
    assert u[GRID.ny // 2, 0] == pytest.approx(10.0, rel=1e-2)
    assert abs(u[0, 0]) < 1e-5
    assert np.allclose(np.asarray(s.v), 0.0)


def test_vortex_velocity_field_is_circular():
    s = make_initial_state("vortex", GRID, strength=10.0)
    u, v = np.asarray(s.u), np.asarray(s.v)
    # counter-clockwise circulation: +v east of center, -v west,
    # +u south of center, -u north (u = -w*dy/r, v = w*dx/r)
    cy = int(0.5 * (GRID.ny - 1))
    cx = int(0.5 * (GRID.nx - 1))
    r = 3
    assert v[cy, cx + r] > 0 > v[cy, cx - r]
    assert u[cy - r, cx] > 0 > u[cy + r, cx]
    # h dips below mean inside the vortex (cyclostrophic balance)
    assert np.min(np.asarray(s.h)) < 10.0


def test_front_sets_temperature_and_pressure():
    s = make_initial_state("front", GRID, temp_difference=10.0)
    T = np.asarray(s.T)
    p = np.asarray(s.p)
    # tanh transition: cold/high-pressure on one side, warm/low on the other
    assert T[0, 0] < T[-1, 0]
    assert p[0, 0] > p[-1, 0]
    assert T[0, 0] == pytest.approx(288.15 - 5.0, abs=0.2)


def test_mountain_bump_in_height():
    s = make_initial_state("mountain", GRID, height=2.0)
    h = np.asarray(s.h)
    assert h.max() == pytest.approx(12.0, abs=0.1)
    assert h.min() == pytest.approx(10.0, abs=1e-3)


@pytest.mark.parametrize("profile", ["standard", "tropical", "polar"])
def test_atmospheric_profiles(profile):
    s = make_initial_state("atmospheric_profile", GRID, profile_name=profile)
    T = np.asarray(s.T)
    # temperature decreases poleward (increasing y)
    assert T[:5].mean() > T[-5:].mean()
    assert np.asarray(s.q).min() >= -0.05
