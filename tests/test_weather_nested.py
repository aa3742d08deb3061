"""Two-way nested-grid SWE tests.

The reference road-maps refined grids (GridType enum,
ref: weather_sim.hpp:61-66) but never implements them; these tests pin the
TPU-native implementation: exact transfer operators, steady-state
preservation under nesting, and the capability claim itself — the nested
run must beat the plain coarse run against a uniformly fine truth.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from njw_tpu.weather.grid import GridSpec, PhysicsParams, WeatherState
from njw_tpu.weather.model import SimConfig, Simulation
from njw_tpu.weather.nested import (
    NestedGrid,
    NestedState,
    make_nested_sim,
    make_nested_swe_stepper,
)


def _grid(n, dx=1.0, bc="periodic"):
    return GridSpec(nx=n, ny=n, dx=dx, dy=dx, bc=bc)


def test_prolong_restrict_linear_exact():
    """Bilinear prolongation and box restriction are exact on linear
    fields, and restrict(prolong(f)) == f on the patch cells."""
    g = _grid(32)
    nest = NestedGrid(g, patch=(8, 24, 6, 22), ratio=2)
    y, x = np.meshgrid(np.arange(32.0), np.arange(32.0), indexing="ij")
    f = jnp.asarray(1.5 + 0.25 * x - 0.125 * y, dtype=jnp.float32)

    fine = nest.prolong(f)
    assert fine.shape == (32, 32)
    # fine cell (j, p) sits at coarse coordinate j0 + (p+0.5)/r - 0.5
    yy = 8.0 + (np.arange(32) + 0.5) / 2.0 - 0.5
    xx = 6.0 + (np.arange(32) + 0.5) / 2.0 - 0.5
    yf, xf = np.meshgrid(yy, xx, indexing="ij")
    np.testing.assert_allclose(
        np.asarray(fine), 1.5 + 0.25 * xf - 0.125 * yf, rtol=0, atol=1e-5
    )

    back = nest.restrict(fine)
    np.testing.assert_allclose(
        np.asarray(back), np.asarray(f[8:24, 6:22]), rtol=0, atol=1e-5
    )


def test_prolong_frame_ghost_ring():
    """The ghost frame is the patch plus one fine cell on every side."""
    g = _grid(32)
    nest = NestedGrid(g, patch=(8, 24, 8, 24), ratio=2)
    y, x = np.meshgrid(np.arange(32.0), np.arange(32.0), indexing="ij")
    f = jnp.asarray(x + 2.0 * y, dtype=jnp.float32)
    frame = nest.prolong_frame(f)
    assert frame.shape == (34, 34)
    np.testing.assert_allclose(
        np.asarray(frame[1:-1, 1:-1]), np.asarray(nest.prolong(f)), atol=1e-6
    )
    # ghost ring continues the same linear field one fine cell out
    yy = 8.0 + (np.arange(-1, 33) + 0.5) / 2.0 - 0.5
    xx = yy.copy()
    yf, xf = np.meshgrid(yy, xx, indexing="ij")
    np.testing.assert_allclose(np.asarray(frame), xf + 2.0 * yf, atol=1e-5)


def test_patch_validation():
    g = _grid(32)
    with pytest.raises(ValueError):
        NestedGrid(g, patch=(0, 16, 8, 24))
    with pytest.raises(ValueError):
        NestedGrid(g, patch=(8, 31, 8, 24))


def test_uniform_state_is_steady():
    """A uniform resting state stays exactly steady under nesting."""
    g = _grid(32)
    params = PhysicsParams(gravity=9.81, coriolis_f=1e-4)
    nest = NestedGrid(g, patch=(8, 24, 8, 24), ratio=2)
    stepper = make_nested_swe_stepper(g, params, nest, dt=0.02)

    z = jnp.zeros((32, 32), jnp.float32)
    h = jnp.full((32, 32), 10.0, jnp.float32)
    coarse = WeatherState(u=z, v=z, h=h)
    fine = WeatherState(u=nest.prolong(z), v=nest.prolong(z),
                        h=nest.prolong(h))
    s = NestedState(coarse=coarse, fine=fine)
    carry = stepper.init(s)
    for _ in range(3):
        carry, s = jax.jit(stepper.step)(carry, s, jnp.float32(0.02))
    np.testing.assert_allclose(np.asarray(s.coarse.h), 10.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s.fine.h), 10.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s.fine.u), 0.0, atol=1e-6)


def _gaussian_state(n, positions, h0=10.0, amp=0.3, sigma=4.0, center=24.0):
    """Analytic IC evaluated at the given physical positions (in coarse
    cell units) so coarse / fine / truth grids share one physical field."""
    yf, xf = np.meshgrid(positions, positions, indexing="ij")
    r2 = (yf - center) ** 2 + (xf - center) ** 2
    h = h0 + amp * np.exp(-r2 / (2.0 * sigma**2))
    z = jnp.zeros((n, n), jnp.float32)
    return WeatherState(u=z, v=z, h=jnp.asarray(h, jnp.float32))


def _run(stepper, s, n, dt):
    carry = stepper.init(s)

    def body(cs, _):
        c, st = cs
        return stepper.step(c, st, jnp.float32(dt)), None

    (_, out), _ = jax.jit(
        lambda cs: jax.lax.scan(body, cs, None, length=n)
    )((carry, s))
    return out


def test_nested_beats_coarse_against_fine_truth():
    """Two-way nesting over the feature reduces the patch error vs a
    uniformly fine reference — the point of the capability."""
    from njw_tpu.weather.dynamics import make_tendency_fn
    from njw_tpu.weather.integrators import make_stepper

    n, r, dt, steps = 48, 2, 0.02, 25
    g = _grid(n)
    params = PhysicsParams(gravity=9.81)
    patch = (12, 36, 12, 36)
    nest = NestedGrid(g, patch, ratio=r)

    coarse0 = _gaussian_state(n, np.arange(float(n)))
    # truth: globally fine grid whose cells are the nested fine phases
    gf = _grid(n * r, dx=1.0 / r)
    truth_pos = (np.arange(n * r) + 0.5) / r - 0.5
    truth0 = _gaussian_state(n * r, truth_pos)

    plain = make_stepper("rk4", make_tendency_fn("shallow_water", g, params))
    fine_ref = make_stepper(
        "rk4", make_tendency_fn("shallow_water", gf, params)
    )
    nested = make_nested_swe_stepper(g, params, nest, dt=dt)

    coarse_end = _run(plain, coarse0, steps, dt)
    truth_end = _run(fine_ref, truth0, steps * r, dt / r)
    fine0 = WeatherState(u=nest.prolong(coarse0.u), v=nest.prolong(coarse0.v),
                         h=nest.prolong(coarse0.h))
    nested_end = _run(nested, NestedState(coarse=coarse0, fine=fine0),
                      steps, dt)

    # restrict the truth to coarse cells on the patch
    y0, y1, x0, x1 = patch
    t = np.asarray(truth_end.h).reshape(n, r, n, r).mean(axis=(1, 3))
    t_patch = t[y0:y1, x0:x1]
    err_coarse = np.abs(np.asarray(coarse_end.h)[y0:y1, x0:x1] - t_patch)
    err_nested = np.abs(
        np.asarray(nested_end.coarse.h)[y0:y1, x0:x1] - t_patch
    )
    assert np.isfinite(err_nested).all()
    assert err_nested.max() < 0.6 * err_coarse.max(), (
        err_nested.max(), err_coarse.max())


def test_nested_sim_driver():
    """make_nested_sim plugs into the Simulation driver: jitted chunked
    scan over the NestedState pytree, snapshots expose both grids."""
    cfg = SimConfig(grid_width=48, grid_height=48, dt=0.02,
                    max_steps=10, output_interval=5)
    sim = make_nested_sim(Simulation, cfg, "vortex", patch=(12, 36, 12, 36),
                          ratio=2, strength=2.0)
    sim.run(10, output_interval=5)
    assert sim.step_count == 10
    snap = sim.snapshots[-1]
    assert snap["h"].shape == (48, 48)
    assert snap["fine_h"].shape == (48, 48)
    assert np.isfinite(snap["fine_h"]).all()


def test_nested_ab2_carry_threads_through_substeps():
    """Carry-bearing methods keep their order on the fine grid: nested
    AB2 must differ from nested Euler (the old code re-initialized the
    fine carry every substep, collapsing AB2 to Euler there), and stay
    steady on a resting state."""
    g = _grid(32)
    params = PhysicsParams(gravity=9.81, coriolis_f=1e-4)
    nest = NestedGrid(g, patch=(8, 24, 8, 24), ratio=2)
    pos_f = 8.0 + (np.arange(32) + 0.5) / 2.0 - 0.5

    def run(method):
        stepper = make_nested_swe_stepper(g, params, nest, dt=0.05,
                                          method=method)
        coarse = _gaussian_state(32, np.arange(32.0), center=16.0)
        fine = _gaussian_state(32, pos_f, center=16.0)
        s = NestedState(coarse=coarse, fine=fine)
        return _run(stepper, s, 6, 0.05)

    ab2 = run("adams_bashforth")
    eul = run("euler")
    d_fine = float(jnp.abs(ab2.fine.h - eul.fine.h).max())
    assert d_fine > 1e-6  # fine grid actually integrates with AB2
    assert np.isfinite(np.asarray(ab2.fine.h)).all()
