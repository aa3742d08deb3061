"""Latitude-sharded spectral cores == single-device (the sharded-path
correctness bar, same pattern as tests/test_parallel_halo.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from njw_tpu.ops.sht import SphericalHarmonicTransform
from njw_tpu.parallel.sphere import shard_sht, sharded_spherical_step
from njw_tpu.weather.spherical import (
    EARTH_OMEGA,
    bve_tendencies,
    pack_state,
    rossby_haurwitz_bve,
    rossby_haurwitz_swe,
    swe_tendencies,
    unpack_state,
)


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("lat",))


def _rk4_steps(tend, s0, dt, n):
    def body(s, _):
        ax = lambda a, k: jax.tree.map(lambda si, ki: si + a * ki, s, k)
        k1 = tend(s)
        k2 = tend(ax(0.5 * dt, k1))
        k3 = tend(ax(0.5 * dt, k2))
        k4 = tend(ax(dt, k3))
        comb = jax.tree.map(lambda a, b, c, d: a + 2 * b + 2 * c + d,
                            k1, k2, k3, k4)
        return jax.tree.map(lambda si, ci: si + dt / 6.0 * ci, s, comb), None

    return jax.lax.scan(body, s0, None, length=n)[0]


@pytest.mark.parametrize("core", ["bve", "swe"])
@pytest.mark.parametrize("nd", [4, 8])
def test_sharded_matches_single_device(core, nd):
    nlat = 32
    sht = SphericalHarmonicTransform(nlat)
    mesh = _mesh(nd)
    dt = jnp.float32(600.0)
    steps = 4

    if core == "bve":
        s0 = rossby_haurwitz_bve(sht)
        tend = lambda s: bve_tendencies(s, sht, EARTH_OMEGA)
    else:
        s0 = rossby_haurwitz_swe(sht, EARTH_OMEGA)
        tend = lambda s: swe_tendencies(s, sht, EARTH_OMEGA, nu4=1e15)

    ref = jax.jit(lambda s: _rk4_steps(tend, s, dt, steps))(s0)

    step = sharded_spherical_step(sht, mesh, core=core, omega=EARTH_OMEGA,
                                  nu4=(0.0 if core == "bve" else 1e15),
                                  n_steps=steps)
    got = unpack_state(step(pack_state(s0), shard_sht(sht, mesh), dt))

    for name in ref.__dataclass_fields__:
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(got, name))
        scale = np.abs(a).max() + 1e-30
        # psum partial sums reassociate the f32 quadrature; 4 RK4 steps
        # amplify that to ~3e-5 of the field scale (a real sharding bug
        # shows up at O(1))
        np.testing.assert_allclose(b / scale, a / scale, rtol=0, atol=1e-4,
                                   err_msg=f"{core}.{name} nd={nd}")


def test_nlat_divisibility_guard():
    sht = SphericalHarmonicTransform(30)  # 30 % 4 != 0
    with pytest.raises(ValueError):
        sharded_spherical_step(sht, _mesh(4), core="bve",
                               omega=EARTH_OMEGA)
