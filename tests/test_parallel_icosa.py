"""Panel-pair-sharded icosahedral SWE == single-device (the sharded-path
correctness bar, same pattern as tests/test_parallel_halo.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from njw_tpu.parallel.icosa import (
    from_pairs,
    pad_halo_pairs,
    shard_icosa,
    sharded_icosa_swe_step,
    to_pairs,
    unshard_state,
)
from njw_tpu.weather.icosa import (
    EARTH_OMEGA,
    IcosaSWEState,
    build_operators,
    cell_centers,
    gaussian_hill,
    pad_halo,
    swe_tendencies_icosa,
    williamson2_icosa,
)


def _mesh5():
    return Mesh(np.array(jax.devices()[:5]), ("p",))


def test_pair_roundtrip():
    f = jnp.arange(10 * 4 * 4, dtype=jnp.float32).reshape(10, 4, 4)
    np.testing.assert_array_equal(np.asarray(from_pairs(to_pairs(f))),
                                  np.asarray(f))


def test_sharded_pad_matches_single_device():
    """pad_halo_pairs (2 ppermutes + 2 local copies) must reproduce the
    single-device 8-slice exchange exactly, scalar and vector."""
    n = 8
    c = cell_centers(n).astype(np.float32)
    ref = pad_halo(jnp.asarray(c))  # (10, n+2, n+2, 3)
    mesh = _mesh5()

    padded = jax.jit(jax.shard_map(
        lambda x: pad_halo_pairs(x[0])[None],
        mesh=mesh, in_specs=(jax.sharding.PartitionSpec("p"),),
        out_specs=jax.sharding.PartitionSpec("p"), check_vma=False,
    ))(to_pairs(jnp.asarray(c)))

    got = np.asarray(from_pairs(padded))
    want = np.asarray(ref)
    # corners are unset in both layouts; compare the used slots
    np.testing.assert_allclose(got[:, 1:-1, :], want[:, 1:-1, :], atol=0)
    np.testing.assert_allclose(got[:, :, 1:-1], want[:, :, 1:-1], atol=0)


def test_sharded_step_matches_single_device():
    n = 8
    ops = build_operators(n)
    base = williamson2_icosa(ops)
    s0 = IcosaSWEState(
        V=base.V, h=base.h + 50.0 * gaussian_hill(ops, lat0=0.4))
    dt = jnp.float32(600.0)
    steps = 3

    def rhs(x):
        return swe_tendencies_icosa(x, ops, omega=EARTH_OMEGA, nu=1e5)

    @jax.jit
    def ref_run(s):
        def body(x, _):
            ax = lambda a, k: jax.tree.map(
                lambda si, ki: si + a * ki, x, k)
            k1 = rhs(x)
            k2 = rhs(ax(0.5 * dt, k1))
            k3 = rhs(ax(0.5 * dt, k2))
            k4 = rhs(ax(dt, k3))
            comb = jax.tree.map(
                lambda a, b, c, d: a + 2 * b + 2 * c + d, k1, k2, k3, k4)
            return jax.tree.map(
                lambda si, ci: si + dt / 6.0 * ci, x, comb), None
        return jax.lax.scan(body, s, None, length=steps)[0]

    ref = ref_run(s0)

    mesh = _mesh5()
    ops_p, st_p = shard_icosa(ops, s0, mesh)
    step = sharded_icosa_swe_step(mesh, omega=EARTH_OMEGA, nu=1e5,
                                  n_steps=steps)
    got = unshard_state(step(st_p, ops_p, dt))

    np.testing.assert_allclose(np.asarray(got.h), np.asarray(ref.h),
                               rtol=0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got.V), np.asarray(ref.V),
                               rtol=0, atol=1e-5)


def test_mesh_size_guard():
    mesh = Mesh(np.array(jax.devices()[:4]), ("p",))
    with pytest.raises(ValueError):
        sharded_icosa_swe_step(mesh, omega=EARTH_OMEGA)
