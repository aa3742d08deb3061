"""N-body workload tests (mirrors ref coverage: tests/nbody-sim/python/
test_particle.py / test_integrator.py / test_simulation.py — init, update,
energies, integrator comparison on a two-body system, save/load, metrics)."""
import json

import jax.numpy as jnp
import numpy as np
import pytest

from njw_tpu.nbody import (
    NBodySimulation, NBodySystem, accelerations, create_galaxy_model,
    create_random_system, create_solar_system, potential_energy,
    system_diagnostics,
)


def two_body_system():
    """Equal masses on a circular orbit about the COM (the ref
    energy-conservation fixture, test_integrator.py:122)."""
    m = 1.0
    r = 1.0
    G = 1.0
    # circular: v^2 = G m / (4 r) for separation 2r about COM
    v = np.sqrt(G * m / (4 * r))
    return NBodySystem(
        pos=jnp.asarray([[-r, 0, 0], [r, 0, 0]], jnp.float32),
        vel=jnp.asarray([[0, -v, 0], [0, v, 0]], jnp.float32),
        mass=jnp.asarray([m, m], jnp.float32),
        G=G, softening=1e-6,
    )


class TestForces:
    def test_two_body_analytic(self):
        s = two_body_system()
        a = np.asarray(accelerations(s))
        # |a| = G m / (2r)^2 = 0.25, pointing toward the other body
        np.testing.assert_allclose(a[0], [0.25, 0, 0], atol=1e-5)
        np.testing.assert_allclose(a[1], [-0.25, 0, 0], atol=1e-5)

    def test_mxu_matches_direct(self):
        s = create_random_system(512, seed=1)
        a_direct = np.asarray(accelerations(s, method="direct"))
        a_mxu = np.asarray(accelerations(s, method="mxu"))
        scale = np.abs(a_direct).max()
        np.testing.assert_allclose(a_mxu, a_direct, atol=2e-3 * scale)

    def test_blocked_matches_unblocked(self):
        s = create_random_system(600, seed=2)
        a1 = np.asarray(accelerations(s, chunk=4096))   # single block
        a2 = np.asarray(accelerations(s, chunk=256))    # padded blocks
        np.testing.assert_allclose(a2, a1, rtol=1e-5, atol=1e-6)

    def test_potential_energy_two_body(self):
        s = two_body_system()
        pe = float(potential_energy(s))
        assert pe == pytest.approx(-1.0 / 2.0, rel=1e-4)  # -G m1 m2 / 2r


class TestSystems:
    def test_random_system_shapes_and_seeding(self):
        a = create_random_system(100, seed=5)
        b = create_random_system(100, seed=5)
        assert a.pos.shape == (100, 3)
        np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))

    def test_solar_system_has_nine_bodies(self):
        s = create_solar_system()
        assert s.n == 9
        assert float(s.mass[0]) == 1.0  # sun
        # earth-like body at ~1 AU
        r = np.linalg.norm(np.asarray(s.pos), axis=1)
        assert np.any(np.abs(r - 1.0) < 1e-3)

    def test_galaxy_model_orbits(self):
        s = create_galaxy_model(500, seed=3)
        assert s.n == 500
        assert float(s.mass[0]) == 1000.0
        r = np.linalg.norm(np.asarray(s.pos[1:, :2]), axis=1)
        assert r.max() <= 10.0 + 1e-5

    def test_diagnostics_keys(self):
        d = system_diagnostics(create_random_system(64))
        assert set(d) >= {"total_mass", "center_of_mass", "momentum",
                          "angular_momentum", "kinetic_energy",
                          "potential_energy", "total_energy"}


class TestIntegrators:
    @pytest.mark.parametrize("method,tol", [
        ("euler", 5e-2), ("leapfrog", 1e-4), ("verlet", 1e-4), ("rk4", 1e-5),
    ])
    def test_energy_conservation_two_body(self, method, tol):
        """Energy drift ordering across integrators on a circular two-body
        orbit (ref: test_integrator.py:122 comparison test)."""
        sim = NBodySimulation(two_body_system(), integrator=method, dt=0.01)
        e0 = float(system_diagnostics(sim.system)["total_energy"])
        sim.step(500)
        e1 = float(system_diagnostics(sim.system)["total_energy"])
        assert abs(e1 - e0) / abs(e0) < tol

    def test_momentum_conserved(self):
        sim = NBodySimulation(create_random_system(128, seed=7),
                              integrator="leapfrog", dt=0.005)
        p0 = np.asarray(system_diagnostics(sim.system)["momentum"])
        sim.step(100)
        p1 = np.asarray(system_diagnostics(sim.system)["momentum"])
        assert np.abs(p1 - p0).max() < 1e-3

    def test_circular_orbit_radius_preserved(self):
        sim = NBodySimulation(two_body_system(), integrator="leapfrog",
                              dt=0.01)
        sim.step(1000)
        r = np.linalg.norm(np.asarray(sim.system.pos[0]))
        assert r == pytest.approx(1.0, abs=0.02)


class TestSimulation:
    def test_run_by_duration(self):
        sim = NBodySimulation(create_random_system(32), dt=0.01)
        sim.run(0.5)
        assert sim.step_count == 50
        assert sim.time == pytest.approx(0.5)

    def test_callback_interval(self):
        calls = []
        sim = NBodySimulation(create_random_system(32), dt=0.01)
        sim.run(n_steps=50, callback=lambda s: calls.append(s.step_count),
                callback_interval=10)
        assert calls == [10, 20, 30, 40, 50]

    def test_save_load_roundtrip(self, tmp_path):
        sim = NBodySimulation(create_random_system(32, seed=9),
                              integrator="verlet", dt=0.02)
        sim.step(10)
        p = sim.save_state(str(tmp_path / "state.npz"))
        sim2 = NBodySimulation.load_state(p)
        assert sim2.step_count == 10 and sim2.integrator_name == "verlet"
        np.testing.assert_allclose(np.asarray(sim2.system.pos),
                                   np.asarray(sim.system.pos), atol=1e-6)
        # restored sim continues fine
        sim2.step(5)

    def test_performance_metrics(self):
        sim = NBodySimulation(create_random_system(64), dt=0.01)
        sim.step(10)
        m = sim.performance_metrics()
        assert m["num_steps"] == 10
        assert m["interactions_per_second"] > 0


def test_cli_end_to_end(tmp_path, capsys):
    from njw_tpu.nbody.__main__ import main

    rc = main(["--system-type", "random", "--num-particles", "64",
               "--duration", "0.1", "--output-dir", str(tmp_path),
               "--save-visualization"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["particles"] == 64 and out["steps"] == 10
    assert (tmp_path / "final_state.npz").exists()
    assert (tmp_path / "visualization.npz").exists()


class TestParticleMesh:
    """PM gravity for N >> 1e5 (TPU-native long-range solver; the
    reference caps at O(N^2) direct summation, particle.py:119-152)."""

    def test_two_body_matches_newton(self):
        from njw_tpu.nbody.pm import pm_accelerations

        # two unit masses separated by 0.15 box lengths; periodic images
        # contribute at the few-percent level
        pos = np.array([[0.40, 0.5, 0.5], [0.55, 0.5, 0.5]], np.float32)
        mass = np.ones(2, np.float32)
        acc = np.asarray(pm_accelerations(pos, mass, mesh=96, box=1.0))
        r = 0.15
        newton = 1.0 / r ** 2
        # force along +x on particle 0, -x on particle 1
        assert acc[0, 0] > 0 > acc[1, 0]
        np.testing.assert_allclose(abs(acc[0, 0]), newton, rtol=0.08)
        np.testing.assert_allclose(acc[0], -acc[1], atol=newton * 0.02)

    def test_momentum_conservation(self):
        from njw_tpu.nbody.pm import pm_accelerations

        rng = np.random.default_rng(3)
        n = 5000
        pos = rng.random((n, 3)).astype(np.float32)
        mass = rng.random(n).astype(np.float32) + 0.5
        acc = np.asarray(pm_accelerations(pos, mass, mesh=32))
        net = (mass[:, None] * acc).sum(axis=0)
        scale = np.abs(mass[:, None] * acc).sum()
        assert np.abs(net).max() < 1e-4 * scale

    def test_mesh_consistency(self):
        """PM converges to the PERIODIC (Ewald) force, not the isolated
        Newton value — at r=0.3L the image lattice reduces the pair force
        ~15%. Successive meshes must agree (the solver is converged),
        and the value must sit below isolated Newton (image pull)."""
        from njw_tpu.nbody.pm import pm_accelerations

        pos = np.array([[0.35, 0.5, 0.5], [0.65, 0.5, 0.5]], np.float32)
        mass = np.ones(2, np.float32)
        a64 = np.asarray(pm_accelerations(pos, mass, mesh=64))[0, 0]
        a128 = np.asarray(pm_accelerations(pos, mass, mesh=128))[0, 0]
        assert abs(a64 - a128) < 0.01 * abs(a128)
        newton = 1.0 / 0.3 ** 2
        assert 0.7 * newton < abs(a128) < newton

    def test_large_n_runs(self):
        from njw_tpu.nbody.pm import pm_accelerations

        rng = np.random.default_rng(4)
        n = 200_000
        pos = rng.random((n, 3)).astype(np.float32)
        mass = np.ones(n, np.float32)
        acc = np.asarray(pm_accelerations(pos, mass, mesh=64))
        assert acc.shape == (n, 3) and np.isfinite(acc).all()


class TestPMSimulation:
    def test_pm_driver_runs_large_n(self):
        """NBodySimulation(force_method='pm') integrates 100k particles."""
        import jax.numpy as jnp

        from njw_tpu.nbody.simulation import NBodySimulation
        from njw_tpu.nbody.system import NBodySystem

        rng = np.random.default_rng(5)
        n = 100_000
        sys_ = NBodySystem(
            pos=jnp.asarray(rng.random((n, 3)), jnp.float32),
            vel=jnp.zeros((n, 3), jnp.float32),
            mass=jnp.full((n,), 1.0 / n, jnp.float32),
            G=1.0, softening=1e-3)
        sim = NBodySimulation(sys_, integrator="leapfrog", dt=1e-3,
                              force_method="pm", pm_box=1.0, pm_mesh=32)
        sim.step(3)
        assert bool(np.isfinite(np.asarray(sim.system.pos)).all())


class TestP3M:
    """Ewald-split particle-mesh (exact short range restores what plain
    PM softens below ~2 mesh cells)."""

    def test_matches_exact_ewald(self):
        """P3M forces == exact periodic (Ewald) gravity to mesh accuracy.
        The exact reference reuses md.ewald with masses as charges
        (gravity = Coulomb scaled by -G/K, same neutralizing-background
        convention as the zeroed k=0 mode)."""
        from njw_tpu.md.ewald import make_ewald_coulomb
        from njw_tpu.md.forces import COULOMB_K
        from njw_tpu.nbody.pm import p3m_accelerations

        rng = np.random.default_rng(12)
        n = 40
        box = 1.0
        pos = rng.random((n, 3)).astype(np.float32)
        mass = (0.5 + rng.random(n)).astype(np.float32)

        got = np.asarray(p3m_accelerations(pos, mass, mesh=64, box=box))
        _, coul_forces = make_ewald_coulomb(
            np.asarray([box] * 3), alpha=6.0, r_cut=0.49, kmax=14)
        f_coul = np.asarray(coul_forces(pos, mass))   # on "charges" m
        want = (-1.0 / COULOMB_K) * f_coul / mass[:, None]  # accel, attract
        scale = np.abs(want).max()
        np.testing.assert_allclose(got, want, atol=0.03 * scale)

    def test_short_range_restored_vs_pm(self):
        """At sub-mesh separation, plain PM under-predicts the force;
        P3M recovers near-Newtonian magnitude."""
        from njw_tpu.nbody.pm import p3m_accelerations, pm_accelerations

        r = 0.02   # ~1.3 mesh cells at mesh=64
        pos = np.array([[0.5 - r / 2, 0.5, 0.5],
                        [0.5 + r / 2, 0.5, 0.5]], np.float32)
        mass = np.ones(2, np.float32)
        newton = 1.0 / r ** 2
        a_pm = abs(float(pm_accelerations(pos, mass, mesh=64)[0, 0]))
        a_p3m = abs(float(p3m_accelerations(pos, mass, mesh=64)[0, 0]))
        assert a_pm < 0.7 * newton          # PM is soft here
        assert abs(a_p3m - newton) < 0.05 * newton   # P3M is not
