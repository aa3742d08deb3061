"""Global spectral (spherical-harmonic) core tests.

The reference declares GridType::SphericalHarmonic but never implements it
(ref: weather_sim.hpp:61-66); these tests validate the real implementation
against closed-form invariants: transform orthogonality, Laplacian
eigenvalues, exact Rossby-Haurwitz retrogression (BVE), and Williamson
et al. (1992) test case 2 steadiness (SWE).
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from njw_tpu.ops.sht import SphericalHarmonicTransform
from njw_tpu.weather.spherical import (
    EARTH_OMEGA,
    SphericalBarotropicState,
    bve_tendencies,
    rossby_haurwitz_bve,
    rossby_haurwitz_swe,
    swe_tendencies,
    williamson2_state,
)


@pytest.fixture(scope="module")
def sht():
    return SphericalHarmonicTransform(32)  # T21


def _run(stepper, s0, dt, nsteps):
    @partial(jax.jit, static_argnums=2)
    def go(carry, s, n):
        def body(cs, _):
            c, s = cs
            return stepper.step(c, s, jnp.float32(dt)), None

        (carry, s), _ = jax.lax.scan(body, (carry, s), None, length=n)
        return carry, s

    _, s1 = go(stepper.init(s0), s0, nsteps)
    return s1


class TestTransform:
    def test_roundtrip_bandlimited(self, sht):
        rng = np.random.default_rng(0)
        a0 = rng.normal(size=sht.spec_shape) \
            + 1j * rng.normal(size=sht.spec_shape)
        a0 = jnp.asarray(np.where(np.asarray(sht._valid), a0, 0),
                         jnp.complex64)
        a0 = a0.at[0].set(jnp.real(a0[0]))  # m=0 must be real
        a1 = sht.analysis(sht.synthesis(a0))
        assert float(jnp.max(jnp.abs(a1 - a0))) < 5e-6

    def test_laplacian_eigenvalue(self, sht):
        m, n = 3, 7
        mode = sht.spectral_mode(m, n)
        g = sht.synthesis(mode)
        lap = sht.synthesis(sht.laplacian(mode))
        expect = -n * (n + 1) / sht.radius**2 * g
        rel = jnp.max(jnp.abs(lap - expect)) / jnp.max(jnp.abs(expect))
        assert float(rel) < 1e-5

    def test_wind_operators_consistent(self, sht):
        """curl of the psi-winds recovers Lap(psi); their divergence is 0."""
        rng = np.random.default_rng(1)
        a = rng.normal(size=sht.spec_shape) \
            + 1j * rng.normal(size=sht.spec_shape)
        a = jnp.asarray(np.where(np.asarray(sht._valid), a, 0), jnp.complex64)
        a = a.at[0].set(jnp.real(a[0]))
        psi = sht.inverse_laplacian(a)
        U, V = sht.uv_from_psi_chi(psi, jnp.zeros_like(psi))
        curl = sht.curl_of(U, V)
        div = sht.divergence_of(U, V)
        scale = float(jnp.max(jnp.abs(sht.laplacian(psi))))
        assert float(jnp.max(jnp.abs(curl - sht.laplacian(psi)))) < 1e-5 * scale + 1e-6
        assert float(jnp.max(jnp.abs(div))) < 1e-5 * scale + 1e-6

    def test_sht_is_a_pytree_jit_argument(self, sht):
        """The transform must cross jit boundaries as an ARGUMENT (tables
        as runtime operands, not HLO constants — the T341 table set is
        ~1 GB and would blow up remote compiles as a closure)."""
        @jax.jit
        def roundtrip(t, a):
            return t.synthesis(t.laplacian(a))

        a = sht.spectral_mode(2, 5)
        out = roundtrip(sht, a)
        want = sht.synthesis(sht.laplacian(a))
        assert float(jnp.max(jnp.abs(out - want))) < 1e-7
        leaves, treedef = jax.tree_util.tree_flatten(sht)
        assert len(leaves) == 11
        assert jax.tree_util.tree_unflatten(treedef, leaves).trunc \
            == sht.trunc

    def test_quadrature_global_mean(self, sht):
        """Gaussian quadrature integrates Y_0^0 exactly; higher modes to 0."""
        one = jnp.ones((sht.nlat, sht.nlon))
        assert abs(float(sht.global_mean(one)) - 1.0) < 1e-6
        g = sht.synthesis(sht.spectral_mode(2, 4))
        assert abs(float(sht.global_mean(g))) < 1e-6


class TestParityFold:
    """fold_parity=True runs every Legendre contraction as two half-size
    hemisphere matmuls split by n parity (r5 MXU-occupancy lever); it
    must be a pure relowering — same values to f32 rounding."""

    @pytest.mark.parametrize("which",
                             ["P", "H", "Pw", "Pw_over_c2", "Hw_over_c2"])
    def test_stacked_transforms_match_unfolded(self, sht, which):
        folded = SphericalHarmonicTransform(32, fold_parity=True)
        st = rossby_haurwitz_swe(sht, EARTH_OMEGA)
        a = jnp.stack([st.zeta, st.div, st.phi])
        f0 = sht.syn_stack(a, which)
        f1 = folded.syn_stack(a, which)
        scale = float(jnp.max(jnp.abs(f0))) + 1e-30
        np.testing.assert_allclose(np.asarray(f1) / scale,
                                   np.asarray(f0) / scale,
                                   rtol=0, atol=1e-5)
        b0 = sht.anal_stack(f0, which)
        b1 = folded.anal_stack(f0, which)
        scale = float(jnp.max(jnp.abs(b0))) + 1e-30
        np.testing.assert_allclose(np.asarray(b1) / scale,
                                   np.asarray(b0) / scale,
                                   rtol=0, atol=1e-5)

    def test_swe_trajectory_matches_unfolded(self, sht):
        from njw_tpu.weather.integrators import make_stepper

        folded = SphericalHarmonicTransform(32, fold_parity=True)
        s0 = rossby_haurwitz_swe(sht, EARTH_OMEGA)
        outs = []
        for t in (sht, folded):
            stepper = make_stepper(
                "rk4", lambda s, t=t: swe_tendencies(s, t, EARTH_OMEGA,
                                                     nu4=1e15))
            outs.append(_run(stepper, s0, 600.0, 20))
        for name in ("zeta", "div", "phi"):
            a = np.asarray(getattr(outs[0], name))
            b = np.asarray(getattr(outs[1], name))
            scale = np.abs(a).max() + 1e-30
            np.testing.assert_allclose(b / scale, a / scale, rtol=0,
                                       atol=1e-4, err_msg=name)

    def test_lat_sharding_rejects_folded_tables(self):
        from jax.sharding import Mesh

        from njw_tpu.parallel.sphere import shard_sht

        folded = SphericalHarmonicTransform(32, fold_parity=True)
        mesh = Mesh(np.array(jax.devices()[:4]), ("lat",))
        with pytest.raises(NotImplementedError):
            shard_sht(folded, mesh)


class TestBVE:
    def test_rossby_haurwitz_exact_rotation(self, sht):
        """A single Y_n^m vorticity mode is an exact nonlinear BVE solution
        retrogressing at -2*Omega/(n(n+1)); one model day must match."""
        m, n = 4, 5
        s0 = rossby_haurwitz_bve(sht, m=m, n=n, amplitude=8e-5)
        from njw_tpu.weather.integrators import make_stepper

        st = make_stepper("rk4", lambda s: bve_tendencies(s, sht,
                                                          EARTH_OMEGA))
        dt, nsteps = 900.0, 96  # one day
        s1 = _run(st, s0, dt, nsteps)
        om_r = 2.0 * EARTH_OMEGA / (n * (n + 1))
        exact = s0.zeta * jnp.exp(1j * m * om_r * dt * nsteps)
        got, want = sht.synthesis(s1.zeta), sht.synthesis(exact)
        rel = jnp.max(jnp.abs(got - want)) / jnp.max(jnp.abs(want))
        assert float(rel) < 1e-4

    def test_mean_vorticity_and_enstrophy_conserved(self, sht):
        key = jax.random.key(0)
        zg = 1e-5 * jax.random.normal(key, (sht.nlat, sht.nlon))
        s0 = SphericalBarotropicState(zeta=sht.analysis(zg))
        from njw_tpu.weather.integrators import make_stepper

        st = make_stepper("rk4", lambda s: bve_tendencies(s, sht,
                                                          EARTH_OMEGA))
        s1 = _run(st, s0, 900.0, 32)
        # global integral of zeta == coefficient (0,0): stays 0 up to f32
        # quadrature roundoff relative to the field scale
        scale = float(jnp.max(jnp.abs(sht.synthesis(s0.zeta))))
        assert abs(complex(s1.zeta[0, 0])) < 1e-2 * scale
        ens0 = float(sht.global_mean(sht.synthesis(s0.zeta) ** 2))
        ens1 = float(sht.global_mean(sht.synthesis(s1.zeta) ** 2))
        assert abs(ens1 - ens0) < 2e-2 * ens0


class TestSphericalSWE:
    def test_williamson2_steady(self, sht):
        """TC2 (steady geostrophic flow) must stay steady: the canonical
        spectral-SWE correctness test (Williamson et al. 1992 §3.2)."""
        s0 = williamson2_state(sht, EARTH_OMEGA)
        from njw_tpu.weather.integrators import make_stepper

        st = make_stepper("rk4", lambda s: swe_tendencies(s, sht,
                                                          EARTH_OMEGA))
        s1 = _run(st, s0, 300.0, 96)  # 8 hours
        p0, p1 = sht.synthesis(s0.phi), sht.synthesis(s1.phi)
        rel = float(jnp.linalg.norm(p1 - p0) / jnp.linalg.norm(p0))
        assert rel < 1e-5
        assert float(jnp.max(jnp.abs(sht.synthesis(s1.div)))) < 1e-8

    def test_rossby_haurwitz_tc6_stable_and_conserves_mass(self, sht):
        s0 = rossby_haurwitz_swe(sht, EARTH_OMEGA)
        from njw_tpu.weather.integrators import make_stepper

        st = make_stepper("rk4", lambda s: swe_tendencies(
            s, sht, EARTH_OMEGA, nu4=1e16))
        s1 = _run(st, s0, 180.0, 60)  # 3 hours
        p1 = sht.synthesis(s1.phi)
        assert bool(jnp.all(jnp.isfinite(p1)))
        # mass = global mean phi = coefficient (0,0): conserved exactly
        # by the divergence-form tendency (hyperdiffusion keeps n=0 intact)
        rel = abs(complex(s1.phi[0, 0] - s0.phi[0, 0])) \
            / abs(complex(s0.phi[0, 0]))
        assert rel < 1e-5


class TestSemiImplicit:
    def test_stable_beyond_explicit_cfl(self):
        """At T42 / dt=3600 s the gravity-wave CFL (|w dt| ~ 4.1) makes RK4
        explode on TC2; the semi-implicit stepper must stay steady."""
        sht = SphericalHarmonicTransform(64)
        s0 = williamson2_state(sht, EARTH_OMEGA)
        from njw_tpu.weather.integrators import make_stepper
        from njw_tpu.weather.spherical import semi_implicit_spherical_swe

        tend = lambda s: swe_tendencies(s, sht, EARTH_OMEGA)
        phi_ref = float(jnp.real(s0.phi[0, 0]))
        si = semi_implicit_spherical_swe(sht, EARTH_OMEGA,
                                         phi_ref=phi_ref)
        s_si = _run(si, s0, 3600.0, 24)  # one model day
        p0, p1 = sht.synthesis(s0.phi), sht.synthesis(s_si.phi)
        assert bool(jnp.all(jnp.isfinite(p1)))
        assert float(jnp.linalg.norm(p1 - p0) / jnp.linalg.norm(p0)) < 1e-4

        rk4 = make_stepper("rk4", tend)
        s_ex = _run(rk4, s0, 3600.0, 48)
        h_ex = sht.synthesis(s_ex.phi)
        assert not bool(jnp.all(jnp.isfinite(h_ex))) \
            or float(jnp.max(jnp.abs(h_ex - p0))) > 1e3

    def test_small_dt_consistency_with_rk4(self, sht):
        """At small dt the SI splitting error vanishes: TC6 after 30 min
        must match RK4 to f32 integration tolerance."""
        from njw_tpu.weather.integrators import make_stepper
        from njw_tpu.weather.spherical import semi_implicit_spherical_swe

        s0 = rossby_haurwitz_swe(sht, EARTH_OMEGA)
        phi_ref = float(jnp.real(s0.phi[0, 0]))
        si = semi_implicit_spherical_swe(sht, EARTH_OMEGA,
                                         phi_ref=phi_ref)
        rk4 = make_stepper("rk4", lambda s: swe_tendencies(s, sht,
                                                           EARTH_OMEGA))
        a = _run(si, s0, 60.0, 30)
        b = _run(rk4, s0, 60.0, 30)
        pa, pb = sht.synthesis(a.phi), sht.synthesis(b.phi)
        scale = float(jnp.max(jnp.abs(pb)))
        assert float(jnp.max(jnp.abs(pa - pb))) < 2e-4 * scale


class TestSimulationIntegration:
    def test_from_config_bve(self):
        from njw_tpu.weather import SimConfig, Simulation

        cfg = SimConfig(model="barotropic", grid_type="spherical_harmonic",
                        grid_width=64, grid_height=32, dt=900.0,
                        integration_method="rk4")
        sim = Simulation.from_config(cfg, "rossby_haurwitz")
        sim.step(4)
        out = sim.output_fn(sim.state)
        assert set(out) == {"zeta", "psi", "u", "v"}
        assert out["u"].shape == (32, 64)
        assert bool(jnp.all(jnp.isfinite(out["u"])))

    def test_from_config_swe(self):
        from njw_tpu.weather import SimConfig, Simulation

        cfg = SimConfig(model="shallow_water",
                        grid_type="spherical_harmonic",
                        grid_width=64, grid_height=32, dt=300.0)
        sim = Simulation.from_config(cfg, "williamson2")
        sim.step(4)
        out = sim.output_fn(sim.state)
        assert {"h", "u", "v", "zeta", "divergence"} <= set(out)
        assert bool(jnp.all(jnp.isfinite(out["h"])))

    def test_bad_grid_shape_raises(self):
        from njw_tpu.weather import SimConfig, Simulation

        cfg = SimConfig(model="barotropic", grid_type="spherical_harmonic",
                        grid_width=64, grid_height=64)
        with pytest.raises(ValueError, match="2\\*grid_height"):
            Simulation.from_config(cfg, "rossby_haurwitz")

    def test_cli_spherical(self, tmp_path, capsys):
        from njw_tpu.weather.__main__ import main

        out = tmp_path / "sph.npz"
        rc = main(["--model", "shallow_water", "--grid-type",
                   "spherical_harmonic", "--width", "64", "--height", "32",
                   "--dt", "300", "--steps", "8", "--json",
                   "--output", str(out)])
        assert rc == 0
        assert out.exists()
        data = np.load(out)
        assert np.isfinite(data["final_h"]).all()
