"""Distributed 2-D domain decomposition: sharded result must match the
single-device whole-domain result exactly (the key determinism/correctness
property of the halo-exchange layer)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from njw_tpu.parallel.halo import halo_pad_2d, sharded_state, sharded_swe_step
from njw_tpu.weather import (
    GridSpec, PhysicsParams, SimConfig, Simulation, WeatherState,
    make_initial_state,
)


def _mesh(py, px):
    devs = np.array(jax.devices()[: py * px]).reshape(py, px)
    return Mesh(devs, ("y", "x"))


class TestHaloPad:
    @pytest.mark.parametrize("bc", ["periodic", "clamped"])
    def test_pad_matches_numpy(self, bc):
        """shard_map halo_pad over a 2x2 mesh == numpy pad of the global
        array, reassembled."""
        mesh = _mesh(2, 2)
        ny = nx = 16
        f = jnp.arange(ny * nx, dtype=jnp.float32).reshape(ny, nx)

        def local_pad(fl):
            return halo_pad_2d(fl, 1, bc=bc)

        padded = jax.jit(
            jax.shard_map(
                local_pad, mesh=mesh, in_specs=P("y", "x"),
                out_specs=P("y", "x"), check_vma=False,
            )
        )(f)
        # verify every shard's padded block against the global array
        fnp = np.asarray(f)
        mode = "wrap" if bc == "periodic" else "edge"
        gp = np.pad(fnp, 1, mode=mode)
        # shard (iy, ix) covers rows iy*8:(iy+1)*8; its pad in global
        # padded coords starts at iy*8 (since gp has +1 offset)
        out = np.asarray(padded)  # (ny+? , ...) concatenated along axes
        # shard_map output concatenates local (10, 10) blocks into (20, 20)
        assert out.shape == (20, 20)
        for iy in range(2):
            for ix in range(2):
                blk = out[iy * 10:(iy + 1) * 10, ix * 10:(ix + 1) * 10]
                ref_blk = gp[iy * 8: iy * 8 + 10, ix * 8: ix * 8 + 10]
                np.testing.assert_array_equal(blk, ref_blk)


class TestShardedStep:
    @pytest.mark.parametrize("mesh_shape", [(2, 2), (4, 2), (2, 4), (1, 8)])
    def test_matches_single_device(self, mesh_shape):
        grid = GridSpec(nx=64, ny=64)
        params = PhysicsParams(coriolis_f=1e-4)
        state0 = make_initial_state("vortex", grid, strength=2.0)
        state0 = WeatherState(u=state0.u, v=state0.v, h=state0.h)

        mesh = _mesh(*mesh_shape)
        step = sharded_swe_step(grid, params, mesh, dt=0.01, method="rk4",
                                n_steps=20)
        sharded = step(sharded_state(state0, mesh))

        cfg = SimConfig(grid_width=64, grid_height=64, dt=0.01,
                        coriolis_f=1e-4)
        sim = Simulation.from_config(cfg, "vortex", strength=2.0)
        sim.step(20)

        np.testing.assert_allclose(
            np.asarray(sharded.h), np.asarray(sim.state.h),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(sharded.u), np.asarray(sim.state.u),
            rtol=1e-5, atol=1e-5,
        )

    def test_clamped_bc_matches(self):
        grid = GridSpec(nx=32, ny=32, bc="clamped")
        params = PhysicsParams()
        state0 = make_initial_state("breaking_wave", grid)
        state0 = WeatherState(u=state0.u, v=state0.v, h=state0.h)

        mesh = _mesh(2, 2)
        step = sharded_swe_step(grid, params, mesh, dt=0.005, method="rk2",
                                n_steps=10)
        sharded = step(sharded_state(state0, mesh))

        cfg = SimConfig(grid_width=32, grid_height=32, dt=0.005,
                        integration_method="rk2",
                        boundary_condition="clamped")
        sim = Simulation.from_config(cfg, "breaking_wave")
        sim.step(10)
        np.testing.assert_allclose(
            np.asarray(sharded.h), np.asarray(sim.state.h),
            rtol=1e-5, atol=1e-5,
        )

    def test_reflective_bc_matches(self):
        """Sharded reflective == whole-domain reflective (the velocity
        ghost sign flip as per-shard edge masking — SURVEY §7 hard-part 5,
        closed r3). Nonzero wall winds so the flip matters."""
        grid = GridSpec(nx=32, ny=32, bc="reflective")
        params = PhysicsParams(coriolis_f=1e-4)
        s0 = make_initial_state("random", grid, seed=5)
        s0 = WeatherState(u=s0.u + 0.5, v=s0.v - 0.3, h=s0.h)

        mesh = _mesh(2, 2)
        step = sharded_swe_step(grid, params, mesh, dt=0.005, method="rk4",
                                n_steps=10)
        sharded = step(sharded_state(s0, mesh))

        from njw_tpu.weather.dynamics import make_tendency_fn
        from njw_tpu.weather.integrators import make_stepper

        st = make_stepper("rk4", make_tendency_fn("shallow_water", grid,
                                                  params))
        s = s0
        for _ in range(10):
            _, s = st.step((), s, jnp.float32(0.005))
        np.testing.assert_allclose(np.asarray(sharded.h), np.asarray(s.h),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sharded.u), np.asarray(s.u),
                                   rtol=1e-5, atol=1e-5)

    def test_pe_reflective_bc_matches(self):
        """Sharded PE with reflective walls == whole-domain PE."""
        from njw_tpu.parallel.halo import sharded_pe_step
        from njw_tpu.weather.integrators import make_stepper
        from njw_tpu.weather.primitive import (
            pe_initial_state, pe_tendencies,
        )

        grid = GridSpec(nx=32, ny=32, levels=3, dx=1e5, dy=1e5,
                        bc="reflective")
        params = PhysicsParams(coriolis_f=1e-4)
        s0 = pe_initial_state(grid, u_jet=10.0, perturb=0.5)

        mesh = _mesh(2, 2)
        step = sharded_pe_step(grid, params, mesh, dt=30.0, method="rk4",
                               n_steps=10)
        sharded = step(sharded_state(s0, mesh))

        st = make_stepper("rk4", lambda s: pe_tendencies(s, grid, params))
        s = s0
        for _ in range(10):
            _, s = st.step((), s, jnp.float32(30.0))
        np.testing.assert_allclose(np.asarray(sharded.ps),
                                   np.asarray(s.ps), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sharded.u),
                                   np.asarray(s.u), rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("bc", ["periodic", "clamped"])
    def test_overlap_equals_padded_path(self, bc):
        """Interior/edge-overlap restructure (r2) must be numerically
        identical to the monolithic padded path — same arithmetic per
        point, only the schedule differs."""
        grid = GridSpec(nx=32, ny=32, bc=bc)
        params = PhysicsParams(coriolis_f=1e-4, beta=0.1, viscosity=0.01)
        s0 = make_initial_state("vortex", grid, strength=2.0)
        s0 = WeatherState(u=s0.u, v=s0.v, h=s0.h)
        mesh = _mesh(2, 2)
        a = sharded_swe_step(grid, params, mesh, dt=0.01, n_steps=5,
                             overlap=True)(sharded_state(s0, mesh))
        b = sharded_swe_step(grid, params, mesh, dt=0.01, n_steps=5,
                             overlap=False)(sharded_state(s0, mesh))
        np.testing.assert_array_equal(np.asarray(a.h), np.asarray(b.h))
        np.testing.assert_array_equal(np.asarray(a.u), np.asarray(b.u))

    @pytest.mark.parametrize("mesh_shape", [(2, 2), (4, 1)])
    def test_beta_plane_matches_single_device(self, mesh_shape):
        """Regression (ADVICE r1): sharded step must apply the beta-plane
        Coriolis field, not silently drop it."""
        grid = GridSpec(nx=32, ny=32)
        params = PhysicsParams(coriolis_f=1e-4, beta=0.5)
        state0 = make_initial_state("vortex", grid, strength=2.0)
        state0 = WeatherState(u=state0.u, v=state0.v, h=state0.h)

        mesh = _mesh(*mesh_shape)
        step = sharded_swe_step(grid, params, mesh, dt=0.01, method="rk4",
                                n_steps=20)
        sharded = step(sharded_state(state0, mesh))

        cfg = SimConfig(grid_width=32, grid_height=32, dt=0.01,
                        coriolis_f=1e-4, beta=0.5)
        sim = Simulation.from_config(cfg, "vortex", strength=2.0)
        sim.step(20)

        np.testing.assert_allclose(
            np.asarray(sharded.u), np.asarray(sim.state.u),
            rtol=1e-5, atol=1e-5,
        )
        # and it must differ from the beta=0 run (the r1 failure mode)
        step0 = sharded_swe_step(grid, PhysicsParams(coriolis_f=1e-4), mesh,
                                 dt=0.01, method="rk4", n_steps=20)
        nobeta = step0(sharded_state(state0, mesh))
        assert np.abs(np.asarray(sharded.u) - np.asarray(nobeta.u)).max() > 1e-4

    def test_determinism_across_step_partitions(self):
        """20 steps in one call == 2 calls of 10 (donation/aliasing safety)."""
        grid = GridSpec(nx=32, ny=32)
        params = PhysicsParams()
        s0 = make_initial_state("vortex", grid, strength=2.0)
        s0 = WeatherState(u=s0.u, v=s0.v, h=s0.h)
        mesh = _mesh(2, 2)

        step20 = sharded_swe_step(grid, params, mesh, dt=0.01, n_steps=20)
        step10 = sharded_swe_step(grid, params, mesh, dt=0.01, n_steps=10)
        a = step20(sharded_state(s0, mesh))
        b = step10(step10(sharded_state(s0, mesh)))
        np.testing.assert_array_equal(np.asarray(a.h), np.asarray(b.h))


class TestShardedPE:
    def test_matches_single_device(self):
        from njw_tpu.parallel.halo import sharded_pe_step
        from njw_tpu.weather.primitive import pe_initial_state

        grid = GridSpec(nx=48, ny=32, levels=4, dx=1e5, dy=1e5)
        params = PhysicsParams(coriolis_f=1e-4)
        s0 = pe_initial_state(grid, u_jet=15.0, perturb=0.5)

        mesh = _mesh(2, 2)
        step = sharded_pe_step(grid, params, mesh, dt=30.0, method="rk4",
                               n_steps=10)
        sharded = step(sharded_state(s0, mesh))

        cfg = SimConfig(model="primitive", grid_width=48, grid_height=32,
                        num_levels=4, dx=1e5, dy=1e5, dt=30.0,
                        coriolis_f=1e-4)
        sim = Simulation.from_config(cfg, "baroclinic", u_jet=15.0,
                                     perturb=0.5)
        sim.step(10)
        for name in ("u", "v", "T", "q", "ps"):
            np.testing.assert_allclose(
                np.asarray(getattr(sharded, name)),
                np.asarray(getattr(sim.state, name)),
                rtol=2e-5, atol=2e-5, err_msg=name,
            )


    def test_pallas_path_matches_single_device(self):
        """Sharded PE with the fused Pallas stage kernel (interpret mode)
        == whole-domain XLA run (the BASELINE config-5 fast path, r2)."""
        from njw_tpu.parallel.halo import sharded_pe_step_pallas
        from njw_tpu.weather.primitive import pe_initial_state

        grid = GridSpec(nx=128, ny=32, levels=4, dx=1e5, dy=1e5)
        params = PhysicsParams(coriolis_f=1e-4)
        s0 = pe_initial_state(grid, u_jet=15.0, perturb=0.5)

        mesh = Mesh(np.array(jax.devices()[:4]), ("y",))
        step = sharded_pe_step_pallas(grid, params, mesh, dt=30.0,
                                      n_steps=10, interpret=True)
        sharded = step(sharded_state(s0, mesh))

        cfg = SimConfig(model="primitive", grid_width=128, grid_height=32,
                        num_levels=4, dx=1e5, dy=1e5, dt=30.0,
                        coriolis_f=1e-4, backend="xla")
        sim = Simulation.from_config(cfg, "baroclinic", u_jet=15.0,
                                     perturb=0.5)
        sim.step(10)
        # tolerance matches the single-block kernel-vs-XLA bound (float
        # op-ordering differs inside the fused kernel), accumulated 10 steps
        for name in ("u", "v", "T", "q", "ps"):
            np.testing.assert_allclose(
                np.asarray(getattr(sharded, name)),
                np.asarray(getattr(sim.state, name)),
                rtol=1e-3, atol=5e-4, err_msg=name,
            )


class TestShardedPEFusedRK4:
    def test_fused_rk4_path_matches_single_device(self):
        """Sharded PE with the WHOLE-RK4 fused kernel (one 4-row halo
        exchange + one kernel pass per step, r4) == whole-domain XLA."""
        from njw_tpu.parallel.halo import sharded_pe_step_pallas_fused
        from njw_tpu.weather.primitive import pe_initial_state

        grid = GridSpec(nx=128, ny=32, levels=4, dx=1e5, dy=1e5)
        params = PhysicsParams(coriolis_f=1e-4)
        s0 = pe_initial_state(grid, u_jet=15.0, perturb=0.5)

        mesh = Mesh(np.array(jax.devices()[:4]), ("y",))
        step = sharded_pe_step_pallas_fused(grid, params, mesh, dt=30.0,
                                            n_steps=10, interpret=True)
        sharded = step(sharded_state(s0, mesh))

        cfg = SimConfig(model="primitive", grid_width=128, grid_height=32,
                        num_levels=4, dx=1e5, dy=1e5, dt=30.0,
                        coriolis_f=1e-4, backend="xla")
        sim = Simulation.from_config(cfg, "baroclinic", u_jet=15.0,
                                     perturb=0.5)
        sim.step(10)
        for name in ("u", "v", "T", "q", "ps"):
            np.testing.assert_allclose(
                np.asarray(getattr(sharded, name)),
                np.asarray(getattr(sim.state, name)),
                rtol=1e-3, atol=5e-4, err_msg=name,
            )

    @pytest.mark.parametrize("mesh_shape", [(2, 2), (1, 2)])
    def test_fused_rk4_2d_mesh_matches_single_device(self, mesh_shape):
        """Whole-RK4 fused kernel over the ('y','x') mesh (one exchange
        + one kernel per step; 4-lane x slabs + 4-row y slabs with
        corners riding the x-padded columns, r4) == whole-domain XLA."""
        from njw_tpu.parallel.halo import sharded_pe_step_pallas_fused
        from njw_tpu.weather.primitive import pe_initial_state

        py, px = mesh_shape
        grid = GridSpec(nx=128 * px, ny=16 * py, levels=3, dx=1e5, dy=1e5)
        params = PhysicsParams(coriolis_f=1e-4)
        s0 = pe_initial_state(grid, u_jet=15.0, perturb=0.5)

        mesh = Mesh(np.array(jax.devices()[:py * px]).reshape(py, px),
                    ("y", "x"))
        step = sharded_pe_step_pallas_fused(grid, params, mesh, dt=30.0,
                                            n_steps=10, interpret=True)
        sharded = step(sharded_state(s0, mesh))

        cfg = SimConfig(model="primitive", grid_width=grid.nx,
                        grid_height=grid.ny, num_levels=3, dx=1e5, dy=1e5,
                        dt=30.0, coriolis_f=1e-4, backend="xla")
        sim = Simulation.from_config(cfg, "baroclinic", u_jet=15.0,
                                     perturb=0.5)
        sim.step(10)
        for name in ("u", "v", "T", "q", "ps"):
            np.testing.assert_allclose(
                np.asarray(getattr(sharded, name)),
                np.asarray(getattr(sim.state, name)),
                rtol=1e-3, atol=5e-4, err_msg=name,
            )


    def test_fused_2d_concat_form_matches(self):
        """carry=False keeps the r4 concat form — both forms must match
        single-device (the TPU A/B needs both live)."""
        from njw_tpu.parallel.halo import sharded_pe_step_pallas_fused_2d
        from njw_tpu.weather.primitive import pe_initial_state

        grid = GridSpec(nx=256, ny=32, levels=3, dx=1e5, dy=1e5)
        params = PhysicsParams(coriolis_f=1e-4)
        s0 = pe_initial_state(grid, u_jet=15.0, perturb=0.5)
        mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("y", "x"))
        outs = []
        for carry in (True, False):
            step = sharded_pe_step_pallas_fused_2d(
                grid, params, mesh, dt=30.0, n_steps=6, interpret=True,
                carry=carry)
            outs.append(step(sharded_state(s0, mesh)))
        for name in ("u", "v", "T", "q", "ps"):
            np.testing.assert_allclose(
                np.asarray(getattr(outs[0], name)),
                np.asarray(getattr(outs[1], name)),
                rtol=1e-4, atol=1e-5, err_msg=name,
            )

    def test_fused_2d_vmem_fallback_matches(self, monkeypatch):
        """When no strip height fits VMEM, the fused 2-D constructor must
        fall back to the 4-stage path and still match single-device
        (ADVICE r4: the fallback branch was never exercised)."""
        import njw_tpu.ops.pe_stencil as pe_stencil
        from njw_tpu.parallel.halo import sharded_pe_step_pallas_fused

        monkeypatch.setattr(pe_stencil, "pe_rk4_pick_by_2d",
                            lambda L, ly, lx: None)
        from njw_tpu.weather.primitive import pe_initial_state

        grid = GridSpec(nx=256, ny=32, levels=3, dx=1e5, dy=1e5)
        params = PhysicsParams(coriolis_f=1e-4)
        s0 = pe_initial_state(grid, u_jet=15.0, perturb=0.5)

        mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("y", "x"))
        step = sharded_pe_step_pallas_fused(grid, params, mesh, dt=30.0,
                                            n_steps=6, interpret=True)
        sharded = step(sharded_state(s0, mesh))

        cfg = SimConfig(model="primitive", grid_width=256, grid_height=32,
                        num_levels=3, dx=1e5, dy=1e5, dt=30.0,
                        coriolis_f=1e-4, backend="xla")
        sim = Simulation.from_config(cfg, "baroclinic", u_jet=15.0,
                                     perturb=0.5)
        sim.step(6)
        for name in ("u", "v", "T", "q", "ps"):
            np.testing.assert_allclose(
                np.asarray(getattr(sharded, name)),
                np.asarray(getattr(sim.state, name)),
                rtol=1e-3, atol=5e-4, err_msg=name,
            )


class TestShardedSWEPallas2D:
    @pytest.mark.parametrize("mesh_shape", [(2, 4), (2, 2)])
    def test_matches_single_device(self, mesh_shape):
        """Fused-Pallas 2-D decomposition (x halo slabs + x_halo kernel)
        == whole-domain run on a ('y','x') mesh (VERDICT r1 #5)."""
        from njw_tpu.parallel.halo import sharded_swe_step_pallas

        py, px = mesh_shape
        grid = GridSpec(nx=128 * px, ny=16 * py)
        params = PhysicsParams(coriolis_f=1e-4)
        s0 = make_initial_state("vortex", grid, strength=2.0)
        s0 = WeatherState(u=s0.u, v=s0.v, h=s0.h)

        mesh = _mesh(py, px)
        step = sharded_swe_step_pallas(grid, params, mesh, dt=0.01,
                                       n_steps=10, interpret=True)
        sharded = step(sharded_state(s0, mesh))

        cfg = SimConfig(grid_width=grid.nx, grid_height=grid.ny, dt=0.01,
                        coriolis_f=1e-4, backend="xla")
        sim = Simulation.from_config(cfg, "vortex", strength=2.0)
        sim.step(10)
        np.testing.assert_allclose(
            np.asarray(sharded.h), np.asarray(sim.state.h),
            rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(sharded.u), np.asarray(sim.state.u),
            rtol=1e-5, atol=1e-4)


class TestDistributedFFT:
    def test_poisson_matches_single_device(self):
        from jax.sharding import Mesh
        from njw_tpu.ops.spectral import poisson_solve
        from njw_tpu.parallel.fft import make_distributed_poisson

        rng = np.random.default_rng(0)
        f = rng.standard_normal((64, 64)).astype(np.float32)
        f -= f.mean()
        devs = np.array(jax.devices()[:4])
        mesh = Mesh(devs, ("y",))
        solve = make_distributed_poisson(mesh, 64, 64, 1.0, 1.0)
        got = np.asarray(solve(jnp.asarray(f)))
        want = np.asarray(poisson_solve(jnp.asarray(f), 1.0, 1.0))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    @pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2), (2, 2)])
    def test_poisson_2d_mesh_matches_single_device(self, mesh_shape):
        """Pencil-decomposed transpose FFT over a ('y','x') mesh == the
        single-device spectral solve (anisotropic dx/dy)."""
        from njw_tpu.ops.spectral import poisson_solve
        from njw_tpu.parallel.fft import make_distributed_poisson_2d

        rng = np.random.default_rng(3)
        f = rng.standard_normal((64, 64)).astype(np.float32)
        f -= f.mean()
        mesh = _mesh(*mesh_shape)
        solve = make_distributed_poisson_2d(mesh, 64, 64, 0.7, 1.3)
        got = np.asarray(solve(jnp.asarray(f)))
        want = np.asarray(poisson_solve(jnp.asarray(f), 0.7, 1.3))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_spectral_apply_2d_roundtrip_identity(self):
        """symbol == 1 must reproduce the input exactly (pencilize /
        combined-axis transpose / unpencilize round-trip)."""
        from njw_tpu.parallel.fft import spectral_apply_distributed_2d

        rng = np.random.default_rng(5)
        f = rng.standard_normal((32, 64)).astype(np.float32)
        mesh = _mesh(2, 4)

        def local(fl):
            return spectral_apply_distributed_2d(fl, lambda kx, ky: 1.0)

        fn = jax.jit(jax.shard_map(
            local, mesh=mesh, in_specs=P("y", "x"), out_specs=P("y", "x"),
            check_vma=False))
        got = np.asarray(fn(jnp.asarray(f)))
        np.testing.assert_allclose(got, f, rtol=1e-5, atol=1e-5)


class TestShardedBarotropic:
    def test_matches_single_device(self):
        from jax.sharding import Mesh
        from njw_tpu.parallel.halo import sharded_barotropic_step

        grid = GridSpec(nx=64, ny=64, dx=1.0, dy=1.0)
        params = PhysicsParams(beta=1e-3)
        cfg = SimConfig(model="barotropic", grid_width=64, grid_height=64,
                        dt=0.05, integration_method="rk4", beta=1e-3)
        sim = Simulation.from_config(cfg, "vortex", strength=3.0)
        z0 = sim.state

        devs = np.array(jax.devices()[:4])
        mesh = Mesh(devs, ("y",))
        step = sharded_barotropic_step(grid, params, mesh, dt=0.05,
                                       method="rk4", n_steps=10)
        from jax.sharding import NamedSharding
        z0_sharded = jax.tree.map(
            lambda a: jax.device_put(a, NamedSharding(mesh, P("y", None))),
            z0)
        sharded = step(z0_sharded)
        sim.step(10)
        np.testing.assert_allclose(
            np.asarray(sharded.zeta), np.asarray(sim.state.zeta),
            rtol=5e-4, atol=5e-5,
        )

    @pytest.mark.parametrize("mesh_shape", [(2, 4), (2, 2)])
    def test_2d_mesh_matches_single_device(self, mesh_shape):
        """2-D ('y','x') decomposition (pencil FFT + 2-D halo Arakawa,
        with beta and viscosity) == single-device run. Dispatch goes
        through sharded_barotropic_step's 2-D branch."""
        from jax.sharding import Mesh, NamedSharding
        from njw_tpu.parallel.halo import sharded_barotropic_step

        grid = GridSpec(nx=64, ny=64, dx=1.0, dy=1.0)
        params = PhysicsParams(beta=1e-3, viscosity=1e-3)
        cfg = SimConfig(model="barotropic", grid_width=64, grid_height=64,
                        dt=0.05, integration_method="rk4", beta=1e-3,
                        viscosity=1e-3)
        sim = Simulation.from_config(cfg, "vortex", strength=3.0)
        z0 = sim.state

        mesh = _mesh(*mesh_shape)
        step = sharded_barotropic_step(grid, params, mesh, dt=0.05,
                                       method="rk4", n_steps=10)
        z0_sharded = jax.tree.map(
            lambda a: jax.device_put(a, NamedSharding(mesh, P("y", "x"))),
            z0)
        sharded = step(z0_sharded)
        sim.step(10)
        np.testing.assert_allclose(
            np.asarray(sharded.zeta), np.asarray(sim.state.zeta),
            rtol=5e-4, atol=5e-5,
        )


class TestShardedPallasSWE:
    def test_matches_xla_sharded_and_single_device(self):
        """The pallas-in-shard_map fast path == single-device result
        (interpret-mode kernel on the CPU mesh)."""
        from jax.sharding import Mesh
        from njw_tpu.parallel.halo import sharded_swe_step_pallas

        grid = GridSpec(nx=128, ny=64)
        params = PhysicsParams(coriolis_f=1e-4)
        s0 = make_initial_state("vortex", grid, strength=2.0)
        s0 = WeatherState(u=s0.u, v=s0.v, h=s0.h)

        mesh = Mesh(np.array(jax.devices()[:4]), ("y",))
        step = sharded_swe_step_pallas(grid, params, mesh, dt=0.01,
                                       n_steps=10, interpret=True)
        sharded = step(sharded_state(s0, mesh))

        cfg = SimConfig(grid_width=128, grid_height=64, dt=0.01,
                        coriolis_f=1e-4, backend="xla")
        sim = Simulation.from_config(cfg, "vortex", strength=2.0)
        sim.step(10)
        np.testing.assert_allclose(
            np.asarray(sharded.h), np.asarray(sim.state.h),
            rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(sharded.u), np.asarray(sim.state.u),
            rtol=1e-5, atol=1e-4)


class TestShardedPEPallas2D:
    @pytest.mark.parametrize("mesh_shape", [(2, 4), (2, 2)])
    def test_matches_single_device(self, mesh_shape):
        """2-D ('y','x') PE-Pallas decomposition == whole-domain XLA
        (x halo slabs + local2d stage kernel; BASELINE config-5 mesh)."""
        from njw_tpu.parallel.halo import sharded_pe_step_pallas
        from njw_tpu.weather.primitive import pe_initial_state

        py, px = mesh_shape
        grid = GridSpec(nx=128 * px, ny=16 * py, levels=3, dx=1e5, dy=1e5)
        params = PhysicsParams(coriolis_f=1e-4)
        s0 = pe_initial_state(grid, u_jet=15.0, perturb=0.5)

        mesh = _mesh(py, px)
        step = sharded_pe_step_pallas(grid, params, mesh, dt=30.0,
                                      n_steps=5, interpret=True)
        sharded = step(sharded_state(s0, mesh))

        cfg = SimConfig(model="primitive", grid_width=grid.nx,
                        grid_height=grid.ny, num_levels=3, dx=1e5, dy=1e5,
                        dt=30.0, coriolis_f=1e-4, backend="xla")
        sim = Simulation.from_config(cfg, "baroclinic", u_jet=15.0,
                                     perturb=0.5)
        sim.step(5)
        for name in ("u", "v", "T", "q", "ps"):
            np.testing.assert_allclose(
                np.asarray(getattr(sharded, name)),
                np.asarray(getattr(sim.state, name)),
                rtol=1e-3, atol=5e-4, err_msg=name,
            )
