"""Scaling harness, config system, MD CLI, bench CLI."""
import json

import numpy as np
import pytest

from njw_tpu.bench.scaling import halo_overlap_efficiency, swe_scaling_sweep
from njw_tpu.utils.config import apply_cli_overrides, load_config, save_config
from njw_tpu.weather.model import SimConfig


class TestScalingHarness:
    def test_strong_scaling_sweep(self):
        rows = swe_scaling_sweep(global_grid=64, steps_per_call=5,
                                 device_counts=[1, 4])
        assert len(rows) == 2
        assert rows[0]["devices"] == 1 and rows[1]["devices"] == 4
        for r in rows:
            assert r["grid_points_per_second"] > 0
            assert 0 < r["scaling_efficiency"] <= 4.0

    def test_weak_scaling_grid_grows(self):
        rows = swe_scaling_sweep(global_grid=32, steps_per_call=2,
                                 device_counts=[1, 4], mode="weak")
        assert rows[1]["grid"] != rows[0]["grid"]

    def test_halo_overlap_metric(self):
        m = halo_overlap_efficiency(grid_size=64, n_devices=4, n_steps=5)
        assert 0 < m["overlap_efficiency"] <= 1.0
        assert m["t_full_s"] > 0

    def test_pe_mesh_shape_sweep(self):
        """Config-5 mesh-shape pre-validation (VERDICT r4 #8): every
        (py, px) factorization of the fused PE path must be correct on
        the proxy mesh and report its collective footprint."""
        from njw_tpu.bench.scaling import pe_mesh_shape_sweep

        rows = pe_mesh_shape_sweep(n_devices=4, ny=32, nx=512, L=4,
                                   shapes=[(4, 1), (2, 2), (1, 4)])
        assert len(rows) == 3
        for r in rows:
            assert r["ok"], r
            assert r["collective_permutes_per_step"] > 0
            assert r["ici_payload_bytes_per_step"] > 0


class TestConfig:
    def test_json_roundtrip_and_overrides(self, tmp_path):
        cfg = SimConfig(grid_width=128, dt=0.02)
        p = save_config(cfg, str(tmp_path / "cfg.json"))
        back = load_config(SimConfig, p, grid_height=64)
        assert back.grid_width == 128 and back.grid_height == 64
        assert back.dt == 0.02

    def test_yaml_roundtrip(self, tmp_path):
        pytest.importorskip("yaml")
        cfg = SimConfig(model="barotropic")
        p = save_config(cfg, str(tmp_path / "cfg.yaml"))
        back = load_config(SimConfig, p)
        assert back.model == "barotropic"

    def test_unknown_key_raises(self, tmp_path):
        p = tmp_path / "bad.json"
        p.write_text(json.dumps({"grid_width": 4, "warp_speed": 9}))
        with pytest.raises(ValueError, match="unknown config keys"):
            load_config(SimConfig, str(p))

    def test_cli_overrides_coerce_types(self):
        cfg = SimConfig()
        out = apply_cli_overrides(cfg, ["grid_width=512", "dt=0.5",
                                        "model=primitive"])
        assert out.grid_width == 512 and out.dt == 0.5
        assert out.model == "primitive"
        with pytest.raises(ValueError):
            apply_cli_overrides(cfg, ["nope=1"])


class TestCLIs:
    def test_md_cli(self, tmp_path, capsys):
        from njw_tpu.md.__main__ import main

        rc = main(["--system", "lj_fluid", "--num-atoms", "27",
                   "--steps", "20",
                   "--output-state", str(tmp_path / "s.json")])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["atoms"] == 27 and out["steps"] == 20
        assert (tmp_path / "s.json").exists()

    def test_bench_cli(self, tmp_path, capsys):
        from njw_tpu.bench.__main__ import main

        rc = main(["--workloads", "nbody", "--params",
                   '{"nbody": {"num_particles": 128, "num_steps": 3}}',
                   "--output-dir", str(tmp_path)])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        row = json.loads(out[-1])
        assert row["workload"] == "nbody"
        assert (tmp_path / "results.json").exists()


class TestDatasetsProfiling:
    def test_synthetic_dem_properties(self):
        from njw_tpu.geospatial.datasets import synthetic_dem

        dem = synthetic_dem(128, relief=50.0, seed=1)
        assert dem.shape == (128, 128)
        assert 0 <= dem.min() and dem.max() == pytest.approx(50.0, abs=1e-3)
        # deterministic
        np.testing.assert_array_equal(dem, synthetic_dem(128, relief=50.0,
                                                         seed=1))

    def test_synthetic_point_cloud_scene(self):
        from njw_tpu.geospatial.datasets import synthetic_point_cloud

        pc = synthetic_point_cloud(5000, seed=2)
        assert pc.n >= 4500
        lo, hi = pc.bounds()
        assert hi[2] > lo[2] + 5.0  # buildings/trees give vertical extent

    def test_timer_and_opstats(self):
        from njw_tpu.utils.profiling import OpStats, Timer, time_jitted
        import jax, jax.numpy as jnp

        t = Timer()
        with t.phase("a"):
            pass
        with t.phase("a"):
            pass
        assert t.counts["a"] == 2 and "a" in t.report()

        stats = OpStats()
        stats.record("stencil", (8, 128), 2.0)
        stats.record("stencil", (16, 128), 1.0)
        assert stats.best_key("stencil") == (16, 128)

        f = jax.jit(lambda x: x * 2)
        m = time_jitted(f, jnp.ones(8), repeats=2)
        assert m["best_s"] > 0


class TestAPIParity:
    def test_run_until(self):
        from njw_tpu.weather import SimConfig, Simulation

        cfg = SimConfig(grid_width=32, grid_height=32, dt=0.01)
        sim = Simulation.from_config(cfg, "vortex", strength=2.0)
        sim.run_until(0.5)
        assert sim.step_count == 50

    def test_device_info(self):
        from njw_tpu.platform import get_device_info, is_tpu_available

        info = get_device_info()
        assert "generation" in info and info["num_devices"] >= 1
        assert isinstance(is_tpu_available(), bool)

    def test_weather_cli_output_manager(self, tmp_path, capsys):
        from njw_tpu.weather.__main__ import main

        rc = main(["--width", "32", "--height", "32", "--steps", "20",
                   "--output-interval", "10", "--output-format", "npz",
                   "--output-dir", str(tmp_path), "--json"])
        assert rc == 0
        import os
        files = [f for f in os.listdir(tmp_path) if f.endswith(".npz")]
        assert len(files) >= 2

    def test_medical_3d_filter(self):
        from njw_tpu.medical import apply_filter

        vol = np.random.default_rng(0).standard_normal(
            (4, 16, 16)).astype(np.float32)
        out = apply_filter(vol, "gaussian", sigma=1.0)
        assert out.shape == (4, 16, 16)
