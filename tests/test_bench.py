"""Benchmark suite + cost-model tests (mirrors ref
tests/benchmark/test_cost_modeling.py:34-514 pure-logic coverage)."""
import json
import os

import numpy as np
import pytest

from njw_tpu.bench import (
    BenchmarkResult, BenchmarkSuite, CloudGPUCostModel, CloudTPUCostModel,
    ComputeEnvironment, CostModelFactory, GeospatialBenchmark,
    NBodyBenchmark, OnPremTPUCostModel, SignalBenchmark,
    SlurmClusterCostModel, WeatherBenchmark, compare_costs, generate_report,
)


class TestCostModels:
    def test_on_prem_rate_components(self):
        m = OnPremTPUCostModel(node_cost=3600.0, nodes=1, power_watts=1000.0,
                               power_cost_per_kwh=0.1,
                               amortization_months=1.0, utilization=1.0,
                               maintenance_factor=0.0)
        # capital: 3600 / (720 h) = 5/h; power: 1 kW * 0.1 = 0.1/h
        assert m.hourly_rate() == pytest.approx(5.1, rel=1e-6)

    def test_cloud_tpu_spot_discount(self):
        full = CloudTPUCostModel(chips=4, rate_per_chip_hour=1.0)
        spot = CloudTPUCostModel(chips=4, rate_per_chip_hour=1.0,
                                 spot_discount=0.6)
        assert full.hourly_rate() == 4.0
        assert spot.hourly_rate() == pytest.approx(1.6)

    def test_cost_of_seconds(self):
        m = CloudGPUCostModel(rate_per_gpu_hour=3.6)
        c = m.cost_of(1000.0)
        assert c["execution_cost"] == pytest.approx(1.0)
        assert c["currency"] == "USD"

    def test_slurm_overhead(self):
        m = SlurmClusterCostModel(cost_per_node_hour=1.0, nodes=2,
                                  queue_overhead_factor=1.5)
        assert m.hourly_rate() == pytest.approx(3.0)

    def test_factory_creates_all(self):
        for env in CostModelFactory.available():
            m = CostModelFactory.create(env)
            assert m.hourly_rate() >= 0

    def test_factory_unknown_raises(self):
        with pytest.raises(ValueError):
            CostModelFactory.create("mainframe")

    def test_shipped_configs_all_load(self):
        """Every configs/*.yaml builds a working cost model (ref ships
        the same set: benchmark/configs/slurm_cluster_jetson.yaml + 7
        siblings — round-1/2 gap)."""
        import glob
        import os

        from njw_tpu.bench import load_cost_model

        root = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "configs")
        paths = sorted(p for p in glob.glob(os.path.join(root, "*.yaml"))
                       if "benchmark" not in os.path.basename(p))
        assert len(paths) >= 6
        envs = set()
        for p in paths:
            m = load_cost_model(p)
            assert m.hourly_rate() >= 0
            assert m.cost_of(3600.0)["execution_cost"] >= 0
            envs.add(type(m).__name__)
        assert len(envs) >= 4  # covers most model families

    def test_load_cost_model_overrides_and_unknown_keys(self, tmp_path):
        from njw_tpu.bench import load_cost_model

        p = tmp_path / "c.yaml"
        p.write_text("environment: cloud_tpu\nchips: 4\n"
                     "rate_per_chip_hour: 2.0\n")
        m = load_cost_model(str(p), chips=8)
        assert m.hourly_rate() == pytest.approx(16.0)
        p.write_text("environment: cloud_tpu\nbogus_key: 1\n")
        with pytest.raises(ValueError, match="bogus_key"):
            load_cost_model(str(p))
        p.write_text("chips: 4\n")
        with pytest.raises(ValueError, match="environment"):
            load_cost_model(str(p))

    def test_cli_cost_config_roundtrip(self, tmp_path):
        """python -m njw_tpu.bench --cost-config <shipped yaml> attaches
        the configured cost metrics to the result rows."""
        import json
        import os

        from njw_tpu.bench.__main__ import main

        cfg = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "configs", "cloud_tpu_v5e.yaml")
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = main(["--workloads", "signal", "--cost-config", cfg,
                       "--params",
                       '{"signal": {"num_samples": 4096, "batch": 2}}',
                       "--output-dir", str(tmp_path)])
        assert rc == 0
        row = json.loads(buf.getvalue().splitlines()[0])
        assert row["cost_metrics"]["hourly_rate"] == pytest.approx(1.20)

    def test_compare_costs(self):
        out = compare_costs({
            ComputeEnvironment.ON_PREM_TPU: 100.0,
            ComputeEnvironment.CLOUD_TPU: 50.0,
        })
        assert out["cheapest"] in ("on_prem_tpu", "cloud_tpu")
        # on-prem (capital + low marginal rate) vs cloud (pure hourly)
        # genuinely cross, so break-even must be a positive hour count
        assert out["break_even_hours"] is not None
        assert out["break_even_hours"] > 0

    def test_break_even_none_for_pure_hourly_pair(self):
        """Two pay-as-you-go models never cross: no fake negative
        break-even (ADVICE r1)."""
        out = compare_costs({
            ComputeEnvironment.CLOUD_TPU: 50.0,
            ComputeEnvironment.CLOUD_GPU: 50.0,
        })
        assert out["break_even_hours"] is None


class TestBenchmarkResult:
    def test_serialization_roundtrip(self):
        r = BenchmarkResult("weather", "tpu:v5e", 1.5, 1000.0, "steps/s",
                            additional_metrics={"grid": 256})
        back = BenchmarkResult.from_dict(json.loads(json.dumps(r.to_dict())))
        assert back.workload == "weather"
        assert back.additional_metrics["grid"] == 256

    def test_cost_attachment(self):
        r = BenchmarkResult("x", "cpu", 3600.0, 1.0, "u")
        c = r.calculate_cost_metrics(CloudTPUCostModel(rate_per_chip_hour=2.0))
        assert c["execution_cost"] == pytest.approx(2.0)
        assert r.cost_metrics["execution_cost"] == pytest.approx(2.0)


class TestSuite:
    def test_run_small_benchmarks(self, tmp_path):
        suite = BenchmarkSuite(output_dir=str(tmp_path))
        r1 = suite.run_benchmark("weather", grid_size=64, num_steps=10)
        r2 = suite.run_benchmark("nbody", num_particles=128, num_steps=5)
        assert r1.throughput > 0 and r2.throughput > 0
        assert r1.workload == "weather"
        path = suite.save_results()
        loaded = BenchmarkSuite.load_results(path)
        assert len(loaded) == 2

    def test_unknown_benchmark_raises(self):
        with pytest.raises(ValueError, match="unknown benchmark"):
            BenchmarkSuite().run_benchmark("quantum")

    def test_registry_extension(self, tmp_path):
        suite = BenchmarkSuite(str(tmp_path))

        class Custom(WeatherBenchmark):
            name = "custom"

        suite.register("custom", Custom)
        r = suite.run_benchmark("custom", grid_size=32, num_steps=5)
        assert r.workload == "custom"

    def test_cost_model_integration(self, tmp_path):
        suite = BenchmarkSuite(str(tmp_path))
        r = suite.run_benchmark("signal", num_samples=10_000, batch=2,
                                cost_model=CloudTPUCostModel())
        assert r.cost_metrics["execution_cost"] >= 0

    def test_report_generation(self, tmp_path):
        suite = BenchmarkSuite(str(tmp_path))
        suite.run_benchmark("nbody", num_particles=128, num_steps=5)
        suite.run_benchmark("geospatial", dem_size=64)
        path = suite.generate_reports()
        assert os.path.exists(path)
        content = open(path).read()
        assert "nbody" in content and "geospatial" in content
        assert os.path.exists(os.path.join(str(tmp_path),
                                           "throughput.png"))


class TestReportGenerators:
    """Full generator set (ref: benchmark/visualization.py:21-1319)."""

    def _results(self):
        return [
            BenchmarkResult(
                "weather", "tpu:v5e", 1.5, 1.2e10, "grid-points/s",
                memory_bytes=1 << 24,
                additional_metrics={"energy_joules": 450.0,
                                    "duty_factor": 0.83}),
            BenchmarkResult(
                "nbody", "tpu:v5e", 0.8, 3.0e9, "interactions/s",
                memory_bytes=1 << 20,
                additional_metrics={"energy_joules": 210.0,
                                    "duty_factor": 0.71}),
        ]

    def _scaling(self):
        return [
            {"devices": 1, "grid_points_per_second": 1e10,
             "scaling_efficiency": 1.0},
            {"devices": 4, "grid_points_per_second": 3.6e10,
             "scaling_efficiency": 0.9},
            {"devices": 8, "grid_points_per_second": 6.4e10,
             "scaling_efficiency": 0.8},
        ]

    def test_full_report_renders_all_generators(self, tmp_path):
        from njw_tpu.bench.report import generate_report

        path = generate_report(self._results(), str(tmp_path),
                               scaling_rows=self._scaling())
        page = open(path).read()
        import os

        expected = ["execution_time.png", "throughput.png", "memory.png",
                    "energy.png", "util.png", "cost.png",
                    "cost_per_op.png", "break_even.png", "scaling.png",
                    "scaling_efficiency.png"]
        for name in expected:
            assert os.path.exists(tmp_path / name), name
            assert name in page
        assert "environment cost comparison" in page
        assert "cheapest" in page

    def test_generators_skip_missing_metrics(self, tmp_path):
        from njw_tpu.bench.report import plot_device_utilization, plot_energy

        bare = [BenchmarkResult("md", "cpu", 1.0, 1e6, "steps/s")]
        assert plot_energy(bare, str(tmp_path / "e.png")) is None
        assert plot_device_utilization(bare, str(tmp_path / "u.png")) is None

    def test_break_even_chart_marks_crossover(self, tmp_path):
        from njw_tpu.bench.report import plot_break_even

        p = plot_break_even(str(tmp_path / "be.png"))
        import os

        assert os.path.exists(p)
