"""Benchmark suite + cost modeling.

Capability parity with the reference benchmark layer (benchmark/, ~5.4k
LoC; SURVEY §2.8): per-workload benchmarks with a common result schema,
suite runner with JSON persistence, cost models (on-prem TPU pod vs cloud
TPU/GPU pricing — replacing the reference's Jetson/DGX/Slurm cost models),
and report generation.
"""
from njw_tpu.bench.suite import (
    BenchmarkResult, WorkloadBenchmark, BenchmarkSuite,
    WeatherBenchmark, NBodyBenchmark, MDBenchmark, SignalBenchmark,
    MedicalBenchmark, GeospatialBenchmark,
)
from njw_tpu.bench.cost import (
    ComputeEnvironment, CostModel, OnPremTPUCostModel, CloudTPUCostModel,
    CloudGPUCostModel, SlurmClusterCostModel, CostModelFactory,
    compare_costs, load_cost_model,
)
from njw_tpu.bench.report import generate_report
