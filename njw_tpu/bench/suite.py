"""Benchmark suite: per-workload benchmarks + runner.

ref: benchmark/benchmark_suite.py:36-109 BenchmarkResult (workload, device,
exec time, memory, throughput, additional metrics, cost, ISO timestamp,
(de)serialize), :247-342 WorkloadBenchmark base, :354-971 per-workload
subclasses, :973-1234 BenchmarkSuite (registry, run_benchmark, run_all,
save/load JSON, generate_reports).
"""
from __future__ import annotations

import dataclasses
import datetime
import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import numpy as np

from njw_tpu.platform.device import detect


@dataclass
class BenchmarkResult:
    """ref: benchmark_suite.py:36-109."""

    workload: str
    device: str
    execution_time_s: float
    throughput: float
    throughput_unit: str
    memory_bytes: int = 0
    additional_metrics: dict = field(default_factory=dict)
    cost_metrics: dict = field(default_factory=dict)
    timestamp: str = field(
        default_factory=lambda: datetime.datetime.now(
            datetime.timezone.utc).isoformat())

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "BenchmarkResult":
        return cls(**d)

    def calculate_cost_metrics(self, cost_model) -> dict:
        """ref: benchmark_suite.py calculate_cost_metrics."""
        self.cost_metrics = cost_model.cost_of(self.execution_time_s)
        return self.cost_metrics


class WorkloadBenchmark:
    """Base benchmark (ref: benchmark_suite.py:247-342). Subclasses
    implement setup() -> state and execute(state) -> (work_items, unit,
    extra_metrics)."""

    name = "base"

    def __init__(self, **params):
        self.params = params

    def setup(self) -> Any:
        raise NotImplementedError

    def execute(self, state, repeats: int = 1) -> tuple[float, str, dict]:
        """Run `repeats` x the workload INSIDE one compiled invocation
        (a longer scan / fori_loop, not a Python loop) and return
        (work_for_ONE_repeat, unit, extra_metrics)."""
        raise NotImplementedError

    def sync(self, state) -> None:
        """Hard device sync after execute. block_until_ready can report
        early on remote-tunnel TPU backends (CLAUDE.md), so the default
        forces a small D2H copy of every array leaf; benchmarks whose
        state is not a pytree of arrays override this."""
        for a in _leaves(state):
            if hasattr(a, "shape") and hasattr(a, "dtype") and a.size:
                np.asarray(a[(0,) * a.ndim])  # device-side slice, tiny D2H

    def run(self) -> BenchmarkResult:
        """Work-doubling differential: time execute(repeats=1) and
        execute(repeats=2) after warming BOTH (a jitted scan's length is
        baked into its executable), report the marginal (t2 - t1). This
        cancels the per-dispatch overhead (~43 ms on a tunneled TPU
        backend) that made r2's suite rows 20x below the headline bench
        (VERDICT r2 weak #3); bench.py uses the same discipline."""
        caps = detect()
        state = self.setup()
        for r in (1, 2):  # compile + warm both executables
            self.execute(state, r)
            self.sync(state)

        def timed(r):
            t0 = time.perf_counter()
            out = self.execute(state, r)
            self.sync(state)
            return time.perf_counter() - t0, out

        t1, (work, unit, extra) = timed(1)
        t2, _ = timed(2)
        elapsed = max(t2 - t1, 1e-9)
        mem = sum(
            int(np.prod(a.shape)) * a.dtype.itemsize
            for a in _leaves(state) if hasattr(a, "shape"))
        return BenchmarkResult(
            workload=self.name,
            device=f"{caps.platform}:{caps.generation}",
            execution_time_s=elapsed,
            throughput=work / elapsed,
            throughput_unit=unit,
            memory_bytes=mem,
            additional_metrics={
                **extra, **self.params,
                "timing_method": "work-doubling differential "
                                 "(dispatch overhead cancelled)",
                "dispatch_overhead_s": round(max(2 * t1 - t2, 0.0), 6),
            },
        )


def _leaves(state):
    import jax

    return jax.tree.leaves(state)


class WeatherBenchmark(WorkloadBenchmark):
    """SWE steps/s and grid_points_per_second = grid^2 * steps/s
    (ref: WeatherSimulationBenchmark, benchmark_suite.py:524-606)."""

    name = "weather"

    def __init__(self, grid_size: int = 512, num_steps: int = 100,
                 model: str = "shallow_water", dt: float = 0.005, **kw):
        super().__init__(grid_size=grid_size, num_steps=num_steps,
                         model=model, **kw)
        self.grid_size = grid_size
        self.num_steps = num_steps
        self.model = model
        self.dt = dt

    def setup(self):
        from njw_tpu.weather import SimConfig, Simulation

        cfg = SimConfig(model=self.model, grid_width=self.grid_size,
                        grid_height=self.grid_size, dt=self.dt,
                        coriolis_f=1e-4)
        ic = "vortex" if self.model != "primitive" else "baroclinic"
        kw = {"strength": 2.0} if self.model != "primitive" else {}
        return Simulation.from_config(cfg, ic, **kw)

    INNER = 20  # scan chunks of INNER*num_steps: the marginal must be
    # >> the ~5 ms dispatch noise of a tunneled TPU backend

    def execute(self, sim, repeats: int = 1):
        sim.step(self.num_steps * self.INNER * repeats)  # ONE scan chunk
        gps = self.grid_size ** 2
        return self.num_steps * self.INNER, "steps/s", {
            "grid_points_per_second_factor": gps,
            "backend": sim.stepper.name,
            "steps_per_repeat": self.num_steps * self.INNER,
        }

    def sync(self, sim):
        import jax

        a = jax.tree.leaves(sim.state)[0]  # any prognostic field
        np.asarray(a[(0,) * a.ndim])


class NBodyBenchmark(WorkloadBenchmark):
    """ref: NBodySimbenchmark, benchmark_suite.py:354."""

    name = "nbody"

    def __init__(self, num_particles: int = 4096, num_steps: int = 10, **kw):
        super().__init__(num_particles=num_particles, num_steps=num_steps,
                         **kw)
        self.n = num_particles
        self.num_steps = num_steps

    def setup(self):
        from njw_tpu.nbody import NBodySimulation, create_random_system

        return NBodySimulation(create_random_system(self.n),
                               integrator="leapfrog", dt=0.001)

    INNER = 1000  # 4096-body MXU steps are ~2.5 us each; the marginal
    # must dominate the ~5 ms dispatch noise

    def execute(self, sim, repeats: int = 1):
        sim.step(self.num_steps * self.INNER * repeats)
        return self.n * self.n * self.num_steps * self.INNER, \
            "interactions/s", {"steps_per_repeat":
                               self.num_steps * self.INNER}

    def sync(self, sim):
        np.asarray(sim.system.pos[:1])


class MDBenchmark(WorkloadBenchmark):
    """ref: MolecularDynamicsBenchmark, benchmark_suite.py:439."""

    name = "molecular_dynamics"

    def __init__(self, num_atoms: int = 1000, num_steps: int = 50, **kw):
        super().__init__(num_atoms=num_atoms, num_steps=num_steps, **kw)
        self.n = num_atoms
        self.num_steps = num_steps

    def setup(self):
        from njw_tpu.md import MDSimulation, create_lj_fluid

        state, topo, lj = create_lj_fluid(self.n, T0=1.0)
        return MDSimulation(state, topo, lj, dt=0.002)

    INNER = 60

    def execute(self, sim, repeats: int = 1):
        sim.step(self.num_steps * self.INNER * repeats)
        return self.n * self.num_steps * self.INNER, "atom-steps/s", {
            "steps_per_repeat": self.num_steps * self.INNER}

    def sync(self, sim):
        np.asarray(sim.state.pos[:1])


class SignalBenchmark(WorkloadBenchmark):
    """FIR + FFT batch throughput (ref README numbers:
    src/signal_processing/README.md:135-151)."""

    name = "signal"

    def __init__(self, num_samples: int = 1_000_000, num_taps: int = 101,
                 batch: int = 16, **kw):
        super().__init__(num_samples=num_samples, num_taps=num_taps,
                         batch=batch, **kw)
        self.n = num_samples
        self.taps = num_taps
        self.batch = batch

    def setup(self):
        import jax.numpy as jnp

        from njw_tpu.signal import FIRFilter

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((self.batch, self.n)),
                        jnp.float32)
        return (x, FIRFilter(num_taps=self.taps, cutoff=0.25))

    INNER = 8  # filter applications per repeat: one application's
    # marginal (~0.3 ms) would drown in dispatch noise on a tunneled TPU

    def execute(self, state, repeats: int = 1):
        import jax

        x, filt = state
        if not hasattr(self, "_run"):
            @jax.jit
            def _run(x, n):
                # chain y -> x: n filter applications, ONE dispatch
                return jax.lax.fori_loop(
                    0, n, lambda i, c: filt.apply(c), x)

            self._run = _run
        y = self._run(x, self.INNER * repeats)
        np.asarray(y[..., :1])  # hard D2H sync (block_until_ready can
        # report early on remote-tunnel backends)
        return self.INNER * self.batch * self.n, "samples/s", {
            "taps": self.taps, "applications_per_repeat": self.INNER}


class MedicalBenchmark(WorkloadBenchmark):
    """FBP reconstruction throughput (ref: MedicalImagingBenchmark,
    benchmark_suite.py:606)."""

    name = "medical"

    def __init__(self, image_size: int = 256, num_angles: int = 180, **kw):
        super().__init__(image_size=image_size, num_angles=num_angles, **kw)
        self.size = image_size
        self.num_angles = num_angles

    def setup(self):
        import jax.numpy as jnp

        from njw_tpu.medical import radon

        yy, xx = np.mgrid[0:self.size, 0:self.size]
        c = (self.size - 1) / 2
        img = ((yy - c) ** 2 + (xx - c) ** 2
               < (0.4 * self.size) ** 2).astype(np.float32)
        angles = np.linspace(0, np.pi, self.num_angles, endpoint=False)
        return (radon(jnp.asarray(img), angles), angles)

    def execute(self, state, repeats: int = 1):
        import jax
        import jax.numpy as jnp

        from njw_tpu.medical import filtered_backprojection

        sino, angles = state
        if not hasattr(self, "_run"):
            @jax.jit
            def _run(sino, n):
                def body(i, c):
                    rec = filtered_backprojection(
                        sino + c * jnp.float32(1e-30), angles)
                    return jnp.sum(rec[:1, :4]) * jnp.float32(1e-30)

                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

            self._run = _run
        out = self._run(sino, repeats)
        np.asarray(out)  # hard D2H sync
        return self.size * self.size * self.num_angles, "px-angles/s", {}


class GeospatialBenchmark(WorkloadBenchmark):
    """Viewshed + derivatives throughput (ref: GeospatialBenchmark,
    benchmark_suite.py:798 + synthetic DEM :951)."""

    name = "geospatial"

    def __init__(self, dem_size: int = 512, **kw):
        super().__init__(dem_size=dem_size, **kw)
        self.size = dem_size

    def setup(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        yy, xx = np.mgrid[0:self.size, 0:self.size] / self.size
        dem = (50 * np.exp(-((yy - 0.5) ** 2 + (xx - 0.5) ** 2) / 0.1)
               + rng.normal(0, 0.5, (self.size, self.size)))
        return jnp.asarray(dem, jnp.float32)

    def execute(self, dem, repeats: int = 1):
        import jax
        import jax.numpy as jnp

        from njw_tpu.geospatial import terrain_derivatives, viewshed

        src = (self.size // 2, self.size // 2)
        if not hasattr(self, "_run"):
            @jax.jit
            def _run(dem, n):
                def body(i, c):
                    dd = dem + c * jnp.float32(1e-30)
                    d = terrain_derivatives(dd)
                    v = viewshed(dd, src, n_samples=64)
                    # full-output reductions (a tiny slice would let XLA
                    # narrow the stencils)
                    return (jnp.sum(d["slope"]) + jnp.sum(v)) \
                        * jnp.float32(1e-30)

                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

            self._run = _run
        out = self._run(dem, 4 * repeats)
        np.asarray(out)  # hard D2H of the chained output
        return 4 * self.size * self.size, "cells/s", {
            "pipelines_per_repeat": 4}


class BenchmarkSuite:
    """Registry + runner (ref: benchmark_suite.py:973-1234)."""

    DEFAULT = {
        "weather": WeatherBenchmark,
        "nbody": NBodyBenchmark,
        "molecular_dynamics": MDBenchmark,
        "signal": SignalBenchmark,
        "medical": MedicalBenchmark,
        "geospatial": GeospatialBenchmark,
    }

    def __init__(self, output_dir: str = "./benchmark_results"):
        self.output_dir = output_dir
        self.registry: dict[str, Callable] = dict(self.DEFAULT)
        self.results: list[BenchmarkResult] = []

    def register(self, name: str, factory: Callable):
        self.registry[name] = factory
        return self

    def run_benchmark(self, name: str, cost_model=None,
                      **params) -> BenchmarkResult:
        try:
            factory = self.registry[name]
        except KeyError:
            raise ValueError(
                f"unknown benchmark {name!r}; available: "
                f"{sorted(self.registry)}") from None
        result = factory(**params).run()
        if cost_model is not None:
            result.calculate_cost_metrics(cost_model)
        self.results.append(result)
        return result

    def run_all(self, names: Optional[list[str]] = None, cost_model=None,
                params: Optional[dict] = None) -> list[BenchmarkResult]:
        params = params or {}
        for name in names or list(self.registry):
            self.run_benchmark(name, cost_model, **params.get(name, {}))
        return self.results

    def save_results(self, path: Optional[str] = None) -> str:
        os.makedirs(self.output_dir, exist_ok=True)
        path = path or os.path.join(self.output_dir, "results.json")
        with open(path, "w") as fh:
            json.dump([r.to_dict() for r in self.results], fh, indent=2)
        return path

    @classmethod
    def load_results(cls, path: str) -> list[BenchmarkResult]:
        with open(path) as fh:
            return [BenchmarkResult.from_dict(d) for d in json.load(fh)]

    def generate_reports(self, **kw) -> str:
        from njw_tpu.bench.report import generate_report

        os.makedirs(self.output_dir, exist_ok=True)
        return generate_report(self.results, self.output_dir, **kw)
