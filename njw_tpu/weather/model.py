"""Simulation driver: one compiled program per run chunk.

TPU-native replacement for the reference's ``WeatherSimulation`` time loop
(ref: src/weather-sim/cpp/src/weather_simulation.cpp:68-158): instead of a
host loop calling per-step kernels with 4 staging grids and explicit swaps,
the whole inter-output interval is a single ``lax.scan`` under ``jit`` —
state never leaves the device between outputs. Buffer donation is OFF by
default: measured 19% slower scan bodies on v5e (BENCH_NOTES r4).

Also carries the performance-metrics contract of the reference
(ref: weather_sim.hpp:196-223 PerformanceMetrics; python wrapper metrics
ref: python/weather_simulation.py:355-371) extended with the BASELINE
metrics: grid-points/s and MCUPS (ref: src/weather-sim/README.md:124-131).
"""
from __future__ import annotations

import dataclasses
import time
from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from njw_tpu.weather.dynamics import diagnostics, make_tendency_fn
from njw_tpu.weather.grid import GridSpec, PhysicsParams, WeatherState
from njw_tpu.weather.ics import make_initial_state
from njw_tpu.weather.integrators import make_stepper


@dataclass
class SimConfig:
    """Mirror of the reference ``SimulationConfig``
    (ref: weather_sim.hpp:155-191), minus GPU-specific knobs that have no
    TPU meaning (device_id, num_threads, double_precision) and plus the
    TPU-native ones (backend: 'xla' | 'pallas' | 'numpy')."""

    model: str = "shallow_water"  # shallow_water | barotropic | primitive | general
    integration_method: str = "rk4"  # euler|rk2|rk4|adams_bashforth|semi_implicit
    si_order: int = 1  # semi_implicit only: 1 (CN) | 2 (predictor-corrector;
    #   explicit-advection stability region like a midpoint method — needed
    #   for advectively-vigorous states at several-x-CFL dt)
    boundary_condition: str = "periodic"  # periodic | clamped | outflow | reflective
    grid_type: str = "cartesian"  # cartesian (A-grid) | staggered (C-grid)
    #   | spherical_harmonic (global spectral) | icosahedral (10-panel FV)

    grid_width: int = 256
    grid_height: int = 256
    num_levels: int = 1
    dx: float = 1.0
    dy: float = 1.0
    dt: float = 0.01

    gravity: float = 9.81
    coriolis_f: float = 0.0
    beta: float = 0.0
    viscosity: float = 0.0
    diffusivity: float = 0.0

    backend: str = "auto"  # auto | xla | pallas
    max_steps: int = 1000
    output_interval: int = 10
    random_seed: int = 0

    def grid_spec(self) -> GridSpec:
        return GridSpec(
            nx=self.grid_width, ny=self.grid_height, levels=self.num_levels,
            dx=self.dx, dy=self.dy, bc=self.boundary_condition,
            grid_type=self.grid_type,
        )

    def physics(self) -> PhysicsParams:
        return PhysicsParams(
            gravity=self.gravity, coriolis_f=self.coriolis_f, beta=self.beta,
            viscosity=self.viscosity, diffusivity=self.diffusivity,
        )


@dataclass
class PerformanceMetrics:
    """ref: weather_sim.hpp:196-223, plus throughput fields."""

    total_time_ms: float = 0.0
    compute_time_ms: float = 0.0
    io_time_ms: float = 0.0
    num_steps: int = 0
    grid_points: int = 0

    @property
    def steps_per_second(self) -> float:
        t = self.compute_time_ms or self.total_time_ms
        return self.num_steps / (t / 1e3) if t else 0.0

    @property
    def grid_points_per_second(self) -> float:
        """grid_points x steps/s (ref: benchmark_suite.py:577-584)."""
        return self.grid_points * self.steps_per_second

    @property
    def mcups(self) -> float:
        """Million cell updates per second (ref: src/weather-sim/README.md:129)."""
        return self.grid_points_per_second / 1e6

    def as_dict(self) -> dict[str, float]:
        return {
            "total_time_ms": self.total_time_ms,
            "compute_time_ms": self.compute_time_ms,
            "io_time_ms": self.io_time_ms,
            "num_steps": self.num_steps,
            "steps_per_second": self.steps_per_second,
            "grid_points_per_second": self.grid_points_per_second,
            "mcups": self.mcups,
        }


def _prognostic_only(state: WeatherState, model: str) -> Any:
    """Strip a full WeatherState down to the model's prognostic variables so
    the scan carry is minimal (SWE: u, v, h)."""
    if model in ("shallow_water", "general"):
        return WeatherState(u=state.u, v=state.v, h=state.h)
    return state


class Simulation:
    """Generic step-loop driver over an arbitrary state pytree.

    Weather-specific construction goes through :meth:`from_config`; the
    driver itself only needs ``(state0, tendency_fn, method, dt)``, which is
    how the barotropic / primitive cores and even non-weather workloads
    reuse it.
    """

    def __init__(
        self,
        state0: Any,
        tendency_fn: Callable,
        *,
        dt: float,
        method: str = "rk4",
        grid: Optional[GridSpec] = None,
        stepper_factory: Optional[Callable] = None,
        output_fn: Optional[Callable[[Any], dict[str, jnp.ndarray]]] = None,
        donate: bool = False,
    ):
        self.grid = grid
        self.dt = float(dt)
        self.state = state0
        self.time = 0.0
        self.step_count = 0
        self.metrics = PerformanceMetrics(
            grid_points=_count_points(state0)
        )
        self.output_fn = output_fn
        self.snapshots: list[dict[str, np.ndarray]] = []

        if stepper_factory is not None:
            self.stepper = stepper_factory(tendency_fn)
        else:
            self.stepper = make_stepper(method, tendency_fn)
        self._carry = self.stepper.init(state0)

        stepper = self.stepper
        dt_f = jnp.float32(self.dt)

        def run_chunk(carry, state, n_steps):
            def body(cs, _):
                c, s = cs
                c, s = stepper.step(c, s, dt_f)
                return (c, s), None

            (carry, state), _ = jax.lax.scan(
                body, (carry, state), None, length=n_steps
            )
            return carry, state

        # n_steps static -> one executable per distinct chunk length
        # (typically just output_interval and a remainder).
        #
        # NO buffer donation: measured on v5e (BENCH_NOTES r4), donating
        # the carry makes the compiled scan BODY ~19% slower (0.382 vs
        # 0.320 ms/step, SWE 2048^2) — the input/output aliasing
        # constraint pessimizes the loop, and state buffers are far
        # smaller than HBM. Opt back in (donate=True) only for states
        # near the HBM limit.
        self._run_chunk = jax.jit(
            run_chunk, static_argnums=(2,),
            donate_argnums=(0, 1) if donate else (),
        )

    @classmethod
    def from_config(cls, config: SimConfig, initial_condition: str = "uniform",
                    **ic_params) -> "Simulation":
        grid = config.grid_spec()
        params = config.physics()
        model = config.model
        if config.grid_type in ("spherical_harmonic", "spectral"):
            from njw_tpu.weather.spherical import make_spherical_sim

            return make_spherical_sim(cls, config, initial_condition,
                                      **ic_params)
        if config.grid_type == "icosahedral":
            from njw_tpu.weather.icosa import make_icosa_sim

            return make_icosa_sim(cls, config, initial_condition,
                                  **ic_params)
        if model == "barotropic":
            from njw_tpu.weather.barotropic import make_barotropic_sim

            return make_barotropic_sim(cls, config, initial_condition, **ic_params)
        if model == "primitive":
            from njw_tpu.weather.primitive import make_primitive_sim

            return make_primitive_sim(cls, config, initial_condition, **ic_params)

        full0 = make_initial_state(
            initial_condition, grid, key=jax.random.key(config.random_seed),
            **ic_params,
        )
        state0 = _prognostic_only(full0, model)
        tendency = make_tendency_fn(model, grid, params)

        if config.integration_method == "semi_implicit":
            from njw_tpu.weather.semi_implicit import semi_implicit_swe

            stepper_factory = lambda t: semi_implicit_swe(
                t, grid=grid, params=params,
                order=getattr(config, "si_order", 1),
            )
        else:
            stepper_factory = _maybe_pallas_stepper(config, grid, params)

        def output_fn(s):
            out = {"u": s.u, "v": s.v, "h": s.h}
            out.update(diagnostics(s, grid))
            return out

        sim = cls(
            state0, tendency, dt=config.dt, method=config.integration_method,
            grid=grid, stepper_factory=stepper_factory, output_fn=output_fn,
        )
        sim.config = config
        return sim

    def step(self, n: int = 1) -> Any:
        """Advance n steps on device (one compiled scan)."""
        t0 = time.perf_counter()
        self._carry, self.state = self._run_chunk(self._carry, self.state, n)
        jax.block_until_ready(self.state)
        elapsed = (time.perf_counter() - t0) * 1e3
        self.metrics.compute_time_ms += elapsed
        self.metrics.total_time_ms += elapsed
        self.metrics.num_steps += n
        self.step_count += n
        self.time += n * self.dt
        return self.state

    def run(self, n_steps: Optional[int] = None, output_interval: int = 0,
            callback: Optional[Callable] = None) -> Any:
        """Run n_steps, snapshotting every output_interval steps
        (ref: weather_simulation.cpp:68-103; snapshot field set mirrors
        python/weather_simulation.py:355-371: u, v, h, vorticity)."""
        if n_steps is None:
            n_steps = getattr(self, "config", SimConfig()).max_steps
        remaining = n_steps
        chunk = output_interval if output_interval > 0 else n_steps
        # warm-up compile outside the timed region
        while remaining > 0:
            n = min(chunk, remaining)
            self.step(n)
            remaining -= n
            if output_interval > 0:
                self._store_output()
            if callback is not None:
                callback(self)
        return self.state

    def run_until(self, t_end: float, output_interval: int = 0,
                  callback=None) -> Any:
        """Advance until sim time reaches t_end (ref: runUntil,
        weather_simulation.cpp:105-115)."""
        n = max(int(round((t_end - self.time) / self.dt)), 0)
        return self.run(n, output_interval=output_interval,
                        callback=callback)

    def _store_output(self):
        t0 = time.perf_counter()
        fields = (
            self.output_fn(self.state)
            if self.output_fn is not None
            else dataclasses.asdict(self.state)
        )
        snap = {k: np.asarray(v) for k, v in fields.items() if v is not None}
        snap["step"] = self.step_count
        snap["time"] = self.time
        self.snapshots.append(snap)
        self.metrics.io_time_ms += (time.perf_counter() - t0) * 1e3
        self.metrics.total_time_ms += (time.perf_counter() - t0) * 1e3


def _maybe_pallas_stepper(config: SimConfig, grid: GridSpec,
                          params: PhysicsParams):
    """Backend selection: 'auto' uses the fused Pallas kernel when the
    configuration is eligible and a TPU is present; 'pallas' forces it
    (interpret mode off-TPU); anything else -> XLA integrators.

    This replaces the reference's selectOptimalBackend heuristic
    (ref: weather_simulation.cpp:562-591) — there is no hybrid CPU split
    on TPU, so the only decision is fused-kernel vs XLA-fallback.
    """
    backend = config.backend
    if backend not in ("auto", "pallas"):
        return None
    from njw_tpu.ops.stencil import make_pallas_rk4_stepper, pallas_supported

    if not pallas_supported(grid, params, config.model,
                            config.integration_method):
        if backend == "pallas":
            raise ValueError(
                "backend='pallas' requires shallow_water + rk4 + periodic "
                "BC + constant f (beta=0) and nx%128==0"
            )
        return None
    import jax

    on_tpu = jax.devices()[0].platform == "tpu"
    if backend == "auto" and not on_tpu:
        return None
    interpret = not on_tpu
    return lambda _tendency: make_pallas_rk4_stepper(
        grid, params, config.dt, interpret=interpret
    )


def _count_points(state: Any) -> int:
    leaves = jax.tree.leaves(state)
    if not leaves:
        return 0
    # grid points = size of the largest 2-D slice footprint: use the first
    # leaf's trailing 2 dims (all prognostic fields share the horizontal grid)
    shape = leaves[0].shape
    if len(shape) >= 2:
        return int(shape[-1] * shape[-2])
    return int(np.prod(shape))
