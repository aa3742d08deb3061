"""N-body simulation driver (ref: src/nbody_sim/python/simulation.py:17-265:
step/run with callback interval, perf metrics, save/load state,
visualization data)."""
from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from njw_tpu.nbody.forces import accelerations
from njw_tpu.nbody.integrators import make_nbody_stepper
from njw_tpu.nbody.system import NBodySystem, system_diagnostics


class NBodySimulation:
    """Drives an NBodySystem with a chosen integrator inside jitted
    lax.scan chunks (state device-resident; contrast ref hybrid path that
    round-trips positions through the host every step,
    adaptive_kernels.cu:432-454)."""

    def __init__(self, system: NBodySystem, *, integrator: str = "leapfrog",
                 dt: float = 0.01, acc_chunk: int = 1024,
                 force_method: str = "auto", pm_box: float = 0.0,
                 pm_mesh: int = 64, donate: bool = False):
        self.system = system
        self.dt = float(dt)
        self.integrator_name = integrator
        self.time = 0.0
        self.step_count = 0
        self.metrics = {"total_time_ms": 0.0, "num_steps": 0}

        acc_fn = lambda s: accelerations(s, chunk=acc_chunk,
                                         method=force_method,
                                         pm_box=pm_box, pm_mesh=pm_mesh)
        self.stepper = make_nbody_stepper(integrator, acc_fn)
        self._carry = self.stepper.init(system)
        stepper = self.stepper
        dt_f = jnp.float32(self.dt)

        def run_chunk(carry, s, n):
            def body(cs, _):
                c, ss = cs
                c, ss = stepper.step(c, ss, dt_f)
                return (c, ss), None

            (carry, s), _ = jax.lax.scan(body, (carry, s), None, length=n)
            return carry, s

        # donation off by default: measured 31% slower compiled scan
        # body WITH donation (0.407 vs 0.311 ms/step, direct N=8192 on
        # v5e — BENCH_NOTES r4, probe_donation_nbody_md.py); opt in only
        # for particle states near HBM capacity
        self._run_chunk = jax.jit(run_chunk, static_argnums=(2,),
                                  donate_argnums=(0, 1) if donate else ())

    def step(self, n: int = 1) -> NBodySystem:
        t0 = time.perf_counter()
        self._carry, self.system = self._run_chunk(self._carry, self.system, n)
        jax.block_until_ready(self.system)
        self.metrics["total_time_ms"] += (time.perf_counter() - t0) * 1e3
        self.metrics["num_steps"] += n
        self.step_count += n
        self.time += n * self.dt
        return self.system

    def run(self, duration: Optional[float] = None, *,
            n_steps: Optional[int] = None,
            callback: Optional[Callable] = None,
            callback_interval: int = 10) -> NBodySystem:
        """Run for a duration (ref run(): simulation.py:83-115) or an exact
        step count, invoking callback every callback_interval steps."""
        if n_steps is None:
            n_steps = int(round((duration or 0.0) / self.dt))
        remaining = n_steps
        chunk = callback_interval if callback is not None else n_steps
        while remaining > 0:
            n = min(chunk, remaining)
            self.step(n)
            remaining -= n
            if callback is not None:
                callback(self)
        return self.system

    # -- diagnostics / persistence (ref: simulation.py:117-265) ----------
    def diagnostics(self) -> dict:
        return {k: np.asarray(v).tolist()
                for k, v in system_diagnostics(self.system).items()}

    def performance_metrics(self) -> dict:
        m = dict(self.metrics)
        steps = max(m["num_steps"], 1)
        n = self.system.n
        m["ms_per_step"] = m["total_time_ms"] / steps
        m["steps_per_second"] = steps / (m["total_time_ms"] / 1e3 or 1e-9)
        # pairwise interactions per second — the n-body throughput metric
        m["interactions_per_second"] = n * n * m["steps_per_second"]
        return m

    def save_state(self, path: str) -> str:
        """npz state dump with the reference's key names
        (ref: simulation.py:157-188 uses np.savez with
        positions/velocities/masses/ids/time/step/dt/G)."""
        n = int(self.system.pos.shape[0])
        np.savez(
            path,
            positions=np.asarray(self.system.pos),
            velocities=np.asarray(self.system.vel),
            masses=np.asarray(self.system.mass),
            ids=np.arange(n, dtype=np.int64),
            time=self.time,
            step=self.step_count,
            dt=self.dt,
            G=float(self.system.G),
            softening=float(self.system.softening),
            integrator=self.integrator_name,
        )
        if not path.endswith(".npz"):
            path = path + ".npz"
        return path

    @classmethod
    def load_state(cls, path: str, **kwargs) -> "NBodySimulation":
        d = np.load(path, allow_pickle=False)
        system = NBodySystem(
            pos=jnp.asarray(d["positions"], jnp.float32),
            vel=jnp.asarray(d["velocities"], jnp.float32),
            mass=jnp.asarray(d["masses"], jnp.float32),
            G=float(d["G"]), softening=float(d["softening"]),
        )
        sim = cls(system, integrator=str(d["integrator"]),
                  dt=float(d["dt"]), **kwargs)
        sim.time = float(d["time"])
        sim.step_count = int(d["step"])
        return sim

    def visualization_data(self) -> dict:
        """ref: simulation.py:228-265 create_visualization_data."""
        return {
            "positions": np.asarray(self.system.pos),
            "velocities": np.asarray(self.system.vel),
            "masses": np.asarray(self.system.mass),
            "time": self.time,
        }
