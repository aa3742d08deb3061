"""MD simulation driver: integrators + thermostats + trajectory output.

ref: integrator.hpp:70-103 (VelocityVerlet/Leapfrog/Beeman), :180-248
(Berendsen/Andersen/Nose-Hoover thermostats), Simulation (simulation.hpp:20),
Python MDSimulation (molecular_dynamics.py:149-365).
"""
from __future__ import annotations

import json
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from njw_tpu.md.forces import make_force_fn
from njw_tpu.md.system import (
    KB, LJParams, MDState, Topology, kinetic_energy, temperature,
)


def _replace(s: MDState, **kw) -> MDState:
    return s.replace(**kw)


class MDSimulation:
    """Velocity-Verlet/Leapfrog/Beeman dynamics with optional thermostat,
    stepped in jitted lax.scan chunks."""

    def __init__(self, state: MDState, topology: Topology = Topology(),
                 lj: Optional[LJParams] = None, *, dt: float = 0.005,
                 integrator: str = "velocity_verlet", cutoff: float = 2.5,
                 thermostat: Optional[str] = None, T0: float = 1.0,
                 tau: float = 0.5, collision_rate: float = 0.1,
                 seed: int = 0, force_method: str = "auto",
                 donate: bool = True):
        if lj is None:
            lj = LJParams(epsilon=jnp.asarray([1.0], jnp.float32),
                          sigma=jnp.asarray([1.0], jnp.float32))
        self.state = state
        self.topology = topology
        self.lj = lj
        self.dt = float(dt)
        self.integrator = integrator
        self.thermostat = thermostat
        self.T0 = T0
        self.time = 0.0
        self.step_count = 0
        self.metrics = {"total_time_ms": 0.0, "num_steps": 0}
        self.trajectory: list[np.ndarray] = []

        force_fn = make_force_fn(topology, lj, cutoff, state.n,
                                 method=force_method,
                                 box_static=np.asarray(state.box),
                                 pos_static=np.asarray(state.pos))
        self._force_fn = force_fn
        dt_f = jnp.float32(dt)
        T0_f = jnp.float32(T0)
        tau_f = jnp.float32(tau)
        coll = jnp.float32(collision_rate)
        thermo = thermostat
        integ = integrator

        def apply_thermostat(s, aux, key):
            if thermo is None:
                return s, aux
            if thermo == "berendsen":
                # ref: berendsen_thermostat_kernel cuda_kernels.cu:237
                T = temperature(s)
                lam = jnp.sqrt(jnp.maximum(
                    1.0 + (dt_f / tau_f) * (T0_f / jnp.maximum(T, 1e-8) - 1.0),
                    0.0))
                return _replace(s, vel=s.vel * lam), aux
            if thermo == "andersen":
                k1, k2 = jax.random.split(key)
                hit = jax.random.uniform(k1, (s.n, 1)) < coll * dt_f
                vnew = jax.random.normal(k2, s.vel.shape) * jnp.sqrt(
                    KB * T0_f / s.mass[:, None])
                return _replace(s, vel=jnp.where(hit, vnew, s.vel)), aux
            if thermo == "nose_hoover":
                # single-chain NH: d(xi)/dt = (2KE - dof kB T0)/Q
                xi = aux
                dof = 3 * s.n
                Q = dof * KB * T0_f * tau_f * tau_f
                ke = kinetic_energy(s)
                xi = xi + dt_f * (2.0 * ke - dof * KB * T0_f) / Q
                return _replace(s, vel=s.vel * jnp.exp(-xi * dt_f)), xi
            raise ValueError(f"unknown thermostat {thermo!r}")

        def vv_step(carry, _):
            s, f, aux, key = carry
            key, sub = jax.random.split(key)
            a = f / s.mass[:, None]
            v_half = s.vel + 0.5 * dt_f * a
            pos = s.pos + dt_f * v_half
            pos = jnp.mod(pos, s.box)  # wrap into the box
            s = _replace(s, pos=pos)
            f_new, _ = force_fn(s)
            vel = v_half + 0.5 * dt_f * f_new / s.mass[:, None]
            s = _replace(s, vel=vel)
            s, aux = apply_thermostat(s, aux, sub)
            return (s, f_new, aux, key), None

        def leapfrog_step(carry, _):
            s, f, aux, key = carry
            key, sub = jax.random.split(key)
            vel = s.vel + dt_f * f / s.mass[:, None]
            pos = jnp.mod(s.pos + dt_f * vel, s.box)
            s = _replace(s, pos=pos, vel=vel)
            f_new, _ = force_fn(s)
            s, aux = apply_thermostat(s, aux, sub)
            return (s, f_new, aux, key), None

        def beeman_step(carry, _):
            s, (f, f_prev), aux, key = carry
            key, sub = jax.random.split(key)
            m = s.mass[:, None]
            a, a_prev = f / m, f_prev / m
            pos = jnp.mod(
                s.pos + dt_f * s.vel
                + (dt_f * dt_f / 6.0) * (4.0 * a - a_prev), s.box)
            s2 = _replace(s, pos=pos)
            f_new, _ = force_fn(s2)
            a_new = f_new / m
            vel = s.vel + (dt_f / 6.0) * (2.0 * a_new + 5.0 * a - a_prev)
            s2 = _replace(s2, vel=vel)
            s2, aux = apply_thermostat(s2, aux, sub)
            return (s2, (f_new, f), aux, key), None

        steps = {"velocity_verlet": vv_step, "leapfrog": leapfrog_step,
                 "beeman": beeman_step}
        if integ not in steps:
            raise ValueError(
                f"unknown integrator {integ!r}; available: {sorted(steps)}")
        body = steps[integ]

        f0, _ = force_fn(state)
        aux0 = jnp.float32(0.0)
        key0 = jax.random.key(seed)
        if integ == "beeman":
            # distinct buffers: the donated carry may not alias f0 twice
            self._carry = (state, (f0, jnp.copy(f0)), aux0, key0)
        else:
            self._carry = (state, f0, aux0, key0)

        def run_chunk(carry, n):
            carry, _ = jax.lax.scan(body, carry, None, length=n)
            return carry

        # MD keeps donation ON: measured 6% FASTER with it (0.448 vs
        # 0.479 ms/step, LJ N=4096 on v5e) — unlike the weather (-19%)
        # and n-body (-31%) scans; the donation effect is per-workload
        # (BENCH_NOTES r4, probe_donation_nbody_md.py)
        self._run_chunk = jax.jit(run_chunk, static_argnums=(1,),
                                  donate_argnums=(0,) if donate else ())

    def step(self, n: int = 1) -> MDState:
        t0 = time.perf_counter()
        self._carry = self._run_chunk(self._carry, n)
        self.state = self._carry[0]
        jax.block_until_ready(self.state)
        self.metrics["total_time_ms"] += (time.perf_counter() - t0) * 1e3
        self.metrics["num_steps"] += n
        self.step_count += n
        self.time += n * self.dt
        return self.state

    def run(self, n_steps: int, *, callback: Optional[Callable] = None,
            callback_interval: int = 10,
            record_trajectory: bool = False) -> MDState:
        remaining = n_steps
        chunk = callback_interval if (callback or record_trajectory) \
            else n_steps
        while remaining > 0:
            n = min(chunk, remaining)
            self.step(n)
            remaining -= n
            if record_trajectory:
                self.trajectory.append(np.asarray(self.state.pos))
            if callback is not None:
                callback(self)
        return self.state

    # -- observables (ref: molecular_dynamics.py:100-147) ---------------
    def energies(self) -> dict:
        _, e = self._force_fn(self.state)
        ke = kinetic_energy(self.state)
        return {
            "kinetic": float(ke),
            "potential": float(e["potential"]),
            "nonbonded": float(e["nonbonded"]),
            "bonded": float(e["bonded"]),
            "total": float(ke + e["potential"]),
        }

    def temperature(self) -> float:
        return float(temperature(self.state))

    def performance_metrics(self) -> dict:
        m = dict(self.metrics)
        steps = max(m["num_steps"], 1)
        m["ms_per_step"] = m["total_time_ms"] / steps
        m["atom_steps_per_second"] = (
            self.state.n * steps / (m["total_time_ms"] / 1e3 or 1e-9))
        return m

    def save_state(self, path: str) -> str:
        """ref: molecular_dynamics.py:322 save_state."""
        payload = {
            "time": self.time, "step_count": self.step_count, "dt": self.dt,
            "integrator": self.integrator,
            "pos": np.asarray(self.state.pos).tolist(),
            "vel": np.asarray(self.state.vel).tolist(),
            "mass": np.asarray(self.state.mass).tolist(),
            "charge": np.asarray(self.state.charge).tolist(),
            "type_id": np.asarray(self.state.type_id).tolist(),
            "box": np.asarray(self.state.box).tolist(),
        }
        with open(path, "w") as fh:
            json.dump(payload, fh)
        return path

    def save_trajectory(self, path: str) -> str:
        """ref: molecular_dynamics.py:330 save_trajectory (npz frames)."""
        np.savez_compressed(path, *self.trajectory)
        return path
