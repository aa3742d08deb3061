"""Particle system state + factories + conserved-quantity diagnostics.

Structure-of-arrays pytree replaces the reference's array-of-Particle
objects (ref: src/nbody_sim/python/particle.py:13-93): positions (N,3),
velocities (N,3), masses (N,) — the layout the MXU/VPU want.

Factories mirror the reference's three systems (ref: particle.py:263
create_random_system, :305 create_solar_system, :373 create_galaxy_model)
with the same knobs (counts, box size, mass range, velocity scale, G,
scale factor, galaxy radius/height, seed).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from njw_tpu.utils.pytree import pytree_dataclass


@pytree_dataclass
class NBodySystem:
    pos: jnp.ndarray   # (N, 3)
    vel: jnp.ndarray   # (N, 3)
    mass: jnp.ndarray  # (N,)
    G: jnp.ndarray = 1.0
    softening: jnp.ndarray = 1.0e-6

    @property
    def n(self) -> int:
        return self.pos.shape[0]


def create_random_system(
    n: int, *, box_size: float = 10.0, min_mass: float = 0.1,
    max_mass: float = 1.0, velocity_scale: float = 0.1, G: float = 1.0,
    seed: int = 0,
) -> NBodySystem:
    """Uniform box of random particles (ref: particle.py:263-303)."""
    key = jax.random.key(seed)
    kp, kv, km = jax.random.split(key, 3)
    pos = jax.random.uniform(kp, (n, 3), jnp.float32,
                             -box_size / 2, box_size / 2)
    vel = velocity_scale * jax.random.normal(kv, (n, 3), jnp.float32)
    mass = jax.random.uniform(km, (n,), jnp.float32, min_mass, max_mass)
    return NBodySystem(pos=pos, vel=vel, mass=mass, G=G)


# (name, mass [solar], semi-major axis [AU], eccentricity ignored -> circular)
_SOLAR_BODIES = [
    ("sun", 1.0, 0.0),
    ("mercury", 1.66e-7, 0.387),
    ("venus", 2.45e-6, 0.723),
    ("earth", 3.0e-6, 1.0),
    ("mars", 3.2e-7, 1.524),
    ("jupiter", 9.55e-4, 5.203),
    ("saturn", 2.86e-4, 9.537),
    ("uranus", 4.37e-5, 19.191),
    ("neptune", 5.15e-5, 30.069),
]


def create_solar_system(*, scale_factor: float = 1.0, G: float = 4.0 * np.pi ** 2,
                        seed: int = 0) -> NBodySystem:
    """Sun + 8 planets on circular orbits in the ecliptic plane, AU /
    years / solar-mass units (ref: particle.py:305-371; scale_factor
    scales the orbital radii)."""
    rng = np.random.default_rng(seed)
    pos, vel, mass = [], [], []
    for _, m, a in _SOLAR_BODIES:
        a = a * scale_factor
        theta = rng.uniform(0.0, 2 * np.pi) if a > 0 else 0.0
        pos.append([a * np.cos(theta), a * np.sin(theta), 0.0])
        if a > 0:
            v = np.sqrt(G * 1.0 / a)  # circular speed about the sun
            vel.append([-v * np.sin(theta), v * np.cos(theta), 0.0])
        else:
            vel.append([0.0, 0.0, 0.0])
        mass.append(m)
    return NBodySystem(
        pos=jnp.asarray(pos, jnp.float32), vel=jnp.asarray(vel, jnp.float32),
        mass=jnp.asarray(mass, jnp.float32), G=G, softening=1e-6,
    )


def create_galaxy_model(
    n: int, *, radius: float = 10.0, height: float = 1.0,
    central_mass: float = 1000.0, particle_mass: float = 1.0, G: float = 1.0,
    seed: int = 0,
) -> NBodySystem:
    """Disk galaxy: massive central body + exponential-ish disk on
    near-circular orbits (ref: particle.py:373-445)."""
    key = jax.random.key(seed)
    kr, kth, kz, kv = jax.random.split(key, 4)
    # radial distribution ~ sqrt(uniform) * radius biases toward center
    r = radius * jnp.sqrt(jax.random.uniform(kr, (n - 1,), jnp.float32,
                                             0.05, 1.0))
    theta = jax.random.uniform(kth, (n - 1,), jnp.float32, 0.0, 2 * jnp.pi)
    z = height * (jax.random.uniform(kz, (n - 1,), jnp.float32) - 0.5)
    x, y = r * jnp.cos(theta), r * jnp.sin(theta)
    # circular speed about enclosed mass (dominated by the central body)
    v_circ = jnp.sqrt(G * central_mass / r)
    v_circ = v_circ * (1.0 + 0.05 * jax.random.normal(kv, r.shape, jnp.float32))
    vx, vy = -v_circ * jnp.sin(theta), v_circ * jnp.cos(theta)

    pos = jnp.concatenate(
        [jnp.zeros((1, 3), jnp.float32),
         jnp.stack([x, y, z], axis=1)], axis=0)
    vel = jnp.concatenate(
        [jnp.zeros((1, 3), jnp.float32),
         jnp.stack([vx, vy, jnp.zeros_like(vx)], axis=1)], axis=0)
    mass = jnp.concatenate(
        [jnp.asarray([central_mass], jnp.float32),
         jnp.full((n - 1,), particle_mass, jnp.float32)])
    return NBodySystem(pos=pos, vel=vel, mass=mass, G=G, softening=0.05)


def system_diagnostics(s: NBodySystem) -> dict:
    """Conserved quantities (ref: particle.py:206-254): total mass, center
    of mass, momentum, angular momentum, kinetic/potential/total energy."""
    from njw_tpu.nbody.forces import potential_energy

    m = s.mass[:, None]
    total_mass = jnp.sum(s.mass)
    com = jnp.sum(m * s.pos, axis=0) / total_mass
    momentum = jnp.sum(m * s.vel, axis=0)
    ang_mom = jnp.sum(jnp.cross(s.pos, m * s.vel), axis=0)
    ke = 0.5 * jnp.sum(s.mass * jnp.sum(s.vel * s.vel, axis=1))
    pe = potential_energy(s)
    return {
        "total_mass": total_mass, "center_of_mass": com,
        "momentum": momentum, "angular_momentum": ang_mom,
        "kinetic_energy": ke, "potential_energy": pe,
        "total_energy": ke + pe,
    }
