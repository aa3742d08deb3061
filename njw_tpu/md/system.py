"""MD state, topology, and system factories.

ref: molecular_system.hpp:18-284 (MolecularSystem: atoms, LJ params,
bonds/angles/dihedrals, neighbor list, energies) and the Python MDSystem
factories (ref: python/molecular_dynamics.py:39-147 create_water_box /
create_lj_fluid / load_from_pdb).

Units: reduced-LJ style defaults (epsilon, sigma, mass = 1). kB = 1 in
reduced units; for the water box we use kcal/mol-A-fs-like constants
scaled so tests are unit-consistent.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from njw_tpu.utils.pytree import pytree_dataclass

KB = 1.0  # reduced units


@pytree_dataclass
class LJParams:
    """Per-type LJ parameters; pair table via Lorentz-Berthelot mixing."""

    epsilon: jnp.ndarray  # (T,)
    sigma: jnp.ndarray    # (T,)


@pytree_dataclass
class Topology:
    """Static bonded topology (index arrays + parameters)."""

    bonds: jnp.ndarray = None          # (B, 2) int32
    bond_k: jnp.ndarray = None         # (B,)
    bond_r0: jnp.ndarray = None        # (B,)
    angles: jnp.ndarray = None         # (A, 3) int32 (i-j-k, j central)
    angle_k: jnp.ndarray = None        # (A,)
    angle_theta0: jnp.ndarray = None   # (A,)
    dihedrals: jnp.ndarray = None      # (D, 4) int32
    dihedral_k: jnp.ndarray = None     # (D,)
    dihedral_n: jnp.ndarray = None     # (D,) periodicity
    dihedral_phase: jnp.ndarray = None  # (D,)


@pytree_dataclass
class MDState:
    pos: jnp.ndarray       # (N, 3)
    vel: jnp.ndarray       # (N, 3)
    mass: jnp.ndarray      # (N,)
    charge: jnp.ndarray    # (N,)
    type_id: jnp.ndarray   # (N,) int32 into LJParams
    box: jnp.ndarray       # (3,) periodic box lengths

    @property
    def n(self) -> int:
        return self.pos.shape[0]


def kinetic_energy(s: MDState) -> jnp.ndarray:
    """ref: kinetic_energy_kernel reduction, cuda_kernels.cu:252."""
    return 0.5 * jnp.sum(s.mass * jnp.sum(s.vel * s.vel, axis=1))


def temperature(s: MDState) -> jnp.ndarray:
    """T = 2 KE / (3 N kB) (no constraint DOF accounting in v1)."""
    dof = 3 * s.pos.shape[0]
    return 2.0 * kinetic_energy(s) / (dof * KB)


def _maxwell_velocities(key, n, mass, T0):
    v = jax.random.normal(key, (n, 3), jnp.float32)
    v = v * jnp.sqrt(KB * T0 / mass[:, None])
    return v - jnp.mean(v, axis=0, keepdims=True)  # zero net momentum


def create_lj_fluid(n: int, *, density: float = 0.8, T0: float = 1.0,
                    epsilon: float = 1.0, sigma: float = 1.0,
                    mass: float = 1.0, seed: int = 0):
    """Cubic lattice LJ fluid at given reduced density/temperature
    (ref: molecular_dynamics.py create_lj_fluid)."""
    n_side = int(np.ceil(n ** (1 / 3)))
    L = float((n / density) ** (1 / 3))
    grid = np.stack(np.meshgrid(*[np.arange(n_side)] * 3,
                                indexing="ij"), axis=-1).reshape(-1, 3)
    pos = (grid[:n] + 0.5) * (L / n_side)
    key = jax.random.key(seed)
    state = MDState(
        pos=jnp.asarray(pos, jnp.float32),
        vel=_maxwell_velocities(key, n, jnp.full((n,), mass, jnp.float32), T0),
        mass=jnp.full((n,), mass, jnp.float32),
        charge=jnp.zeros((n,), jnp.float32),
        type_id=jnp.zeros((n,), jnp.int32),
        box=jnp.full((3,), L, jnp.float32),
    )
    lj = LJParams(epsilon=jnp.asarray([epsilon], jnp.float32),
                  sigma=jnp.asarray([sigma], jnp.float32))
    return state, Topology(), lj


# SPC-like flexible water constants (reduced-consistent set)
_WATER = dict(
    mass_o=16.0, mass_h=1.0, q_o=-0.82, q_h=0.41,
    eps_o=0.65, sig_o=3.166, r_oh=1.0, theta_hoh=1.91,  # ~109.47 deg
    k_bond=450.0, k_angle=55.0,
)


def create_water_box(n_molecules: int, *, box_size: Optional[float] = None,
                     T0: float = 1.0, seed: int = 0):
    """Flexible 3-site water box: harmonic O-H bonds + H-O-H angle, LJ on
    O, point charges (ref: molecular_dynamics.py create_water_box)."""
    w = _WATER
    n = 3 * n_molecules
    if box_size is None:
        box_size = float(max(4.0, (n_molecules * 30.0) ** (1 / 3)))
    rng = np.random.default_rng(seed)
    n_side = int(np.ceil(n_molecules ** (1 / 3)))
    centers = []
    for i in range(n_molecules):
        iz, iy, ix = np.unravel_index(i, (n_side,) * 3)
        centers.append(((np.array([ix, iy, iz]) + 0.5) / n_side) * box_size)
    pos = np.zeros((n, 3), np.float32)
    for i, c in enumerate(centers):
        # O at center, two H at bond length, random orientation
        u = rng.standard_normal(3)
        u /= np.linalg.norm(u)
        v = np.cross(u, rng.standard_normal(3))
        v /= np.linalg.norm(v)
        half = w["theta_hoh"] / 2
        h1 = np.cos(half) * u + np.sin(half) * v
        h2 = np.cos(half) * u - np.sin(half) * v
        pos[3 * i] = c
        pos[3 * i + 1] = c + w["r_oh"] * h1
        pos[3 * i + 2] = c + w["r_oh"] * h2

    mass = np.tile([w["mass_o"], w["mass_h"], w["mass_h"]], n_molecules)
    charge = np.tile([w["q_o"], w["q_h"], w["q_h"]], n_molecules)
    type_id = np.tile([0, 1, 1], n_molecules)

    bonds, angles = [], []
    for i in range(n_molecules):
        o, h1, h2 = 3 * i, 3 * i + 1, 3 * i + 2
        bonds += [[o, h1], [o, h2]]
        angles.append([h1, o, h2])
    topo = Topology(
        bonds=jnp.asarray(bonds, jnp.int32),
        bond_k=jnp.full((len(bonds),), w["k_bond"], jnp.float32),
        bond_r0=jnp.full((len(bonds),), w["r_oh"], jnp.float32),
        angles=jnp.asarray(angles, jnp.int32),
        angle_k=jnp.full((len(angles),), w["k_angle"], jnp.float32),
        angle_theta0=jnp.full((len(angles),), w["theta_hoh"], jnp.float32),
    )
    lj = LJParams(
        epsilon=jnp.asarray([w["eps_o"], 0.0], jnp.float32),
        sigma=jnp.asarray([w["sig_o"], 1.0], jnp.float32),
    )
    key = jax.random.key(seed)
    state = MDState(
        pos=jnp.asarray(pos),
        vel=_maxwell_velocities(key, n, jnp.asarray(mass, jnp.float32), T0),
        mass=jnp.asarray(mass, jnp.float32),
        charge=jnp.asarray(charge, jnp.float32),
        type_id=jnp.asarray(type_id, jnp.int32),
        box=jnp.full((3,), box_size, jnp.float32),
    )
    return state, topo, lj


_ELEMENT_MASS = {"H": 1.008, "C": 12.011, "N": 14.007, "O": 15.999,
                 "S": 32.06, "P": 30.974}


def load_from_pdb(path: str, *, box_size: Optional[float] = None,
                  T0: float = 0.0, seed: int = 0):
    """Minimal PDB reader: ATOM/HETATM records -> positions + element
    masses; no topology inference (ref: molecular_dynamics.py
    load_from_pdb)."""
    pos, mass, elem = [], [], []
    with open(path) as fh:
        for line in fh:
            if line.startswith(("ATOM", "HETATM")):
                x = float(line[30:38])
                y = float(line[38:46])
                z = float(line[46:54])
                e = (line[76:78].strip() or line[12:16].strip()[:1]).upper()
                pos.append([x, y, z])
                elem.append(e)
                mass.append(_ELEMENT_MASS.get(e, 12.0))
    pos = np.asarray(pos, np.float32)
    n = len(pos)
    if box_size is None:
        span = pos.max(axis=0) - pos.min(axis=0)
        box_size = float(span.max() * 1.5 + 10.0)
    types = sorted(set(elem))
    tid = np.asarray([types.index(e) for e in elem], np.int32)
    key = jax.random.key(seed)
    m = jnp.asarray(mass, jnp.float32)
    state = MDState(
        pos=jnp.asarray(pos - pos.min(axis=0) + 1.0),
        vel=(_maxwell_velocities(key, n, m, T0) if T0 > 0
             else jnp.zeros((n, 3), jnp.float32)),
        mass=m,
        charge=jnp.zeros((n,), jnp.float32),
        type_id=jnp.asarray(tid),
        box=jnp.full((3,), box_size, jnp.float32),
    )
    lj = LJParams(epsilon=jnp.full((len(types),), 0.2, jnp.float32),
                  sigma=jnp.full((len(types),), 3.0, jnp.float32))
    return state, Topology(), lj
