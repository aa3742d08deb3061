"""Particle-mesh (PM) gravity for N >> 10^5.

The reference caps at O(N^2) direct summation (ref: particle.py:119-152;
adaptive_kernels.cu tiles). The classic scale-out alternatives are
Barnes-Hut/FMM trees — but tree traversal is data-dependent pointer
chasing, the least TPU-friendly shape there is. The TPU-native answer is
the particle-mesh method (the backbone of production cosmology codes):

  1. deposit particle mass onto a periodic grid (cloud-in-cell),
  2. solve the Poisson equation in k-space (one 3-D FFT pair),
  3. difference the potential for the mesh force field,
  4. interpolate forces back to particles (CIC gather).

Everything is scatter-add / FFT / gather — all static-shape, all
vectorized. O(N + M^3 log M); accuracy is exact in the far field and
softened below ~2 mesh cells (the standard PM trade; pair it with the
direct method below the mesh scale for P3M if needed).

State convention matches nbody.forces: accelerations da/dt = G * sum ...
with periodic box geometry (PM is intrinsically periodic).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _cic_weights(pos, mesh: int, box: float):
    """Cloud-in-cell base cells + weights. pos: (N, 3) in [0, box)."""
    x = pos * (mesh / box)
    i0 = jnp.floor(x - 0.5).astype(jnp.int32)  # cell whose CENTER is left
    f = x - 0.5 - i0                            # in [0, 1)
    return i0, f


def cic_deposit(pos, mass, mesh: int, box: float):
    """(N,3) positions -> (M,M,M) density grid via trilinear scatter."""
    n = pos.shape[0]
    i0, f = _cic_weights(pos, mesh, box)
    rho = jnp.zeros((mesh, mesh, mesh), jnp.float32)
    for dx in (0, 1):
        wx = (1.0 - f[:, 0]) if dx == 0 else f[:, 0]
        ix = (i0[:, 0] + dx) % mesh
        for dy in (0, 1):
            wy = (1.0 - f[:, 1]) if dy == 0 else f[:, 1]
            iy = (i0[:, 1] + dy) % mesh
            for dz in (0, 1):
                wz = (1.0 - f[:, 2]) if dz == 0 else f[:, 2]
                iz = (i0[:, 2] + dz) % mesh
                rho = rho.at[ix, iy, iz].add(mass * wx * wy * wz)
    return rho


def cic_gather(field, pos, mesh: int, box: float):
    """Trilinear interpolation of a (M,M,M) or (3,M,M,M) field at pos."""
    i0, f = _cic_weights(pos, mesh, box)
    out = 0.0
    for dx in (0, 1):
        wx = (1.0 - f[:, 0]) if dx == 0 else f[:, 0]
        ix = (i0[:, 0] + dx) % mesh
        for dy in (0, 1):
            wy = (1.0 - f[:, 1]) if dy == 0 else f[:, 1]
            iy = (i0[:, 1] + dy) % mesh
            for dz in (0, 1):
                wz = (1.0 - f[:, 2]) if dz == 0 else f[:, 2]
                iz = (i0[:, 2] + dz) % mesh
                w = (wx * wy * wz)
                out = out + field[..., ix, iy, iz] * w
    return out  # (..., N)


@functools.partial(jax.jit, static_argnames=("mesh", "box"))
def pm_accelerations(pos, mass, *, mesh: int = 64, box: float = 1.0,
                     G: float = 1.0):
    """PM gravitational accelerations (N, 3) for periodic positions."""
    pos = jnp.asarray(pos, jnp.float32) % box
    mass = jnp.asarray(mass, jnp.float32)
    h = box / mesh

    rho = cic_deposit(pos, mass, mesh, box) / (h ** 3)

    # k-space Poisson: phi_k = -4 pi G rho_k / k^2 (mean mode zeroed)
    k1 = 2.0 * jnp.pi * jnp.fft.fftfreq(mesh, d=h)
    kx = k1[:, None, None]
    ky = k1[None, :, None]
    kz = jnp.fft.rfftfreq(mesh, d=h)[None, None, :] * 2.0 * jnp.pi
    k2 = kx ** 2 + ky ** 2 + kz ** 2
    rho_k = jnp.fft.rfftn(rho)
    phi_k = jnp.where(k2 > 0, -4.0 * jnp.pi * G * rho_k / k2, 0.0)
    phi = jnp.fft.irfftn(phi_k, s=(mesh, mesh, mesh))

    # central-difference mesh forces g = -grad phi
    def grad(axis):
        return (jnp.roll(phi, -1, axis) - jnp.roll(phi, 1, axis)) / (2 * h)

    gfield = jnp.stack([-grad(0), -grad(1), -grad(2)])  # (3, M, M, M)
    acc = cic_gather(gfield, pos, mesh, box)            # (3, N)
    return acc.T


def pm_potential_energy(pos, mass, *, mesh: int = 64, box: float = 1.0,
                        G: float = 1.0):
    """Total PM potential energy (for conservation diagnostics)."""
    pos = jnp.asarray(pos, jnp.float32) % box
    mass = jnp.asarray(mass, jnp.float32)
    h = box / mesh
    rho = cic_deposit(pos, mass, mesh, box) / (h ** 3)
    k1 = 2.0 * jnp.pi * jnp.fft.fftfreq(mesh, d=h)
    kx = k1[:, None, None]
    ky = k1[None, :, None]
    kz = jnp.fft.rfftfreq(mesh, d=h)[None, None, :] * 2.0 * jnp.pi
    k2 = kx ** 2 + ky ** 2 + kz ** 2
    rho_k = jnp.fft.rfftn(rho)
    phi_k = jnp.where(k2 > 0, -4.0 * jnp.pi * G * rho_k / k2, 0.0)
    phi = jnp.fft.irfftn(phi_k, s=(mesh, mesh, mesh))
    particle_phi = cic_gather(phi, pos, mesh, box)
    return 0.5 * jnp.sum(mass * particle_phi)
