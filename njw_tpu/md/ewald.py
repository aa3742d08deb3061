"""Ewald electrostatics for periodic MD (long-range Coulomb).

The reference's Coulomb is cutoff-truncated (ref: cuda_kernels.cu LJ
kernels; no Ewald/PME anywhere) — wrong for ionic systems. Classic GPU
answers are PME (FFT mesh + B-spline spreading); on TPU the cleaner
shape for N up to ~1e5 is the EXACT Ewald sum with the reciprocal-space
structure factor computed as dense (N, K) cos/sin matrices — two MXU
matmuls instead of scatter/spread kernels, no mesh error:

  E = E_real + E_recip + E_self
  E_real  = 1/2 sum_{i!=j, r<rc} q_i q_j erfc(alpha r) / r   (minimum image)
  E_recip = (2 pi / V) sum_{k!=0} exp(-k^2/4a^2)/k^2 |S(k)|^2
            S(k) = sum_j q_j exp(i k . r_j)
  E_self  = -alpha/sqrt(pi) sum q_i^2

Forces are exact negative gradients via jax.grad. Units follow
md.forces.COULOMB_K (energy = K q_i q_j / r).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from njw_tpu.md.forces import COULOMB_K


def kvectors(box, kmax: int) -> np.ndarray:
    """(K, 3) reciprocal vectors 2 pi n / L with 0 < |n|_inf <= kmax
    (half-space; the conjugate half is folded into a factor 2)."""
    box = np.asarray(box, np.float64)
    ns = []
    for nx in range(0, kmax + 1):
        for ny in range(-kmax, kmax + 1):
            for nz in range(-kmax, kmax + 1):
                if nx == 0 and (ny < 0 or (ny == 0 and nz <= 0)):
                    continue  # half space, exclude 0
                ns.append((nx, ny, nz))
    n = np.asarray(ns, np.float64)
    return (2.0 * np.pi * n / box).astype(np.float32)


def _min_image(d, box):
    return d - box * jnp.round(d / box)


def ewald_energy(pos, charge, box, *, alpha: float = 1.0,
                 r_cut: float = 2.5, kvecs) -> jnp.ndarray:
    """Total Ewald Coulomb energy (see module docstring)."""
    pos = jnp.asarray(pos, jnp.float32)
    q = jnp.asarray(charge, jnp.float32)
    n = pos.shape[0]

    # real space (minimum image, erfc-screened)
    d = _min_image(pos[None, :, :] - pos[:, None, :], box)
    r2 = jnp.sum(d * d, axis=-1)
    eye = jnp.eye(n, dtype=bool)
    mask = ~eye & (r2 < r_cut * r_cut)
    r = jnp.sqrt(jnp.where(mask, r2, 1.0))
    e_real = 0.5 * jnp.sum(
        jnp.where(mask,
                  q[:, None] * q[None, :] * jax.lax.erfc(alpha * r) / r,
                  0.0))

    # reciprocal space: S(k) via two dense matmuls (MXU)
    phase = pos @ kvecs.T                      # (N, K)
    ck = jnp.cos(phase)
    sk = jnp.sin(phase)
    re = q @ ck                                # (K,)
    im = q @ sk
    k2 = jnp.sum(jnp.asarray(kvecs) ** 2, axis=-1)
    vol = jnp.prod(jnp.asarray(box, jnp.float32))
    coef = jnp.exp(-k2 / (4.0 * alpha * alpha)) / k2
    # factor 2: kvecs span a half space
    e_recip = (2.0 * jnp.pi / vol) * 2.0 * jnp.sum(
        coef * (re * re + im * im))

    e_self = -alpha / jnp.sqrt(jnp.pi) * jnp.sum(q * q)
    return COULOMB_K * (e_real + e_recip + e_self)


def make_ewald_coulomb(box, *, alpha: float = 1.0, r_cut: float = 2.5,
                       kmax: int = 6):
    """Returns (energy_fn(pos, charge), force_fn(pos, charge)) with the
    k-vector table precomputed for the (static) box."""
    kv = jnp.asarray(kvectors(np.asarray(box), kmax))
    box = jnp.asarray(box, jnp.float32)

    @jax.jit
    def energy(pos, charge):
        return ewald_energy(pos, charge, box, alpha=alpha, r_cut=r_cut,
                            kvecs=kv)

    grad = jax.jit(jax.grad(lambda p, q: energy(p, q)))

    @jax.jit
    def forces(pos, charge):
        return -grad(pos, charge)

    return energy, forces


@functools.partial(jax.jit, static_argnames=("shells",))
def direct_image_sum(pos, charge, box, shells: int = 3):
    """Brute-force periodic Coulomb energy over (2*shells+1)^3 image
    cells — the slow reference for Ewald validation (neutral cells)."""
    pos = jnp.asarray(pos, jnp.float32)
    q = jnp.asarray(charge, jnp.float32)
    box = jnp.asarray(box, jnp.float32)
    n = pos.shape[0]
    e = 0.0
    for ix in range(-shells, shells + 1):
        for iy in range(-shells, shells + 1):
            for iz in range(-shells, shells + 1):
                off = jnp.asarray([ix, iy, iz], jnp.float32) * box
                d = pos[None, :, :] + off[None, None, :] - pos[:, None, :]
                r = jnp.sqrt(jnp.sum(d * d, axis=-1)
                             + (1e-30 if (ix, iy, iz) != (0, 0, 0) else 0))
                pair = q[:, None] * q[None, :] / jnp.where(r > 1e-15, r, 1.0)
                if (ix, iy, iz) == (0, 0, 0):
                    pair = pair * (1.0 - jnp.eye(n))
                e = e + 0.5 * jnp.sum(jnp.where(r > 1e-15, pair, 0.0))
    return COULOMB_K * e
