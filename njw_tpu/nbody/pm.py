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


# ---------------------------------------------------------------------------
# P3M: Ewald-split particle-mesh. PM alone softens forces below ~2 mesh
# cells; P3M smears the mesh charge with a Gaussian (exp(-k^2/4a^2) in
# k-space) and restores the short range with the exact erfc-screened pair
# force over cell-list neighbors — the production N-body method.
# ---------------------------------------------------------------------------


def _short_range_accel(pos, mass, box: float, alpha: float, r_cut: float,
                       G, nc, capacity: int):
    """erfc-screened direct pair accelerations over 27-cell neighbors.

    a_i = G sum_j m_j [erfc(a r)/r^2 + 2a/sqrt(pi) exp(-a^2 r^2)/r] r_ij/r
    (reuses the MD cell-list machinery; NaN-poisons on cell overflow).
    """
    from njw_tpu.md.neighbors import build_cell_table, neighbor_candidates

    n = pos.shape[0]
    box3 = jnp.asarray([box, box, box], jnp.float32)
    table, coords, occ = build_cell_table(pos, box3, nc, capacity)
    cand = neighbor_candidates(table, coords, nc)       # (N, M)

    pos_pad = jnp.concatenate(
        [pos, jnp.full((1, 3), 1e9, pos.dtype)], axis=0)
    mass_pad = jnp.append(mass, 0.0)

    d = pos_pad[cand] - pos[:, None, :]
    d = d - box * jnp.round(d / box)                    # minimum image
    r2 = jnp.sum(d * d, axis=-1)
    i_idx = jnp.arange(n, dtype=jnp.int32)[:, None]
    mask = (cand != n) & (cand != i_idx) & (r2 < r_cut * r_cut)
    r2 = jnp.where(mask, r2, 1.0)
    r = jnp.sqrt(r2)
    inv_r = 1.0 / r
    kernel = (jax.lax.erfc(alpha * r) * inv_r
              + (2.0 * alpha / jnp.sqrt(jnp.pi))
              * jnp.exp(-(alpha * r) ** 2)) * (inv_r * inv_r)
    w = jnp.where(mask, mass_pad[cand] * kernel, 0.0)   # (N, M)
    acc = G * jnp.sum(w[..., None] * d, axis=1)         # toward neighbors
    return jnp.where(occ <= capacity, 1.0, jnp.nan) * acc


@functools.partial(jax.jit,
                   static_argnames=("mesh", "box", "alpha", "r_cut"))
def p3m_accelerations(pos, mass, *, mesh: int = 64, box: float = 1.0,
                      G=1.0, alpha: float = 0.0, r_cut: float = 0.0):
    """P3M gravitational accelerations (N, 3), periodic box.

    Defaults: r_cut = 5 mesh cells, alpha = 2.5 / r_cut (smear scale
    2 cells — resolvable after CIC deconvolution). Exact in the far
    field via the smeared mesh, exact at short range via the erfc pair
    force; residual error ~1-3% around r_cut.
    """
    h = box / mesh
    r_cut = r_cut or 5.0 * h
    alpha = alpha or 2.5 / r_cut
    pos = jnp.asarray(pos, jnp.float32) % box
    mass = jnp.asarray(mass, jnp.float32)

    # long range: PM with Gaussian-smeared Green's function
    rho = cic_deposit(pos, mass, mesh, box) / (h ** 3)
    k1 = 2.0 * jnp.pi * jnp.fft.fftfreq(mesh, d=h)
    kx = k1[:, None, None]
    ky = k1[None, :, None]
    kz = jnp.fft.rfftfreq(mesh, d=h)[None, None, :] * 2.0 * jnp.pi
    k2 = kx ** 2 + ky ** 2 + kz ** 2
    rho_k = jnp.fft.rfftn(rho)
    smear = jnp.exp(-k2 / (4.0 * alpha * alpha))

    # CIC deconvolution: deposit AND gather each convolve with the CIC
    # triangle window W(k) = prod sinc^2(k_i h / 2); divide by W^2 so the
    # smeared Green's function is not additionally attenuated
    def _sinc(x):
        return jnp.where(jnp.abs(x) > 1e-8, jnp.sin(x) / jnp.where(
            jnp.abs(x) > 1e-8, x, 1.0), 1.0)

    w_cic = (_sinc(kx * h / 2.0) * _sinc(ky * h / 2.0)
             * _sinc(kz * h / 2.0)) ** 2
    deconv = 1.0 / jnp.maximum(w_cic * w_cic, 0.05)

    phi_k = jnp.where(k2 > 0,
                      -4.0 * jnp.pi * G * rho_k * smear * deconv / k2, 0.0)
    # spectral gradient g = -ik phi (a central difference attenuates by
    # sinc(k h), visibly softening the short range): 3 inverse FFTs
    shape3 = (mesh, mesh, mesh)
    gfield = jnp.stack([
        jnp.fft.irfftn(-1j * kx * phi_k, s=shape3),
        jnp.fft.irfftn(-1j * ky * phi_k, s=shape3),
        jnp.fft.irfftn(-1j * kz * phi_k, s=shape3),
    ])
    acc_long = cic_gather(gfield, pos, mesh, box).T

    # short range over cell neighbors (cells sized to r_cut)
    from njw_tpu.md.neighbors import cell_grid, pick_capacity

    nc = cell_grid([box] * 3, r_cut)
    cap = pick_capacity(pos.shape[0], [box] * 3, nc)
    acc_short = _short_range_accel(pos, mass, box, alpha, r_cut, G,
                                   nc, cap)
    return acc_long + acc_short
