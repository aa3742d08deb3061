"""MD forces: LJ + Coulomb nonbonded (masked all-pairs, minimum image),
harmonic bonds, harmonic angles, periodic dihedrals.

ref kernels: lj_force_kernel / tiled_force_kernel (cuda_kernels.cu:55-170),
bond_force_kernel (:270). Energies via the same pass (returned together so
XLA computes forces+energy in one fused sweep).

Forces are the NEGATIVE gradient of the potential; bonded terms are
implemented with jax.grad over the potential — exact, and the gradient
code is generated instead of hand-derived (the TPU-native answer to pages
of hand-written force algebra).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from njw_tpu.md.system import LJParams, MDState, Topology

COULOMB_K = 332.06  # kcal mol^-1 A e^-2 style constant


def _min_image(d, box):
    return d - box * jnp.round(d / box)


def nonbonded_energy(pos, charge, type_id, box, lj: LJParams,
                     cutoff: float, exclusion=None):
    """Total LJ + Coulomb energy with minimum-image all-pairs + cutoff.

    exclusion: optional (N, N) bool — True pairs are skipped (bonded 1-2 /
    1-3 exclusions, precomputed statically)."""
    n = pos.shape[0]
    d = _min_image(pos[None, :, :] - pos[:, None, :], box)
    r2 = jnp.sum(d * d, axis=-1)
    eye = jnp.eye(n, dtype=bool)
    mask = ~eye & (r2 < cutoff * cutoff)
    if exclusion is not None:
        mask = mask & ~exclusion
    r2 = jnp.where(mask, r2, 1.0)  # safe value where masked

    eps_i = lj.epsilon[type_id]
    sig_i = lj.sigma[type_id]
    eps = jnp.sqrt(eps_i[:, None] * eps_i[None, :])       # Lorentz-Berthelot
    sig = 0.5 * (sig_i[:, None] + sig_i[None, :])
    s2 = (sig * sig) / r2
    s6 = s2 * s2 * s2
    e_lj = 4.0 * eps * (s6 * s6 - s6)

    inv_r = jax.lax.rsqrt(r2)
    e_coul = COULOMB_K * charge[:, None] * charge[None, :] * inv_r

    e_pair = jnp.where(mask, e_lj + e_coul, 0.0)
    return 0.5 * jnp.sum(e_pair)


def bonded_energy(pos, box, topo: Topology):
    """Harmonic bonds + angles, periodic dihedrals
    (ref: molecular_system.hpp bonds/angles/dihedrals)."""
    e = jnp.float32(0.0)
    if topo.bonds is not None:
        ri = pos[topo.bonds[:, 0]]
        rj = pos[topo.bonds[:, 1]]
        d = _min_image(rj - ri, box)
        r = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
        e = e + jnp.sum(0.5 * topo.bond_k * (r - topo.bond_r0) ** 2)
    if topo.angles is not None:
        ri = pos[topo.angles[:, 0]]
        rj = pos[topo.angles[:, 1]]
        rk = pos[topo.angles[:, 2]]
        a = _min_image(ri - rj, box)
        b = _min_image(rk - rj, box)
        cosang = jnp.sum(a * b, axis=-1) * jax.lax.rsqrt(
            jnp.sum(a * a, axis=-1) * jnp.sum(b * b, axis=-1) + 1e-12)
        theta = jnp.arccos(jnp.clip(cosang, -1 + 1e-6, 1 - 1e-6))
        e = e + jnp.sum(0.5 * topo.angle_k * (theta - topo.angle_theta0) ** 2)
    if topo.dihedrals is not None:
        ri, rj, rk, rl = (pos[topo.dihedrals[:, m]] for m in range(4))
        b1 = _min_image(rj - ri, box)
        b2 = _min_image(rk - rj, box)
        b3 = _min_image(rl - rk, box)
        n1 = jnp.cross(b1, b2)
        n2 = jnp.cross(b2, b3)
        m1 = jnp.cross(n1, b2 * jax.lax.rsqrt(
            jnp.sum(b2 * b2, axis=-1, keepdims=True) + 1e-12))
        x = jnp.sum(n1 * n2, axis=-1)
        y = jnp.sum(m1 * n2, axis=-1)
        phi = jnp.arctan2(y, x)
        e = e + jnp.sum(topo.dihedral_k
                        * (1.0 + jnp.cos(topo.dihedral_n * phi
                                         - topo.dihedral_phase)))
    return e


def _bonded_exclusion(n: int, topo: Topology):
    """(N,N) bool mask of 1-2 and 1-3 bonded pairs to exclude from
    nonbonded interactions (static, computed once)."""
    import numpy as np

    mask = np.zeros((n, n), dtype=bool)
    if topo.bonds is not None:
        b = np.asarray(topo.bonds)
        mask[b[:, 0], b[:, 1]] = mask[b[:, 1], b[:, 0]] = True
    if topo.angles is not None:
        a = np.asarray(topo.angles)
        mask[a[:, 0], a[:, 2]] = mask[a[:, 2], a[:, 0]] = True
    return jnp.asarray(mask)


# auto-selection crossover for the cell list. MEASURED on v5e: TPU
# gathers are so slow that masked all-pairs wins by 25-85x while its
# (N, N) working set fits HBM (20k: 13.6 ms all-pairs vs 311 ms cells;
# 5k: 0.9 vs 74 ms) — the cell list is the MEMORY escape hatch, not a
# speed win, so on TPU it auto-engages only where all-pairs cannot run.
# On CPU the crossover is early (gathers are cheap).
_CELL_LIST_MIN_N_CPU = 2000
_CELL_LIST_MIN_N_TPU = 30_000


def _cell_list_min_n() -> int:
    import jax

    return (_CELL_LIST_MIN_N_TPU if jax.devices()[0].platform == "tpu"
            else _CELL_LIST_MIN_N_CPU)


def make_force_fn(topo: Topology, lj: LJParams, cutoff: float, n: int,
                  *, method: str = "auto", box_static=None,
                  pos_static=None):
    """Returns force_fn(state) -> (forces (N,3), energies dict). Forces are
    exact negative gradients of the total potential via jax.grad.

    method: 'all_pairs' (masked O(N^2)), 'cell_list' (static-shape
    bucketed neighbors, njw_tpu.md.neighbors — the reference NeighborList
    role, ref: molecular_system.hpp:247-284), or 'auto' (cell list when
    N >= 2000 and the box spans >= 3 cells per dim; needs box_static,
    the concrete (3,) box lengths, to size the static cell grid;
    pos_static, when given, sizes the per-cell capacity from the
    MEASURED initial occupancy instead of the mean — pass it for
    clustered/inhomogeneous systems). Cell overflow at runtime poisons
    the energy with NaN (visible failure, never silently wrong forces).
    """
    has_bonded = topo.bonds is not None or topo.angles is not None \
        or topo.dihedrals is not None

    use_cells = False
    if method in ("auto", "cell_list") and box_static is not None:
        from njw_tpu.md.neighbors import cell_list_supported

        eligible = cell_list_supported(box_static, cutoff)
        if method == "cell_list" and not eligible:
            raise ValueError("cell_list needs >= 3 cells per dim "
                             f"(box {box_static}, cutoff {cutoff})")
        use_cells = eligible and (method == "cell_list"
                                  or n >= _cell_list_min_n())
    elif method == "cell_list":
        raise ValueError("cell_list requires box_static")

    if use_cells:
        from njw_tpu.md.neighbors import (
            cell_grid, excluded_pair_list, excluded_pairs_energy,
            nonbonded_energy_cell_list, pick_capacity,
        )

        nc = cell_grid(box_static, cutoff)
        capacity = pick_capacity(n, box_static, nc,
                                 pos_static=pos_static)
        excl_pairs = excluded_pair_list(topo) if has_bonded else None

        def potential(pos, charge, type_id, box):
            e_nb = nonbonded_energy_cell_list(
                pos, charge, type_id, box, lj, cutoff, nc=nc,
                capacity=capacity)
            if excl_pairs is not None:
                e_nb = e_nb - excluded_pairs_energy(
                    pos, charge, type_id, box, lj, cutoff,
                    jnp.asarray(excl_pairs))
            e_b = bonded_energy(pos, box, topo) if has_bonded else 0.0
            return e_nb + e_b, (e_nb, e_b)
    else:
        exclusion = _bonded_exclusion(n, topo) if has_bonded else None

        def potential(pos, charge, type_id, box):
            e_nb = nonbonded_energy(pos, charge, type_id, box, lj, cutoff,
                                    exclusion)
            e_b = bonded_energy(pos, box, topo) if has_bonded else 0.0
            return e_nb + e_b, (e_nb, e_b)

    grad_fn = jax.grad(potential, argnums=0, has_aux=True)

    # One jitted executable per force field: called bare (tests, one-shot
    # evaluations) this avoids op-by-op eager dispatch of the whole
    # autodiff graph (~240 dispatches measured); called inside an outer
    # jit (the MD step loop) it inlines for free.
    @jax.jit
    def force_fn(s: MDState):
        g, (e_nb, e_b) = grad_fn(s.pos, s.charge, s.type_id, s.box)
        return -g, {"potential": e_nb + e_b, "nonbonded": e_nb, "bonded": e_b}

    return force_fn


def forces_and_energy(s: MDState, topo: Topology, lj: LJParams,
                      cutoff: float = 2.5):
    return make_force_fn(topo, lj, cutoff, s.n)(s)
