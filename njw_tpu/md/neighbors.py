"""Static-shape cell-list neighbor pruning for the nonbonded sweep.

TPU-native counterpart of the reference's NeighborList
(ref: molecular_system.hpp:247-284 — Verlet list rebuilt on a stride):
masked all-pairs is O(N^2) compute and memory with no escape hatch
(VERDICT r1); this module buckets atoms into cutoff-sized cells with a
FIXED per-cell capacity (static shapes — everything stays jittable) and
evaluates LJ+Coulomb only over the 27 neighboring cells:

  1. cell id per atom (minimum-image wrap)
  2. argsort by cell id; per-cell rank via searchsorted
  3. (n_cells, K) atom-index table (sentinel N = empty slot; overflow
     writes drop — capacity is sized with generous headroom and the
     diagnostic `max_occupancy` checks it)
  4. candidates per atom = table rows of the 27 neighbor cells
     -> (N, 27K) gather, masked pair energy

Bonded 1-2/1-3 exclusions are handled by SUBTRACTING the nonbonded
energy of the (sparse) excluded pair list afterwards — exact, and it
avoids gathering an O(N^2) exclusion matrix.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from njw_tpu.md.forces import COULOMB_K
from njw_tpu.md.system import LJParams


def cell_grid(box, cutoff: float) -> tuple[int, int, int]:
    """Static cell counts per dim (cell edge >= cutoff; >=3 cells per dim
    so the 27-cell stencil covers the cutoff sphere exactly once)."""
    box = np.asarray(box, np.float64)
    nc = np.maximum(np.floor(box / cutoff).astype(int), 1)
    return tuple(int(c) for c in nc)


def cell_list_supported(box, cutoff: float) -> bool:
    return all(c >= 3 for c in cell_grid(box, cutoff))


def _neighbor_cell_offsets(nc) -> np.ndarray:
    """(27,) linear-id offsets of the 3x3x3 cell stencil (static)."""
    offs = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                offs.append((dx, dy, dz))
    return np.asarray(offs, np.int32)  # (27, 3)


def build_cell_table(pos, box, nc, capacity: int):
    """(n_cells, K) atom-index table + per-atom cell coords.

    Returns (table, cell_coords, occupancy_max). Overflow beyond
    `capacity` is dropped (mode='drop'); check occupancy_max <= capacity.
    """
    ncx, ncy, ncz = nc
    n = pos.shape[0]
    frac = pos / box - jnp.floor(pos / box)        # wrap to [0, 1)
    coords = jnp.minimum(
        (frac * jnp.asarray([ncx, ncy, ncz], jnp.float32)).astype(jnp.int32),
        jnp.asarray([ncx - 1, ncy - 1, ncz - 1], jnp.int32))
    cid = (coords[:, 0] * ncy + coords[:, 1]) * ncz + coords[:, 2]
    n_cells = ncx * ncy * ncz

    order = jnp.argsort(cid)
    sorted_cid = cid[order]
    starts = jnp.searchsorted(sorted_cid, jnp.arange(n_cells))
    rank = jnp.arange(n) - starts[sorted_cid]
    table = jnp.full((n_cells, capacity), n, jnp.int32)
    table = table.at[sorted_cid, rank].set(order.astype(jnp.int32),
                                           mode="drop")
    counts = jnp.append(starts[1:], n) - starts
    return table, coords, jnp.max(counts)


def neighbor_candidates(table, coords, nc) -> jnp.ndarray:
    """(N, 27 * K) candidate atom indices per atom (sentinel N = empty)."""
    ncx, ncy, ncz = nc
    offs = jnp.asarray(_neighbor_cell_offsets(nc))  # (27, 3)
    nbc = (coords[:, None, :] + offs[None, :, :]) % jnp.asarray(
        [ncx, ncy, ncz], jnp.int32)                 # (N, 27, 3)
    nb_cid = (nbc[..., 0] * ncy + nbc[..., 1]) * ncz + nbc[..., 2]
    cand = table[nb_cid]                            # (N, 27, K)
    return cand.reshape(cand.shape[0], -1)


def _min_image(d, box):
    return d - box * jnp.round(d / box)


def nonbonded_energy_cell_list(
    pos, charge, type_id, box, lj: LJParams, cutoff: float, *,
    nc, capacity: int,
):
    """Cell-list LJ + Coulomb total energy (same physics as
    forces.nonbonded_energy without exclusions; pair sums reordered)."""
    n = pos.shape[0]
    table, coords, occ = build_cell_table(pos, box, nc, capacity)
    cand = neighbor_candidates(table, coords, nc)   # (N, M)

    pos_pad = jnp.concatenate(
        [pos, jnp.full((1, 3), 1e9, pos.dtype)], axis=0)
    charge_pad = jnp.append(charge, 0.0)
    type_pad = jnp.append(type_id, 0)

    d = _min_image(pos_pad[cand] - pos[:, None, :], box)
    r2 = jnp.sum(d * d, axis=-1)
    i_idx = jnp.arange(n, dtype=jnp.int32)[:, None]
    mask = (cand != n) & (cand != i_idx) & (r2 < cutoff * cutoff)
    r2 = jnp.where(mask, r2, 1.0)

    eps_t = lj.epsilon[type_pad]
    sig_t = lj.sigma[type_pad]
    eps = jnp.sqrt(eps_t[cand] * lj.epsilon[type_id][:, None])
    sig = 0.5 * (sig_t[cand] + lj.sigma[type_id][:, None])
    s2 = (sig * sig) / r2
    s6 = s2 * s2 * s2
    e_lj = 4.0 * eps * (s6 * s6 - s6)

    inv_r = jax.lax.rsqrt(r2)
    e_coul = COULOMB_K * charge[:, None] * charge_pad[cand] * inv_r
    e_pair = jnp.where(mask, e_lj + e_coul, 0.0)
    total = 0.5 * jnp.sum(e_pair)
    # capacity overflow would silently DROP atoms (wrong physics);
    # poison the energy with NaN instead so the run fails visibly —
    # re-build the force fn with a larger capacity/headroom if hit
    return jnp.where(occ <= capacity, total, jnp.nan)


def excluded_pairs_energy(pos, charge, type_id, box, lj: LJParams,
                          cutoff: float, pairs: jnp.ndarray):
    """Nonbonded energy of an explicit (P, 2) pair list (the sparse
    bonded-exclusion correction: subtract from the cell-list total)."""
    i, j = pairs[:, 0], pairs[:, 1]
    d = _min_image(pos[j] - pos[i], box)
    r2 = jnp.sum(d * d, axis=-1)
    mask = r2 < cutoff * cutoff
    r2 = jnp.where(mask, r2, 1.0)
    eps = jnp.sqrt(lj.epsilon[type_id[i]] * lj.epsilon[type_id[j]])
    sig = 0.5 * (lj.sigma[type_id[i]] + lj.sigma[type_id[j]])
    s2 = (sig * sig) / r2
    s6 = s2 * s2 * s2
    e_lj = 4.0 * eps * (s6 * s6 - s6)
    e_coul = COULOMB_K * charge[i] * charge[j] * jax.lax.rsqrt(r2)
    return jnp.sum(jnp.where(mask, e_lj + e_coul, 0.0))


def excluded_pair_list(topo) -> Optional[np.ndarray]:
    """(P, 2) 1-2 and 1-3 pairs from the topology (None if unbonded)."""
    pairs = []
    if topo.bonds is not None:
        pairs.append(np.asarray(topo.bonds)[:, :2])
    if topo.angles is not None:
        a = np.asarray(topo.angles)
        pairs.append(np.stack([a[:, 0], a[:, 2]], axis=1))
    if not pairs:
        return None
    cat = np.concatenate(pairs, axis=0).astype(np.int32)
    # dedupe (a 1-3 pair can coincide with a 1-2 bond, e.g. 3-rings):
    # the subtraction must remove each pair ONCE, like the boolean mask
    return np.unique(np.sort(cat, axis=1), axis=0)


def pick_capacity(n: int, box, nc, headroom: float = 3.0,
                  pos_static=None) -> int:
    """Per-cell capacity, 8-aligned: headroom x the mean occupancy, and
    at least 1.5x the MEASURED max occupancy when initial positions are
    given (clustered systems blow far past the mean)."""
    n_cells = int(np.prod(nc))
    mean = n / max(n_cells, 1)
    cap = headroom * max(mean, 1.0)
    if pos_static is not None:
        box = np.asarray(box, np.float64)
        p = np.asarray(pos_static, np.float64)
        frac = p / box - np.floor(p / box)
        coords = np.minimum((frac * nc).astype(int),
                            np.asarray(nc) - 1)
        cid = (coords[:, 0] * nc[1] + coords[:, 1]) * nc[2] + coords[:, 2]
        occ = np.bincount(cid, minlength=n_cells).max()
        cap = max(cap, 1.5 * occ)
    cap = int(np.ceil(cap))
    return max(8, -(-cap // 8) * 8)
