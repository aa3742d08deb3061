"""Gravitational accelerations: MXU matmul formulation + direct form.

The reference computes O(N^2) direct summation with per-thread tile loops
(ref: adaptive_kernels.cu:15-143; Python loop ref: particle.py:119-152).
Two TPU-native formulations here:

* 'direct' — row-blocked explicit differences (C,N,3); exact arithmetic,
  VPU-bound. Best precision; default for small/medium N.
* 'mxu'    — the same sum re-expressed as dense linear algebra so the
  FLOPs land on the 128x128 systolic array:
      r2[i,j] = |p_i|^2 + |p_j|^2 - 2 p_i.p_j        (Gram: matmul)
      w[i,j]  = m_j (r2+eps^2)^(-3/2),  w[i,i] = 0   (exact index mask)
      acc_i   = G (w @ P - p_i * rowsum(w))           (two more matmuls)
  The Gram form loses ~eps*|p|^2 absolute precision to cancellation, so
  r2 is clamped at the softening floor and the diagonal is masked by
  index (not by value). Preferred at large N where the MXU dominates.

Both are row-blocked with lax.map so the O(N^2) working set stays
(chunk, N) — the N x N matrix never exists in HBM at once.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from njw_tpu.nbody.system import NBodySystem

_DEFAULT_CHUNK = 1024
_MXU_THRESHOLD = 4096  # below this, 'auto' uses the direct form


def _acc_rows_direct(pos_rows, row0, pos, mass, G, soft2):
    """(C,3) row block vs all N: explicit differences, (C,N,3) temp."""
    d = pos[None, :, :] - pos_rows[:, None, :]          # (C, N, 3)
    r2 = jnp.sum(d * d, axis=-1) + soft2                # (C, N)
    inv_r = jax.lax.rsqrt(r2)
    w = mass[None, :] * inv_r * inv_r * inv_r
    acc = jnp.einsum("cn,cnd->cd", w, d)
    return G * acc


def _acc_rows_mxu(pos_rows, row0, pos, mass, G, soft2):
    """(C,3) row block vs all N via Gram-matrix matmuls (MXU)."""
    c, n = pos_rows.shape[0], pos.shape[0]
    dots = jnp.dot(pos_rows, pos.T, preferred_element_type=jnp.float32)
    a2 = jnp.sum(pos_rows * pos_rows, axis=1)[:, None]
    b2 = jnp.sum(pos * pos, axis=1)[None, :]
    # clamp: Gram cancellation noise can drive r2 slightly negative
    r2 = jnp.maximum(a2 + b2 - 2.0 * dots, 0.0) + soft2
    inv_r = jax.lax.rsqrt(r2)
    w = mass[None, :] * inv_r * inv_r * inv_r
    # exact self-pair mask by global index (value-based masks are unsafe
    # under cancellation noise)
    rows = jax.lax.broadcasted_iota(jnp.int32, (c, n), 0) + row0
    cols = jax.lax.broadcasted_iota(jnp.int32, (c, n), 1)
    w = jnp.where(rows == cols, 0.0, w)
    wp = jnp.dot(w, pos, preferred_element_type=jnp.float32)
    rs = jnp.sum(w, axis=1)[:, None]
    return G * (wp - pos_rows * rs)


@partial(jax.jit, static_argnames=("chunk", "method", "pm_box",
                                   "pm_mesh"))
def accelerations(s: NBodySystem, chunk: int = _DEFAULT_CHUNK,
                  method: str = "auto", pm_box: float = 0.0,
                  pm_mesh: int = 64) -> jnp.ndarray:
    """(N,3) accelerations: row-blocked all-pairs ('direct'/'mxu'), or
    the O(N + M^3 log M) particle-mesh solver ('pm', periodic box
    pm_box^3, njw_tpu.nbody.pm) for N >> 1e5."""
    n = s.pos.shape[0]
    if method in ("pm", "p3m"):
        from njw_tpu.nbody.pm import p3m_accelerations, pm_accelerations

        if pm_box <= 0:
            raise ValueError(f"method={method!r} requires pm_box "
                             "(periodic box side length)")
        fn = pm_accelerations if method == "pm" else p3m_accelerations
        return fn(s.pos, s.mass, mesh=pm_mesh, box=float(pm_box), G=s.G)
    if method == "auto":
        method = "direct" if n < _MXU_THRESHOLD else "mxu"
    row_fn = _acc_rows_direct if method == "direct" else _acc_rows_mxu
    soft2 = s.softening * s.softening

    if n <= chunk:
        return row_fn(s.pos, 0, s.pos, s.mass, s.G, soft2)

    pad = (-n) % chunk
    pos_p = s.pos if pad == 0 else jnp.concatenate(
        [s.pos, jnp.full((pad, 3), 1e15, s.pos.dtype)], axis=0)
    rows = pos_p.reshape(-1, chunk, 3)
    offs = jnp.arange(rows.shape[0], dtype=jnp.int32) * chunk
    out = jax.lax.map(
        lambda ro: row_fn(ro[0], ro[1], s.pos, s.mass, s.G, soft2),
        (rows, offs),
    )
    return out.reshape(-1, 3)[:n]


@jax.jit
def potential_energy(s: NBodySystem) -> jnp.ndarray:
    """PE = -G sum_{i<j} m_i m_j / r_ij (ref: particle.py:236-254),
    softened consistently with the force."""
    d = s.pos[None, :, :] - s.pos[:, None, :]
    r2 = jnp.sum(d * d, axis=-1)
    n = s.pos.shape[0]
    soft2 = s.softening * s.softening
    inv_r = jax.lax.rsqrt(r2 + soft2)
    mm = s.mass[:, None] * s.mass[None, :]
    eye = jnp.eye(n, dtype=bool)
    pair = jnp.where(eye, 0.0, mm * inv_r)
    return -0.5 * s.G * jnp.sum(pair)
