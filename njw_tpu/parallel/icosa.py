"""Panel-sharded icosahedral SWE: one device per rhombus PAIR.

The icosahedral core stores fields as (10, n, n) structured panels
(weather/icosa.py). For multi-chip runs the natural decomposition is one
device per (N_k, S_k) panel pair over a 5-device mesh axis:

* layout (5, 2, n, n, ...) with axis 0 sharded — device k holds northern
  panel k and southern panel k;
* the 8 halo edge maps become TWO batched ppermutes (everything a device
  needs from panel k-1 rides one (3, n) message, everything from k+1
  rides another) plus two LOCAL copies (the N_k <-> S_k edges live on the
  same device);
* the physics is the SAME shift-parameterized code as single-device —
  only the pad function changes (weather/icosa.py operators take
  ``pad=``), the repo-wide pattern for sharing one implementation across
  whole-domain / sharded paths.

The reference has no distributed anything (SURVEY §5.8).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from njw_tpu.weather.icosa import (
    IcosaOperators, IcosaSWEState, swe_tendencies_icosa,
)


def to_pairs(f):
    """(10, n, n, ...) -> (5, 2, n, n, ...): pair axis 0 is the device
    axis; index 1 selects northern (0) / southern (1) panel k."""
    return jnp.stack([f[:5], f[5:]], axis=1)


def from_pairs(f):
    """Inverse of to_pairs."""
    return jnp.concatenate([f[:, 0], f[:, 1]], axis=0)


def pad_halo_pairs(f, axis: str = "p"):
    """Halo exchange for a LOCAL (2, n, n, ...) panel pair inside
    shard_map over a 5-device mesh axis.

    Two batched ppermutes carry all remote rows: from k-1 the message is
    [N(0,:), S(0,:), S(:,n-1)], from k+1 it is [N(:,0), N(n-1,:),
    S(n-1,:)] — the same 8 edge maps as weather/icosa.pad_halo, regrouped
    by source device. Returns (2, n+2, n+2, ...).
    """
    n = f.shape[1]
    fN, fS = f[0], f[1]
    nd = lax.axis_size(axis)
    fwd = [((k - 1) % nd, k) for k in range(nd)]   # data flows k-1 -> k
    bwd = [((k + 1) % nd, k) for k in range(nd)]   # data flows k+1 -> k

    msg_m1 = jnp.stack([fN[0, :], fS[0, :], fS[:, n - 1]])
    msg_p1 = jnp.stack([fN[:, 0], fN[n - 1, :], fS[n - 1, :]])
    m1 = lax.ppermute(msg_m1, axis, fwd)
    p1 = lax.ppermute(msg_p1, axis, bwd)

    pad_w = [(0, 0), (1, 1), (1, 1)] + [(0, 0)] * (f.ndim - 3)
    p = jnp.pad(f, pad_w)
    # northern panel k
    p = p.at[0, 1:-1, 0].set(m1[0])        # (i,-1) = N_{k-1}(0,i)
    p = p.at[0, 0, 1:-1].set(p1[0])        # (-1,j) = N_{k+1}(j,0)
    p = p.at[0, -1, 1:-1].set(m1[1])       # (n,j)  = S_{k-1}(0,j)
    p = p.at[0, 1:-1, -1].set(fS[:, 0])    # (i,n)  = S_k(i,0)   [local]
    # southern panel k
    p = p.at[1, 0, 1:-1].set(p1[1])        # (-1,j) = N_{k+1}(n-1,j)
    p = p.at[1, 1:-1, 0].set(fN[:, n - 1])  # (i,-1) = N_k(i,n-1) [local]
    p = p.at[1, -1, 1:-1].set(m1[2])       # (n,j)  = S_{k-1}(j,n-1)
    p = p.at[1, 1:-1, -1].set(p1[2])       # (i,n)  = S_{k+1}(n-1,i)
    return p


def shard_icosa(ops: IcosaOperators, state: IcosaSWEState, mesh: Mesh,
                axis: str = "p"):
    """Re-layout operators and state into sharded (5, 2, ...) pairs."""
    def place(a):
        return jax.device_put(to_pairs(a), NamedSharding(mesh, P(axis)))

    # w is (4, 10, n, n, 3): pair its PANEL axis -> (4, 5, 2, n, n, 3)
    w_pairs = jnp.stack([ops.w[:, :5], ops.w[:, 5:]], axis=2)
    ops_p = IcosaOperators(
        w=jax.device_put(w_pairs, NamedSharding(mesh, P(None, axis))),
        r=place(ops.r), east=place(ops.east), north=place(ops.north),
        radius=jax.device_put(ops.radius, NamedSharding(mesh, P())),
    )
    st_p = IcosaSWEState(V=place(state.V), h=place(state.h))
    return ops_p, st_p


def unshard_state(state: IcosaSWEState) -> IcosaSWEState:
    """(5, 2, n, n, ...) pairs -> (10, n, n, ...)."""
    return IcosaSWEState(V=from_pairs(state.V), h=from_pairs(state.h))


def sharded_icosa_swe_step(mesh: Mesh, *, g: float = 9.80616,
                           omega: float, nu: float = 0.0,
                           n_steps: int = 1, axis: str = "p",
                           donate: bool = False):
    """Build a jitted multi-chip icosahedral SWE step over a 5-device
    mesh axis (one rhombus pair per device). Call with the outputs of
    shard_icosa: step(state_pairs, ops_pairs, dt) -> state_pairs."""
    if mesh.shape[axis] != 5:
        raise ValueError(
            f"icosahedral pair decomposition needs a 5-device mesh axis "
            f"(got {mesh.shape[axis]})")

    pad = partial(pad_halo_pairs, axis=axis)

    def local_steps(s_pair, ops_pair, dt):
        # local blocks arrive as (1, 2, n, n, ...): drop the device dim
        # so the shared (panel, i, j, ...) physics applies unchanged
        sq = lambda a: a[0]
        ops = IcosaOperators(w=ops_pair.w[:, 0], r=sq(ops_pair.r),
                             east=sq(ops_pair.east),
                             north=sq(ops_pair.north),
                             radius=ops_pair.radius)
        s = IcosaSWEState(V=sq(s_pair.V), h=sq(s_pair.h))

        def rhs(x):
            return swe_tendencies_icosa(x, ops, g=g, omega=omega, nu=nu,
                                        pad=pad)

        def body(x, _):
            ax = lambda a, k: jax.tree.map(
                lambda si, ki: si + a * ki, x, k)
            k1 = rhs(x)
            k2 = rhs(ax(0.5 * dt, k1))
            k3 = rhs(ax(0.5 * dt, k2))
            k4 = rhs(ax(dt, k3))
            comb = jax.tree.map(
                lambda a, b, c, d: a + 2 * b + 2 * c + d, k1, k2, k3, k4)
            return jax.tree.map(
                lambda si, ci: si + dt / 6.0 * ci, x, comb), None

        s, _ = lax.scan(body, s, None, length=n_steps)
        return IcosaSWEState(V=s.V[None], h=s.h[None])

    st_spec = IcosaSWEState(V=P(axis), h=P(axis))
    ops_spec = IcosaOperators(w=P(None, axis), r=P(axis), east=P(axis),
                              north=P(axis), radius=P())
    step = jax.shard_map(local_steps, mesh=mesh,
                         in_specs=(st_spec, ops_spec, P()),
                         out_specs=st_spec, check_vma=False)
    return jax.jit(step, donate_argnums=(0,) if donate else ())
