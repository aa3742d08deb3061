"""Latitude-sharded spherical-harmonic transforms and spectral cores.

The scaling design for the global spectral cores (SURVEY §2.10 applied to
the sphere; the reference has no distributed anything):

* Grid fields (nlat, nlon) shard over a mesh axis along LATITUDE; the
  longitude FFTs are local by construction.
* The Legendre tables (m, n, lat) shard over their latitude axis, so each
  chip holds 1/D of the ~0.9 GB T341 table set.
* Spectral coefficients stay REPLICATED — (T+1)(T+2) complex is tiny next
  to the grid — so synthesis (spectral -> grid) is embarrassingly local:
  each chip computes only its latitude rows.
* Analysis (grid -> spectral) is a local partial contraction over local
  latitudes plus ONE psum of the (small) coefficient array over the mesh
  axis — the Gaussian quadrature is a sum over latitudes, which is exactly
  what psum does. ICI traffic per tendency ~ a few coefficient arrays.

The prognostic state crosses the jit boundary packed as (real, imag) f32
pairs (see weather/spherical.py — complex never touches the runtime
layer on remote TPU backends).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from njw_tpu.ops.sht import SphericalHarmonicTransform, _SHT_LEAF_NAMES
from njw_tpu.weather.spherical import (
    bve_tendencies, pack_state, swe_tendencies, unpack_state,
)

# lat-indexed leaves and the mesh-axis position of their latitude dim
_LAT_AXIS_OF_LEAF = {
    "_P": 2, "_Pw": 2, "_H": 2, "_Hw_over_c2": 2, "_Pw_over_c2": 2,
    "_mu_grid": 0, "_cos_lat": 0,
}


def sht_partition_specs(axis: str = "lat"):
    """PartitionSpec per SHT leaf, in _SHT_LEAF_NAMES order: latitude-
    indexed tables shard over `axis`, spectral-indexed ones replicate."""
    specs = []
    for name in _SHT_LEAF_NAMES:
        if name == "_folded":
            continue  # None for shardable transforms (see shard_sht guard)
        dim = _LAT_AXIS_OF_LEAF.get(name)
        if dim is None:
            specs.append(P())
        else:
            spec = [None, None, None][: (3 if dim == 2 else 2)]
            spec[dim] = axis
            specs.append(P(*spec))
    return tuple(specs)


def shard_sht(sht: SphericalHarmonicTransform, mesh: Mesh,
              axis: str = "lat"):
    """device_put the transform with lat-indexed tables sharded."""
    if getattr(sht, "fold_parity", False):
        raise NotImplementedError(
            "fold_parity tables pair mirror latitudes on one device; "
            "build the transform with fold_parity=False for lat-sharding")
    leaves, treedef = jax.tree.flatten(sht)
    shardings = [NamedSharding(mesh, s) for s in sht_partition_specs(axis)]
    placed = [jax.device_put(l, s) for l, s in zip(leaves, shardings)]
    return jax.tree.unflatten(treedef, placed)


class _PsumSHT:
    """Proxy over a LOCAL-slab transform for use inside shard_map: the
    grid->spectral directions get a psum over the latitude mesh axis
    (Gaussian quadrature = sum over latitudes); everything else delegates
    (synthesis and wind synthesis produce local latitude rows with no
    communication)."""

    def __init__(self, sht, axis: str):
        self._sht = sht
        self._axis = axis

    def __getattr__(self, name):
        return getattr(self._sht, name)

    def _psum_c(self, a):
        # reduce as stacked (real, imag): complex AllReduce support is
        # spotty across backends; this lowers to one f32 psum
        s = lax.psum(jnp.stack([jnp.real(a), jnp.imag(a)]), self._axis)
        return (s[0] + 1j * s[1]).astype(a.dtype)

    def analysis(self, f):
        return self._psum_c(self._sht.analysis(f))

    def anal_stack(self, F_stack, which: str):
        # the stacked quadrature contracts over the local latitude slab
        return self._psum_c(self._sht.anal_stack(F_stack, which))

    def divergence_of(self, A, B):
        return self._psum_c(self._sht.divergence_of(A, B))

    def curl_of(self, A, B):
        return self._psum_c(self._sht.curl_of(A, B))

    def global_mean(self, f):
        # the unflattened local transform carries FULL-length quadrature
        # weights; silently mixing them with a local slab would be wrong
        raise NotImplementedError(
            "global_mean is undefined on local latitude slabs")


def _rk4(tend, s, dt):
    ax = lambda a, k: jax.tree.map(lambda si, ki: si + a * ki, s, k)
    k1 = tend(s)
    k2 = tend(ax(0.5 * dt, k1))
    k3 = tend(ax(0.5 * dt, k2))
    k4 = tend(ax(dt, k3))
    comb = jax.tree.map(lambda a, b, c, d: a + 2 * b + 2 * c + d,
                        k1, k2, k3, k4)
    return jax.tree.map(lambda si, ci: si + dt / 6.0 * ci, s, comb)


def sharded_spherical_step(sht: SphericalHarmonicTransform, mesh: Mesh,
                           *, core: str = "swe", omega: float,
                           nu4: float = 0.0, n_steps: int = 1,
                           axis: str = "lat", donate: bool = False):
    """Build a jitted multi-chip spectral step: shard_map over a 1-D
    latitude mesh; packed (real, imag) replicated spectral state in/out.

    Returns step(packed_state, sharded_sht, dt) -> packed_state running
    ``n_steps`` RK4 steps per call. Use shard_sht() to place the
    transform. nlat must be divisible by the mesh axis size."""
    if sht.nlat % mesh.shape[axis]:
        raise ValueError(
            f"nlat={sht.nlat} not divisible by mesh axis {axis!r} "
            f"(size {mesh.shape[axis]})")
    tendency = {
        "bve": lambda s, t: bve_tendencies(s, t, omega, nu4),
        "swe": lambda s, t: swe_tendencies(s, t, omega, nu4),
    }[core]

    def local_steps(p, sht_local, dt):
        t = _PsumSHT(sht_local, axis)

        def body(s, _):
            return _rk4(lambda x: tendency(x, t), s, dt), None

        s, _ = lax.scan(body, unpack_state(p), None, length=n_steps)
        return pack_state(s)

    state_spec = jax.tree.map(lambda _: P(), pack_state_spec_probe(sht, core))
    sht_specs_tree = jax.tree.unflatten(
        jax.tree.structure(sht), sht_partition_specs(axis))
    step = jax.shard_map(
        local_steps, mesh=mesh,
        in_specs=(state_spec, sht_specs_tree, P()),
        out_specs=state_spec, check_vma=False,
    )
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def pack_state_spec_probe(sht, core: str):
    """A zero packed state of the right pytree structure (used only to
    shape PartitionSpec trees; never touches the device)."""
    import numpy as np

    from njw_tpu.weather.spherical import (
        SphericalBarotropicState, SphericalSWEState,
    )

    z = np.zeros((2,) + sht.spec_shape, np.float32)
    if core == "bve":
        return SphericalBarotropicState(zeta=z)
    return SphericalSWEState(zeta=z, div=z, phi=z)
