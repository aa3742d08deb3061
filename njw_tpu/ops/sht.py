"""Spherical-harmonic transform (SHT) on a Gaussian grid.

The reference declares ``GridType::SphericalHarmonic`` in its public enum
but never implements it (ref: weather_sim.hpp:61-66 — declared only; every
grid falls back to Cartesian). This module implements the capability for
real, TPU-first:

* **Setup** (associated Legendre tables, Gaussian nodes/weights) runs once
  in float64 NumPy on the host — stable three-term recurrences, no tracing.
* **Runtime** transforms are `rfft` along longitude plus *batched complex
  matmuls over latitude* (``einsum('mnj,jm->mn')``) — exactly the shape the
  MXU wants. No gathers, no sequential scans, static shapes throughout.

Conventions
-----------
Triangular truncation T; coefficients are stored packed as a complex array
``a[m, n]`` of shape (T+1, T+2) with entries valid for m <= n <= T (the
n = T+1 column exists only inside the derivative tables). Legendre
functions are orthonormalized so that ``0.5 * sum_j w_j Pbar[m,n,j]
Pbar[m,n',j] = delta(n,n')`` on the Gaussian grid (alias-free up to the
quadratic truncation ``T = (2*nlat - 1) // 3``).

The real field is recovered as ``f = sum_m Re(F_m e^{im lambda})`` via
``irfft``; Fourier coefficients carry the 1/nlon factor at analysis time.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# Hemispheric parity of each runtime table: Pbar[m,n](-mu) =
# (-1)^(n-m) Pbar(mu); H = (1-mu^2) dP/dmu flips it. The quadrature
# weights and 1/cos^2 factors are even in mu, so they preserve parity.
_TABLE_PARITY = {"P": +1, "Pw": +1, "Pw_over_c2": +1,
                 "H": -1, "Hw_over_c2": -1}


def gaussian_grid(nlat: int):
    """Gaussian latitudes (ascending mu = sin(lat)) and quadrature weights."""
    mu, w = np.polynomial.legendre.leggauss(nlat)
    return mu, w


def _legendre_tables(trunc: int, mu: np.ndarray):
    """Orthonormal associated Legendre Pbar[m, n, j] and the derivative
    table H[m, n, j] = (1 - mu^2) dPbar/dmu, n up to trunc (P internally
    to trunc+1 for the H recurrence). float64 throughout.
    """
    nlat = mu.size
    nmax = trunc + 1  # need P at n = trunc+1 for H at n = trunc
    P = np.zeros((trunc + 1, nmax + 1, nlat))
    sin2 = 1.0 - mu * mu

    # seed: Pbar_0^0 = 1 under 0.5*int P^2 dmu = 1
    pmm = np.ones(nlat)
    for m in range(trunc + 1):
        if m > 0:
            pmm = pmm * np.sqrt((2.0 * m + 1.0) / (2.0 * m)) * np.sqrt(sin2)
        P[m, m] = pmm
        if m + 1 <= nmax:
            P[m, m + 1] = np.sqrt(2.0 * m + 3.0) * mu * pmm
        for n in range(m + 2, nmax + 1):
            e_n = np.sqrt((n * n - m * m) / (4.0 * n * n - 1.0))
            e_n1 = np.sqrt(((n - 1) ** 2 - m * m)
                           / (4.0 * (n - 1) ** 2 - 1.0))
            P[m, n] = (mu * P[m, n - 1] - e_n1 * P[m, n - 2]) / e_n

    # H_n^m = -n eps_{n+1}^m P_{n+1}^m + (n+1) eps_n^m P_{n-1}^m
    H = np.zeros((trunc + 1, nmax + 1, nlat))
    for m in range(trunc + 1):
        for n in range(m, nmax):
            e_np1 = np.sqrt(((n + 1) ** 2 - m * m)
                            / (4.0 * (n + 1) ** 2 - 1.0))
            h = -n * e_np1 * P[m, n + 1]
            if n - 1 >= m:
                e_n = np.sqrt((n * n - m * m) / (4.0 * n * n - 1.0))
                h = h + (n + 1) * e_n * P[m, n - 1]
            H[m, n] = h
    return P, H


class SphericalHarmonicTransform:
    """Forward/inverse SHT plus the spectral differential operators a
    spectral dynamical core needs.

    Parameters
    ----------
    nlat : Gaussian latitudes. nlon = 2*nlat. Truncation defaults to the
        alias-free quadratic limit (2*nlat - 1) // 3 (nlat=32 -> T21).
    radius : sphere radius (m); enters the Laplacian and wind operators.
    """

    def __init__(self, nlat: int, trunc: int | None = None,
                 radius: float = 6.371e6, dtype=jnp.float32,
                 table_dtype=None, fold_parity: bool | None = None):
        self.nlat = int(nlat)
        self.nlon = 2 * self.nlat
        self.trunc = int(trunc) if trunc is not None else \
            (2 * self.nlat - 1) // 3
        if self.trunc + 1 > self.nlat:
            raise ValueError("truncation too high for nlat (need T+1<=nlat)")
        self.radius = float(radius)

        mu, w = gaussian_grid(self.nlat)
        P, H = _legendre_tables(self.trunc, mu)
        self.mu = mu                      # (nlat,) ascending, numpy f64
        self.lats = np.arcsin(mu)         # radians
        self.lons = 2.0 * np.pi * np.arange(self.nlon) / self.nlon
        self.quad_w = w

        cdtype = jnp.complex64 if dtype == jnp.float32 else jnp.complex128
        self.dtype, self.cdtype = dtype, cdtype
        # Opt-in bf16 Legendre tables: at T341 the cores are HBM-bound on
        # table reads (~240 MB/table f32), so halving table storage is a
        # direct bandwidth lever; XLA fuses the upcast into the matmul
        # operand feed and accumulation stays f32. Accuracy cost is the
        # bf16 table quantization (~4e-3 relative per transform) —
        # measured in BENCH_NOTES r4. Default: full f32.
        self.table_dtype = table_dtype if table_dtype is not None else dtype

        # Convert dtypes in NUMPY before the device transfer: an eager
        # on-device convert_element_type is UNIMPLEMENTED on remote TPU
        # backends (measured on axon/v5e r3 — only jitted ops are general).
        def dev(a, dt=dtype):
            return jnp.asarray(np.asarray(a, np.dtype(dt)))

        # runtime tables (m, n, lat): P for synthesis, 0.5*w*P for analysis,
        # H and 0.5*w*H/(1-mu^2) for wind synthesis / divergence analysis
        tdt = self.table_dtype
        self._P = dev(P[:, : self.trunc + 2, :], tdt)
        self._Pw = dev(0.5 * w * P[:, : self.trunc + 2, :], tdt)
        self._H = dev(H[:, : self.trunc + 2, :], tdt)
        self._Hw_over_c2 = dev(
            0.5 * (w / (1.0 - mu * mu)) * H[:, : self.trunc + 2, :], tdt)
        self._Pw_over_c2 = dev(
            0.5 * (w / (1.0 - mu * mu)) * P[:, : self.trunc + 2, :], tdt)

        # Opt-in parity fold (r5): Pbar[m,n](-mu) = (-1)^(n-m) Pbar(mu)
        # (H has the opposite parity), so each Legendre contraction can
        # run as TWO half-size matmuls over the northern hemisphere with
        # the n axis split by parity — half the FLOPs and 12 -> 8 MXU
        # tile passes per m at T341 (the thin-matmul occupancy residual
        # the corrected r4 roofline identified). Slicing is by n parity
        # (m-independent), so no gathers anywhere; the (-1)^m factor
        # rides as a per-m sign vector.
        # Default by size (same-session A/B, BENCH_NOTES r5): the fold
        # wins ~31% at T341 (nlat=512: BVE 3.52->2.40, SWE 5.03->3.48
        # ms/step) but LOSES at T170 (nlat=256: +16-36%) — at small
        # sizes the extra half-size matmul dispatches cost more than the
        # halved FLOPs. Auto: on from nlat=512 (even nlat required).
        if fold_parity is None:
            fold_parity = self.nlat >= 512 and self.nlat % 2 == 0
        self.fold_parity = bool(fold_parity)
        self._folded = None
        if self.fold_parity:
            if self.nlat % 2:
                raise ValueError("fold_parity requires even nlat")
            jn = self.nlat // 2  # northern half: mu ascending -> j >= jn
            full = {
                "P": (P[:, : self.trunc + 2, :], +1),
                "Pw": (0.5 * w * P[:, : self.trunc + 2, :], +1),
                "Pw_over_c2": (0.5 * (w / (1.0 - mu * mu))
                               * P[:, : self.trunc + 2, :], +1),
                "H": (H[:, : self.trunc + 2, :], -1),
                "Hw_over_c2": (0.5 * (w / (1.0 - mu * mu))
                               * H[:, : self.trunc + 2, :], -1),
            }
            self._folded = {
                name: (dev(X[:, 0::2, jn:], tdt), dev(X[:, 1::2, jn:], tdt))
                for name, (X, _p) in full.items()
            }

        n = np.arange(self.trunc + 2)
        m = np.arange(self.trunc + 1)
        valid = (n[None, :] >= m[:, None]) & (n[None, :] <= self.trunc)
        self._valid = jnp.asarray(valid)
        lap = -n * (n + 1.0) / self.radius**2          # (T+2,)
        self._lap = dev(np.where(valid, lap[None, :], 0.0))
        inv_lap = np.zeros_like(lap)
        inv_lap[1:] = -self.radius**2 / (n[1:] * (n[1:] + 1.0))
        self._inv_lap = dev(np.where(valid, inv_lap[None, :], 0.0))
        # stored REAL (m values), exposed as the complex factor via the
        # _im property: complex leaves must never cross the runtime layer
        # on remote TPU backends (a complex transfer wedges the axon
        # session — measured r3); 1j*m is formed inside the consuming op.
        self._m = dev(m)                                # (T+1,)
        self._mu_grid = dev(
            np.broadcast_to(mu[:, None], (self.nlat, self.nlon)).copy())
        self._cos_lat = dev(
            np.broadcast_to(np.sqrt(1.0 - mu**2)[:, None],
                            (self.nlat, self.nlon)).copy())
        self.spec_shape = (self.trunc + 1, self.trunc + 2)

    # -- core transforms ---------------------------------------------------

    def analysis(self, f):
        """Grid (nlat, nlon) -> packed spectral (T+1, T+2) complex."""
        F = jnp.fft.rfft(jnp.asarray(f, self.dtype), axis=-1) / self.nlon
        F = F[..., : self.trunc + 1]                    # (lat, m)
        a = jnp.einsum("mnj,...jm->...mn", self._Pw, F)
        return jnp.where(self._valid, a, 0.0).astype(self.cdtype)

    def synthesis(self, a):
        """Packed spectral -> grid (nlat, nlon) real."""
        F = jnp.einsum("mnj,...mn->...jm", self._P, a)
        return self._to_grid(F)

    def _to_grid(self, F):
        pad = self.nlon // 2 + 1 - F.shape[-1]
        F = jnp.pad(F, [(0, 0)] * (F.ndim - 1) + [(0, pad)])
        return jnp.fft.irfft(F * self.nlon, n=self.nlon, axis=-1) \
            .astype(self.dtype)

    def _fourier(self, f):
        """Grid -> truncated Fourier coefficients (lat, m)."""
        F = jnp.fft.rfft(jnp.asarray(f, self.dtype), axis=-1) / self.nlon
        return F[..., : self.trunc + 1]

    # -- differential operators --------------------------------------------

    @property
    def _im(self):
        """i*m as a complex vector, formed on use (see _m above)."""
        return 1j * self._m.astype(self.cdtype)

    def laplacian(self, a):
        return a * self._lap

    def inverse_laplacian(self, a):
        """psi with Lap psi = a; n=0 mode set to zero."""
        return a * self._inv_lap

    def d_dlon(self, a):
        return a * self._im[:, None]

    # -- stacked (fused) contractions ---------------------------------------
    #
    # At T341 a table is ~240 MB and the dynamical cores are BANDWIDTH
    # bound on table reads (measured r3: the per-call formulation reads
    # ~3.6 GB/tendency = the 19.5 ms/step HBM roof). Stacking every
    # quantity that contracts against the same table into ONE einsum
    # reads each table once per tendency AND turns the per-m matvecs
    # into per-m matmuls (better MXU occupancy).

    _TABLES = ("P", "H", "Pw", "Pw_over_c2", "Hw_over_c2")

    def _sgn_m(self, parity: int):
        """(-1)^m * table_parity as a (1, 1, m)-broadcastable f32."""
        s = 1.0 - 2.0 * jnp.mod(self._m.astype(jnp.float32), 2.0)
        return (float(parity) * s)[None, None, :]

    def syn_stack(self, a_stack, which: str = "P"):
        """Stacked spectral -> Fourier: (q, m, n) -> (q, lat, m), reading
        the selected table once.

        The contraction runs in REAL arithmetic on a (2q, m, n) split:
        the tables are real f32, and letting XLA upcast them to complex
        would double the table traffic this formulation exists to save
        (measured r3: the complex-operand stacked einsum regressed T341).

        With fold_parity the contraction runs as two half-size matmuls
        over the northern hemisphere (n split by parity) and the south
        is reconstructed by symmetry: F_S = p*(-1)^m (Se - So)."""
        q = a_stack.shape[0]
        ri = jnp.concatenate([jnp.real(a_stack), jnp.imag(a_stack)])
        if self._folded is not None and which in self._folded:
            Xe, Xo = self._folded[which]
            Se = jnp.einsum("mkj,qmk->qjm", Xe, ri[..., 0::2])
            So = jnp.einsum("mkj,qmk->qjm", Xo, ri[..., 1::2])
            north = Se + So
            south = self._sgn_m(_TABLE_PARITY[which]) * (Se - So)
            out = jnp.concatenate([south[:, ::-1, :], north], axis=1)
        else:
            out = jnp.einsum("mnj,qmn->qjm", getattr(self, "_" + which), ri)
        return (out[:q] + 1j * out[q:]).astype(self.cdtype)

    def anal_stack(self, F_stack, which: str):
        """Stacked Fourier -> spectral quadrature against one table:
        (q, lat, m) -> (q, m, n) (unmasked; caller applies _valid).
        Real-split contraction — see syn_stack. fold_parity: quadrature
        over the north half against (F_N ± p*(-1)^m F_S)."""
        q = F_stack.shape[0]
        ri = jnp.concatenate([jnp.real(F_stack), jnp.imag(F_stack)])
        if self._folded is not None and which in self._folded:
            jn = self.nlat // 2
            Xe, Xo = self._folded[which]
            f_n = ri[:, jn:, :]
            f_s = ri[:, :jn, :][:, ::-1, :]  # aligned with north nodes
            sgn = self._sgn_m(_TABLE_PARITY[which])
            g_plus = f_n + sgn * f_s
            g_minus = f_n - sgn * f_s
            ae = jnp.einsum("mkj,qjm->qmk", Xe, g_plus)
            ao = jnp.einsum("mkj,qjm->qmk", Xo, g_minus)
            ne, no = ae.shape[-1], ao.shape[-1]
            if no < ne:  # T+2 odd: pad the odd half for interleaving
                ao = jnp.pad(ao, ((0, 0), (0, 0), (0, ne - no)))
            out = jnp.stack([ae, ao], axis=-1).reshape(
                ae.shape[:-1] + (2 * ne,))[..., : self.trunc + 2]
        else:
            out = jnp.einsum("mnj,qjm->qmn", getattr(self, "_" + which), ri)
        return (out[:q] + 1j * out[q:]).astype(self.cdtype)

    def uv_from_psi_chi(self, psi, chi):
        """Pseudo-winds U = u cos(lat), V = v cos(lat) on the grid from
        spectral streamfunction / velocity potential.

        U = (1/a)[dchi/dlon - (1-mu^2) dpsi/dmu]
        V = (1/a)[dpsi/dlon + (1-mu^2) dchi/dmu]
        """
        inv_a = 1.0 / self.radius
        FU = (jnp.einsum("mnj,mn->jm", self._P, self.d_dlon(chi))
              - jnp.einsum("mnj,mn->jm", self._H, psi + 0j)) * inv_a
        FV = (jnp.einsum("mnj,mn->jm", self._P, self.d_dlon(psi))
              + jnp.einsum("mnj,mn->jm", self._H, chi + 0j)) * inv_a
        return self._to_grid(FU), self._to_grid(FV)

    def divergence_of(self, A, B):
        """Spectral coefficients of div(A, B) / cos^2 pseudo-vector pair:
        {div}_n^m = (1/a) sum_j w_j/(1-mu^2) [ im A P  -  B H ] / 2.

        A, B are grid fields of the pseudo-vector (X cos(lat) components),
        i.e. this returns the spectral divergence of the TRUE vector field
        (X, Y) where A = X cos(lat), B = Y cos(lat).
        """
        FA, FB = self._fourier(A), self._fourier(B)
        d = (jnp.einsum("mnj,jm->mn", self._Pw_over_c2,
                        FA * self._im[None, :])
             - jnp.einsum("mnj,jm->mn", self._Hw_over_c2, FB + 0j))
        return jnp.where(self._valid, d / self.radius, 0.0) \
            .astype(self.cdtype)

    def curl_of(self, A, B):
        """Spectral k . curl(X, Y) for the same pseudo-vector convention."""
        FA, FB = self._fourier(A), self._fourier(B)
        c = (jnp.einsum("mnj,jm->mn", self._Pw_over_c2,
                        FB * self._im[None, :])
             + jnp.einsum("mnj,jm->mn", self._Hw_over_c2, FA + 0j))
        return jnp.where(self._valid, c / self.radius, 0.0) \
            .astype(self.cdtype)

    # -- helpers -------------------------------------------------------------

    def grid_of_mu(self):
        """(nlat, nlon) broadcast of mu = sin(lat)."""
        return self._mu_grid

    def cos_lat(self):
        return self._cos_lat

    def spectral_mode(self, m: int, n: int, amplitude: float = 1.0):
        """Packed coefficients of amplitude * Re(Y_n^m) as a real field."""
        a = jnp.zeros(self.spec_shape, self.cdtype)
        # jnp scalar (not python float): keeps the set usable both under
        # jit and eagerly-on-CPU without an on-device convert
        return a.at[m, n].set(
            jnp.asarray(amplitude if m == 0 else amplitude / 2.0,
                        self.cdtype))

    def global_mean(self, f):
        w = jnp.asarray(self.quad_w, self.dtype)
        return jnp.sum(w[:, None] * jnp.asarray(f, self.dtype)) \
            / (2.0 * self.nlon)


# Register the transform as a pytree so it can cross jit boundaries as an
# ARGUMENT. This matters at scale: tables closed over in a jitted function
# are baked into the HLO as constants (a T341 table set is ~1 GB of
# constants, which blows up remote-compile requests); passed as pytree
# leaves they are ordinary runtime operands.
_SHT_LEAF_NAMES = ("_P", "_Pw", "_H", "_Hw_over_c2", "_Pw_over_c2",
                   "_lap", "_inv_lap", "_m", "_valid",
                   "_mu_grid", "_cos_lat", "_folded")


def _sht_flatten(sht):
    return tuple(getattr(sht, k) for k in _SHT_LEAF_NAMES), \
        (sht.nlat, sht.trunc, sht.radius, np.dtype(sht.dtype).name,
         np.dtype(sht.table_dtype).name, sht.fold_parity)


def _sht_unflatten(aux, leaves):
    nlat, trunc, radius, dtn, tdtn, fold_parity = aux
    obj = object.__new__(SphericalHarmonicTransform)
    obj.nlat, obj.trunc, obj.radius = nlat, trunc, radius
    obj.nlon = 2 * nlat
    obj.dtype = jnp.float32 if dtn == "float32" else jnp.float64
    obj.cdtype = jnp.complex64 if dtn == "float32" else jnp.complex128
    obj.table_dtype = jnp.dtype(tdtn)
    obj.spec_shape = (trunc + 1, trunc + 2)
    obj.fold_parity = fold_parity
    mu, w = gaussian_grid(nlat)
    obj.mu, obj.quad_w = mu, w
    obj.lats = np.arcsin(mu)
    obj.lons = 2.0 * np.pi * np.arange(obj.nlon) / obj.nlon
    for k, v in zip(_SHT_LEAF_NAMES, leaves):
        setattr(obj, k, v)
    return obj


jax.tree_util.register_pytree_node(
    SphericalHarmonicTransform, _sht_flatten, _sht_unflatten)
