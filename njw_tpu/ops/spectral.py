"""Spectral building blocks: FD-consistent wavenumbers, Poisson/Helmholtz
solves on periodic grids.

Used by the barotropic core (streamfunction inversion) and the semi-implicit
SWE integrator. The reference has no counterpart — its barotropic core falls
back to SWE (ref: weather_simulation.cpp:542-549) and its semi-implicit
integrator falls back to Euler (ref :465-471); these modules implement the
capability for real.

All transforms use ``jnp.fft`` (XLA's native FFT, MXU/VPU-accelerated on
TPU). For multi-chip grids, the distributed transpose-based variant lives in
``njw_tpu.parallel.fft``.
"""
from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def _fd_wavenumbers_np(n: int, d: float, kind: str) -> np.ndarray:
    """Effective wavenumbers k_eff for a length-n periodic axis.

    kind='spectral'  : exact k = 2 pi m / (n d)
    kind='central'   : modified wavenumber sin(k d)/d of the 2nd-order
                       central difference — use this when the spectral solve
                       must be *consistent with the finite-difference
                       operators* used elsewhere in the model.
    kind='laplacian5': modified wavenumber^2 of the 3-point second
                       difference, 2(1-cos(k d))/d^2 (returned as k^2).
    """
    k = 2.0 * np.pi * np.fft.fftfreq(n, d=d)
    if kind == "spectral":
        out = k
    elif kind == "central":
        out = np.sin(k * d) / d
    elif kind == "laplacian5":
        out = 2.0 * (1.0 - np.cos(k * d)) / (d * d)
    else:
        raise ValueError(kind)
    return out.astype(np.float32)


def fd_wavenumbers(n: int, d: float, kind: str = "central") -> jnp.ndarray:
    return jnp.asarray(_fd_wavenumbers_np(n, d, kind))


def helmholtz_solve(
    rhs: jnp.ndarray, dx: float, dy: float, alpha, beta=1.0,
    kind: str = "laplacian5",
) -> jnp.ndarray:
    """Solve (beta + alpha * Laplacian) phi = rhs on a periodic grid.

    With kind='laplacian5' the inverse is exact for the 5-point FD Laplacian
    (so spectral and stencil paths agree to rounding). beta=0, alpha=1 gives
    the Poisson solve; the k=0 mode is set to zero (gauge choice).
    """
    ny, nx = rhs.shape[-2:]
    kx2 = fd_wavenumbers(nx, dx, kind)[None, :]
    ky2 = fd_wavenumbers(ny, dy, kind)[:, None]
    if kind != "laplacian5":
        kx2, ky2 = kx2 * kx2, ky2 * ky2
    denom = beta - alpha * (kx2 + ky2)  # Laplacian symbol is -(kx2+ky2)
    rhs_hat = jnp.fft.fft2(rhs)
    if isinstance(beta, (int, float)) and beta == 0.0:
        # Poisson: zero-mean gauge — zero out the singular k=0 mode.
        denom = denom.at[0, 0].set(1.0)
        phi_hat = rhs_hat / denom
        phi_hat = phi_hat.at[..., 0, 0].set(0.0)
    else:
        phi_hat = rhs_hat / denom
    return jnp.real(jnp.fft.ifft2(phi_hat)).astype(rhs.dtype)


def poisson_solve(rhs: jnp.ndarray, dx: float, dy: float,
                  kind: str = "laplacian5") -> jnp.ndarray:
    """Solve Laplacian(phi) = rhs, periodic, zero-mean."""
    return helmholtz_solve(rhs, dx, dy, alpha=1.0, beta=0.0, kind=kind)
