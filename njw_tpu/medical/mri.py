"""MRI reconstruction: Cartesian/non-Cartesian, iterative, parallel
imaging, partial Fourier.

Covers (and out-implements) the reference MRIReconstructor surface
(ref: medical_imaging.hpp:696-787 — the reference DECLARES
FFT/IterativePrimalDual/CompressedSensing/DeepLearning recon methods,
acceleration_factor and sensitivity_maps, but ships no implementation;
its non-Cartesian FFT adapter op is gpu_adaptability.hpp:456-676 op #4):

* ``reconstruct_kspace``       — Cartesian inverse FFT.
* ``gridding_reconstruct``     — non-Cartesian Kaiser-Bessel gridding with
  Pipe-Menon density compensation and deapodization (a real convolution
  regridder, not nearest-bin).
* ``reconstruct_cg``           — CG-SENSE: conjugate-gradient solve of the
  normal equations for (optionally multi-coil, undersampled) Cartesian
  k-space. The hot ops are FFTs + elementwise masks — MXU/VPU-shaped,
  fixed iteration count inside one ``lax.fori_loop`` (jit-friendly).
* ``reconstruct_primal_dual``  — TV-regularized Chambolle-Pock (the
  reference's named default method, implemented for real).
* ``reconstruct_compressed_sensing`` — FISTA with orthogonal Haar-wavelet
  soft thresholding.
* ``reconstruct_partial_fourier`` — homodyne reconstruction.
* ``MRIReconstructor``         — class facade mirroring the reference's
  setters (method / num_iterations / acceleration_factor /
  sensitivity_maps).

TPU notes: gridding uses scatter-adds (setup-scale, M ~ 1e4-1e5 samples);
all iterative methods keep static shapes and static iteration counts so
XLA compiles one fused loop body.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def reconstruct_kspace(kspace):
    """Cartesian: centered inverse 2-D FFT -> magnitude image."""
    k = jnp.asarray(kspace)
    # convention: k-space is centered (DC at the middle); ifftshift moves
    # DC to corner for the FFT, and the result is already in image coords
    img = jnp.fft.ifft2(jnp.fft.ifftshift(k, axes=(-2, -1)))
    return jnp.abs(img)


def _ifft_c(k):
    """Centered unitary inverse FFT (complex output)."""
    return jnp.fft.ifft2(jnp.fft.ifftshift(k, axes=(-2, -1)),
                         norm="ortho")


def _fft_c(img):
    """Centered unitary forward FFT."""
    return jnp.fft.fftshift(jnp.fft.fft2(img, norm="ortho"),
                            axes=(-2, -1))


def grid_noncartesian(samples, coords, grid_size: int,
                      oversampling: float = 1.0):
    """Bilinear-gridded recon (fast path; kept for API compatibility).

    samples: (M,) complex; coords: (M, 2) in [-0.5, 0.5) k-space units.
    For quantitative work use :func:`gridding_reconstruct` (Kaiser-Bessel
    kernel + Pipe-Menon density compensation + deapodization).
    """
    samples = jnp.asarray(samples)
    coords = jnp.asarray(coords, jnp.float32)
    n = int(grid_size * oversampling)
    pos = (coords + 0.5) * (n - 1)
    p0 = jnp.floor(pos).astype(jnp.int32)
    frac = pos - p0

    grid = jnp.zeros((n, n), samples.dtype)
    weight = jnp.zeros((n, n), jnp.float32)
    for dy in (0, 1):
        for dx in (0, 1):
            w = (jnp.where(dy == 0, 1 - frac[:, 0], frac[:, 0])
                 * jnp.where(dx == 0, 1 - frac[:, 1], frac[:, 1]))
            yy = jnp.clip(p0[:, 0] + dy, 0, n - 1)
            xx = jnp.clip(p0[:, 1] + dx, 0, n - 1)
            grid = grid.at[yy, xx].add(samples * w)
            weight = weight.at[yy, xx].add(w)
    grid = grid / jnp.maximum(weight, 1e-6)
    img = reconstruct_kspace(grid)
    if n != grid_size:
        c = (n - grid_size) // 2
        img = img[c:c + grid_size, c:c + grid_size]
    return img


# ---------------------------------------------------------------------------
# Kaiser-Bessel convolution gridding (the standard NUFFT adjoint).
# ---------------------------------------------------------------------------

def _kb_beta(width: int, oversampling: float) -> float:
    """Beatty et al. (2005) optimal Kaiser-Bessel shape parameter."""
    w, os = float(width), float(oversampling)
    return float(np.pi * np.sqrt((w / os * (os - 0.5)) ** 2 - 0.8))


def _kb_kernel(r, width: int, beta: float):
    """Kaiser-Bessel kernel value at |r| (grid units), support |r|<=w/2."""
    x = jnp.clip(1.0 - (2.0 * r / width) ** 2, 0.0, None)
    val = jnp.i0(beta * jnp.sqrt(x))
    return jnp.where(jnp.abs(r) <= width / 2.0, val, 0.0) / jnp.i0(beta)


def _kb_apodization(n: int, width: int, beta: float) -> np.ndarray:
    """Image-space apodization of the KB kernel (1-D, length n): the
    analytic Fourier transform sinh(sqrt(b^2-(pi w u)^2))/sqrt(...)."""
    u = (np.arange(n) - n / 2) / n  # cycles/sample
    arg = beta ** 2 - (np.pi * width * u) ** 2
    s = np.sqrt(np.abs(arg))
    ap = np.where(arg > 0, np.sinh(s) / np.maximum(s, 1e-12), np.sinc(s / np.pi))
    return (ap / ap.max()).astype(np.float32)


@partial(jax.jit, static_argnames=("n", "width"))
def _kb_grid(samples, coords, weights, n: int, width: int, beta: float):
    """Scatter weighted samples onto an (n, n) grid with the KB kernel.
    coords in [-0.5, 0.5); returns complex (n, n)."""
    pos = (jnp.asarray(coords, jnp.float32) + 0.5) * n  # grid units
    base = jnp.floor(pos - width / 2.0 + 0.5).astype(jnp.int32)
    vals = jnp.asarray(samples) * jnp.asarray(weights)
    grid = jnp.zeros((n, n), jnp.complex64)
    for oy in range(width):
        yy = base[:, 0] + oy
        wy = _kb_kernel(yy.astype(jnp.float32) - pos[:, 0], width, beta)
        yc = jnp.mod(yy, n)
        for ox in range(width):
            xx = base[:, 1] + ox
            wx = _kb_kernel(xx.astype(jnp.float32) - pos[:, 1], width, beta)
            xc = jnp.mod(xx, n)
            grid = grid.at[yc, xc].add(vals * (wy * wx))
    return grid


@partial(jax.jit, static_argnames=("n", "width"))
def _kb_degrid(grid, coords, n: int, width: int, beta: float):
    """Gather (interpolate) grid values at scattered coords — the adjoint
    of _kb_grid. Returns (M,) complex."""
    pos = (jnp.asarray(coords, jnp.float32) + 0.5) * n
    base = jnp.floor(pos - width / 2.0 + 0.5).astype(jnp.int32)
    out = jnp.zeros(pos.shape[0], jnp.complex64)
    for oy in range(width):
        yy = base[:, 0] + oy
        wy = _kb_kernel(yy.astype(jnp.float32) - pos[:, 0], width, beta)
        yc = jnp.mod(yy, n)
        for ox in range(width):
            xx = base[:, 1] + ox
            wx = _kb_kernel(xx.astype(jnp.float32) - pos[:, 1], width, beta)
            xc = jnp.mod(xx, n)
            out = out + grid[yc, xc] * (wy * wx)
    return out


def pipe_menon_dcf(coords, grid_size: int, *, oversampling: float = 2.0,
                   width: int = 4, n_iterations: int = 10):
    """Pipe-Menon density compensation: iterate w <- w / (G^H G w) until
    the gridded point-spread of the weights is flat (Pipe & Menon, MRM
    1999). Returns (M,) float32 weights."""
    n = int(grid_size * oversampling)
    beta = _kb_beta(width, oversampling)
    m = np.shape(coords)[0]
    w = jnp.ones((m,), jnp.float32)

    def body(_, w):
        g = _kb_grid(w.astype(jnp.complex64), coords,
                     jnp.ones((m,), jnp.float32), n, width, beta)
        conv = jnp.real(_kb_degrid(g, coords, n, width, beta))
        return w / jnp.maximum(conv, 1e-8)

    return jax.lax.fori_loop(0, n_iterations, body, w)


def gridding_reconstruct(samples, coords, grid_size: int, *,
                         oversampling: float = 2.0, width: int = 4,
                         dcf=None):
    """Non-Cartesian recon: KB convolution gridding with density
    compensation and deapodization (ref non-Cartesian FFT adapter:
    gpu_adaptability.hpp:456-676 op #4 — declared there, real here).

    samples: (M,) complex; coords: (M, 2) in [-0.5, 0.5).
    dcf: optional (M,) density weights; Pipe-Menon computed if None.
    """
    n = int(grid_size * oversampling)
    beta = _kb_beta(width, oversampling)
    if dcf is None:
        dcf = pipe_menon_dcf(coords, grid_size, oversampling=oversampling,
                             width=width)
    grid = _kb_grid(jnp.asarray(samples, jnp.complex64), coords,
                    jnp.asarray(dcf, jnp.float32), n, width, beta)
    # centered IDFT (= fftshift . ifft . ifftshift): sample phases are
    # relative to the image CENTER (the physical MRI convention), so the
    # object lands centered and aligned with the apodization peak
    img = jnp.fft.fftshift(_ifft_c(grid), axes=(-2, -1))
    # deapodize (divide by the kernel's image-space transform)
    ap = _kb_apodization(n, width, beta)
    img = img / jnp.asarray(np.outer(ap, ap))
    # crop the oversampled FOV
    c = (n - grid_size) // 2
    img = img[c:c + grid_size, c:c + grid_size]
    scale = jnp.max(jnp.abs(img))
    return jnp.abs(img) / jnp.maximum(scale, 1e-12) * scale  # (gs, gs)


# ---------------------------------------------------------------------------
# CG-SENSE: iterative parallel-imaging recon on Cartesian k-space.
# ---------------------------------------------------------------------------

def _sense_forward(x, mask, sens):
    """A x: coil-wise FFT of sens-weighted image, undersampled by mask.
    x: (ny, nx) complex; sens: (C, ny, nx); mask: (ny, nx) in {0,1}."""
    return mask[None] * _fft_c(sens * x[None])


def _sense_adjoint(y, mask, sens):
    """A^H y: sum of conj(sens) * IFFT of masked coil k-space."""
    return jnp.sum(jnp.conj(sens) * _ifft_c(mask[None] * y), axis=0)


@partial(jax.jit, static_argnames=("num_iterations",))
def _cg_solve(rhs, mask, sens, lam, num_iterations: int):
    def normal_op(x):
        return _sense_adjoint(_sense_forward(x, mask, sens), mask, sens) \
            + lam * x

    def body(_, carry):
        x, r, p, rs = carry
        ap = normal_op(p)
        alpha = rs / jnp.maximum(jnp.real(jnp.vdot(p, ap)), 1e-20)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = jnp.real(jnp.vdot(r, r))
        p = r + (rs_new / jnp.maximum(rs, 1e-20)) * p
        return x, r, p, rs_new

    x0 = jnp.zeros_like(rhs)
    carry = (x0, rhs, rhs, jnp.real(jnp.vdot(rhs, rhs)))
    x, *_ = jax.lax.fori_loop(0, num_iterations, body, carry)
    return x


def reconstruct_cg(kspace, mask=None, sensitivity_maps=None, *,
                   num_iterations: int = 10, lam: float = 0.0):
    """CG-SENSE reconstruction (Pruessmann et al. 2001).

    kspace: (ny, nx) or (C, ny, nx) complex, centered, zeros at unsampled
    locations. mask: (ny, nx) sampling mask (inferred from nonzeros if
    None). sensitivity_maps: (C, ny, nx) complex (uniform single-coil if
    None). Solves (A^H A + lam I) x = A^H y by CG — the FFT-only loop body
    is the TPU-shaped formulation of the reference's declared
    IterativePrimalDual/parallel-imaging surface
    (ref: medical_imaging.hpp:744-768 acceleration/sensitivity setters).
    """
    y = jnp.asarray(kspace, jnp.complex64)
    if y.ndim == 2:
        y = y[None]
    c, ny, nx = y.shape
    if mask is None:
        mask = (jnp.abs(y).sum(axis=0) > 0).astype(jnp.float32)
    else:
        mask = jnp.asarray(mask, jnp.float32)
    if sensitivity_maps is None:
        sens = jnp.ones((c, ny, nx), jnp.complex64) / np.sqrt(c)
    else:
        sens = jnp.asarray(sensitivity_maps, jnp.complex64)
    rhs = _sense_adjoint(y, mask, sens)
    x = _cg_solve(rhs, mask, sens, jnp.float32(lam), num_iterations)
    return jnp.abs(x)


# ---------------------------------------------------------------------------
# TV-regularized primal-dual (Chambolle-Pock) — the reference's named
# default ReconstructionMethod::IterativePrimalDual, implemented for real.
# ---------------------------------------------------------------------------

def _grad2d(x):
    gx = jnp.roll(x, -1, axis=-1) - x
    gy = jnp.roll(x, -1, axis=-2) - x
    return jnp.stack([gy, gx])


def _div2d(g):
    gy, gx = g[0], g[1]
    return (gy - jnp.roll(gy, 1, axis=-2)) + (gx - jnp.roll(gx, 1, axis=-1))


@partial(jax.jit, static_argnames=("num_iterations",))
def _pd_solve(y, mask, weight, num_iterations: int):
    tau = jnp.float32(0.25)
    sigma = jnp.float32(0.5)

    def body(_, carry):
        x, xbar, p, q = carry
        # dual ascent: TV dual p (pointwise projection), data dual q
        g = _grad2d(xbar)
        p = p + sigma * g
        pn = jnp.sqrt(jnp.sum(jnp.abs(p) ** 2, axis=0, keepdims=True))
        p = p / jnp.maximum(1.0, pn / weight)
        q = (q + sigma * (mask * _fft_c(xbar) - y)) / (1.0 + sigma)
        # primal descent
        x_new = x + tau * _div2d(p) - tau * _ifft_c(mask * q)
        xbar = 2.0 * x_new - x
        return x_new, xbar, p, q

    x0 = _ifft_c(y)
    carry = (x0, x0, jnp.zeros((2,) + y.shape, x0.dtype),
             jnp.zeros_like(y))
    x, *_ = jax.lax.fori_loop(0, num_iterations, body, carry)
    return x


def reconstruct_primal_dual(kspace, mask=None, *, num_iterations: int = 50,
                            tv_weight: float = 0.05):
    """TV-regularized recon via Chambolle-Pock: min_x ||M F x - y||^2/2 +
    w TV(x) (ref declares the method name at medical_imaging.hpp:54-59 and
    never implements it)."""
    y = jnp.asarray(kspace, jnp.complex64)
    if mask is None:
        mask = (jnp.abs(y) > 0).astype(jnp.float32)
    else:
        mask = jnp.asarray(mask, jnp.float32)
    x = _pd_solve(y, mask, jnp.float32(tv_weight), num_iterations)
    return jnp.abs(x)


# ---------------------------------------------------------------------------
# Compressed sensing: FISTA with orthogonal Haar-wavelet soft threshold.
# ---------------------------------------------------------------------------

def _haar2_fwd(x, levels: int):
    coeffs = []
    a = x
    for _ in range(levels):
        # rows
        lo = (a[..., ::2] + a[..., 1::2]) / jnp.sqrt(2.0)
        hi = (a[..., ::2] - a[..., 1::2]) / jnp.sqrt(2.0)
        # cols
        ll = (lo[..., ::2, :] + lo[..., 1::2, :]) / jnp.sqrt(2.0)
        lh = (lo[..., ::2, :] - lo[..., 1::2, :]) / jnp.sqrt(2.0)
        hl = (hi[..., ::2, :] + hi[..., 1::2, :]) / jnp.sqrt(2.0)
        hh = (hi[..., ::2, :] - hi[..., 1::2, :]) / jnp.sqrt(2.0)
        coeffs.append((lh, hl, hh))
        a = ll
    return a, coeffs


def _haar2_inv(a, coeffs):
    for lh, hl, hh in reversed(coeffs):
        ll = a
        lo_e = (ll + lh) / jnp.sqrt(2.0)   # rows of lo at even cols
        lo_o = (ll - lh) / jnp.sqrt(2.0)
        hi_e = (hl + hh) / jnp.sqrt(2.0)
        hi_o = (hl - hh) / jnp.sqrt(2.0)
        ny, nx = ll.shape[-2] * 2, ll.shape[-1]
        lo = jnp.zeros(ll.shape[:-2] + (ny, nx), ll.dtype)
        lo = lo.at[..., ::2, :].set(lo_e).at[..., 1::2, :].set(lo_o)
        hi = jnp.zeros_like(lo)
        hi = hi.at[..., ::2, :].set(hi_e).at[..., 1::2, :].set(hi_o)
        a_e = (lo + hi) / jnp.sqrt(2.0)
        a_o = (lo - hi) / jnp.sqrt(2.0)
        a = jnp.zeros(lo.shape[:-1] + (nx * 2,), ll.dtype)
        a = a.at[..., ::2].set(a_e).at[..., 1::2].set(a_o)
    return a


def _soft(z, t):
    mag = jnp.abs(z)
    return z * jnp.maximum(mag - t, 0.0) / jnp.maximum(mag, 1e-12)


@partial(jax.jit, static_argnames=("num_iterations", "levels"))
def _fista_solve(y, mask, lam, num_iterations: int, levels: int):
    def prox(x, t):
        a, cs = _haar2_fwd(x, levels)
        cs = [tuple(_soft(c, t) for c in band) for band in cs]
        return _haar2_inv(a, cs)   # approx band left unthresholded

    def grad(x):
        return _ifft_c(mask * (mask * _fft_c(x) - y))

    def body(_, carry):
        x, z, t = carry
        x_new = prox(z - grad(z), lam)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        z = x_new + ((t - 1.0) / t_new) * (x_new - x)
        return x_new, z, t_new

    x0 = _ifft_c(y)
    x, *_ = jax.lax.fori_loop(0, num_iterations, body,
                              (x0, x0, jnp.float32(1.0)))
    return x


def reconstruct_compressed_sensing(kspace, mask=None, *,
                                   num_iterations: int = 30,
                                   lam: float = 0.02, levels: int = 3):
    """CS recon: FISTA on min ||M F x - y||^2/2 + lam ||W x||_1 with an
    orthogonal Haar wavelet W (ref name: medical_imaging.hpp:56)."""
    y = jnp.asarray(kspace, jnp.complex64)
    if mask is None:
        mask = (jnp.abs(y) > 0).astype(jnp.float32)
    else:
        mask = jnp.asarray(mask, jnp.float32)
    n = y.shape[-1]
    levels = min(levels, int(np.log2(n)) - 2)
    x = _fista_solve(y, mask, jnp.float32(lam), num_iterations, levels)
    return jnp.abs(x)


# ---------------------------------------------------------------------------
# Partial Fourier: homodyne reconstruction.
# ---------------------------------------------------------------------------

def reconstruct_partial_fourier(kspace, fraction: float, *,
                                transition: int = 8):
    """Homodyne recon of partial-Fourier k-space (fraction in (0.5, 1]):
    the un-acquired high ky rows are synthesized from conjugate symmetry
    after low-resolution phase correction (Noll et al. 1991).

    kspace: (ny, nx) centered; rows ky >= fraction*ny assumed unacquired
    (zero). Returns the real-part magnitude image.
    """
    y = jnp.asarray(kspace, jnp.complex64)
    ny = y.shape[-2]
    n_acq = int(round(fraction * ny))
    center = ny // 2
    k0 = n_acq - 1 - center     # symmetric half-width beyond DC

    ky = jnp.arange(ny, dtype=jnp.float32)[:, None] - center
    # low-pass window for the phase estimate: the symmetric band |ky|<=k0
    lp = (jnp.abs(ky) <= k0).astype(jnp.float32)
    lp = lp * (0.54 + 0.46 * jnp.cos(np.pi * ky / max(k0, 1)))  # Hamming
    # homodyne pre-weighting: ramp from 2 (rows whose conjugate partner is
    # missing) through 1 at DC to 0 at the acquisition edge, so
    # W(ky) + W(-ky) = 2 across the symmetric band
    w = jnp.clip(1.0 - ky / max(k0, 1), 0.0, 2.0)
    w = jnp.where(ky + center >= n_acq, 0.0, w)

    phase_img = _ifft_c(y * lp)
    phase = jnp.exp(-1j * jnp.angle(phase_img))
    img = _ifft_c(y * w)
    return jnp.abs(jnp.real(img * phase))


# ---------------------------------------------------------------------------
# Facade mirroring the reference class surface.
# ---------------------------------------------------------------------------

class MRIReconstructor:
    """Mirror of the reference class (ref: medical_imaging.hpp:696-787):
    setMethod/setNumIterations/setAccelerationFactor/setSensitivityMaps ->
    plain attributes; process(kspace) dispatches to the jitted recon
    functions above."""

    METHODS = ("fft", "cg_sense", "iterative_primal_dual",
               "compressed_sensing", "partial_fourier")

    def __init__(self, method: str = "iterative_primal_dual",
                 num_iterations: int = 10, acceleration_factor: int = 1,
                 sensitivity_maps=None):
        self.method = method
        self.num_iterations = num_iterations
        self.acceleration_factor = acceleration_factor
        self.sensitivity_maps = sensitivity_maps

    def undersampling_mask(self, ny: int, nx: int, *,
                           center_fraction: float = 0.08):
        """Equispaced ky undersampling at the configured acceleration
        factor, keeping a fully sampled center band."""
        r = max(int(self.acceleration_factor), 1)
        mask = np.zeros((ny, nx), np.float32)
        mask[::r, :] = 1.0
        c = int(ny * center_fraction / 2)
        mask[ny // 2 - c:ny // 2 + c, :] = 1.0
        return jnp.asarray(mask)

    def process(self, kspace, mask=None, **kw):
        m = self.method
        if m == "fft":
            return reconstruct_kspace(kspace)
        if m == "cg_sense":
            return reconstruct_cg(
                kspace, mask, self.sensitivity_maps,
                num_iterations=self.num_iterations, **kw)
        if m == "iterative_primal_dual":
            return reconstruct_primal_dual(
                kspace, mask, num_iterations=max(self.num_iterations, 30),
                **kw)
        if m == "compressed_sensing":
            return reconstruct_compressed_sensing(
                kspace, mask, num_iterations=max(self.num_iterations, 20),
                **kw)
        if m == "partial_fourier":
            return reconstruct_partial_fourier(kspace, **kw)
        if m == "deep_learning":
            raise NotImplementedError(
                "deep-learning recon needs trained weights; the reference "
                "declares the name (medical_imaging.hpp:58) but ships no "
                "model either — use cg_sense / iterative_primal_dual")
        raise ValueError(f"unknown method {m!r}; available: {self.METHODS}")
