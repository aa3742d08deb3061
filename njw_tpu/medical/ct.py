"""CT reconstruction: Radon transform, filtered backprojection, SIRT.

ref kernels: ramp filter x4 SM variants (ct_reconstruction_kernels.cu:56-230),
backprojection x4 (:275-491), forward projection (:561), SIRT update (:652).
Here: ONE implementation each — ramp filtering as a batched rfft over all
projections at once, and projection/backprojection as vmap-over-angles of
bilinear interpolation gathers.

Geometry: parallel-beam; image is (N, N) with the rotation axis at the
center; detector has N bins with unit spacing; `angles` in radians.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear(img, yy, xx):
    """Bilinear sample img at float coords (yy, xx); zero outside."""
    h, w = img.shape
    y0 = jnp.floor(yy)
    x0 = jnp.floor(xx)
    dy = yy - y0
    dx = xx - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    def at(yi, xi):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(inside, v, 0.0)

    return ((1 - dy) * (1 - dx) * at(y0, x0)
            + (1 - dy) * dx * at(y0, x0 + 1)
            + dy * (1 - dx) * at(y0 + 1, x0)
            + dy * dx * at(y0 + 1, x0 + 1))


@partial(jax.jit, static_argnames=("n_detectors",))
def radon(image, angles, n_detectors: int = 0):
    """Forward projection (ref: forward-projection kernel :561).

    Returns sinogram (n_angles, n_detectors)."""
    image = jnp.asarray(image, jnp.float32)
    n = image.shape[0]
    nd = n_detectors or n
    c = (n - 1) / 2.0
    t = jnp.arange(nd, dtype=jnp.float32) - (nd - 1) / 2.0   # detector coord
    s = jnp.arange(n, dtype=jnp.float32) - c                 # along-ray coord

    def project(theta):
        ct, st = jnp.cos(theta), jnp.sin(theta)
        # ray: x = t*ct - s*st, y = t*st + s*ct (rotated grid)
        xx = t[:, None] * ct - s[None, :] * st + c
        yy = t[:, None] * st + s[None, :] * ct + c
        return jnp.sum(_bilinear(image, yy, xx), axis=1)

    return jax.vmap(project)(jnp.asarray(angles, jnp.float32))


def _ramp_filter(nd: int, kind: str = "ramlak"):
    """Frequency-domain ramp filter |f| with optional apodization
    (ref ramp-filter kernels :56-230; the TODO'd coefficient generation at
    gpu_adaptability.cpp:1280 is implemented here)."""
    f = jnp.fft.rfftfreq(2 * nd)  # zero-padded length
    ramp = 2.0 * f
    if kind == "ramlak":
        win = jnp.ones_like(ramp)
    elif kind == "shepp_logan":
        x = f / jnp.maximum(f[-1], 1e-9)
        win = jnp.sinc(x / 2.0)
    elif kind == "cosine":
        win = jnp.cos(jnp.pi * f / jnp.maximum(2 * f[-1], 1e-9))
    elif kind == "hann":
        win = 0.5 * (1 + jnp.cos(jnp.pi * f / jnp.maximum(f[-1], 1e-9)))
    else:
        raise ValueError(f"unknown filter kind {kind!r}")
    return ramp * win


@partial(jax.jit, static_argnames=("output_size", "filter_kind"))
def filtered_backprojection(sinogram, angles, output_size: int = 0,
                            filter_kind: str = "ramlak"):
    """FBP (ref: CTReconstructor::reconstruct, medical_imaging.hpp:625;
    HighEndGPUAdapter::executeFilteredBackProjection,
    gpu_adaptability.cpp:1257)."""
    sino = jnp.asarray(sinogram, jnp.float32)
    n_angles, nd = sino.shape
    n = output_size or nd
    # --- ramp filter all projections in one batched rfft ---
    H = _ramp_filter(nd, filter_kind)
    spec = jnp.fft.rfft(sino, n=2 * nd, axis=-1)
    filtered = jnp.fft.irfft(spec * H, n=2 * nd, axis=-1)[:, :nd]

    # --- backproject (vmap over angles, bilinear in detector coord) ---
    c = (n - 1) / 2.0
    cd = (nd - 1) / 2.0
    ys = jnp.arange(n, dtype=jnp.float32) - c
    xs = jnp.arange(n, dtype=jnp.float32) - c

    def backproject(theta, proj):
        ct, st = jnp.cos(theta), jnp.sin(theta)
        t = xs[None, :] * ct + ys[:, None] * st + cd
        t0 = jnp.floor(t).astype(jnp.int32)
        dt = t - t0
        inside = (t0 >= 0) & (t0 < nd - 1)
        p0 = proj[jnp.clip(t0, 0, nd - 1)]
        p1 = proj[jnp.clip(t0 + 1, 0, nd - 1)]
        return jnp.where(inside, (1 - dt) * p0 + dt * p1, 0.0)

    acc = jnp.sum(jax.vmap(backproject)(jnp.asarray(angles, jnp.float32),
                                        filtered), axis=0)
    return acc * (jnp.pi / (2.0 * n_angles))


@partial(jax.jit, static_argnames=("n_iterations", "output_size"))
def sirt(sinogram, angles, n_iterations: int = 20, output_size: int = 0,
         relaxation: float = 1.0):
    """Simultaneous Iterative Reconstruction Technique
    (ref: SIRT update kernel :652): x <- x + lam * A^T (b - A x) / norm."""
    sino = jnp.asarray(sinogram, jnp.float32)
    n_angles, nd = sino.shape
    n = output_size or nd
    angles = jnp.asarray(angles, jnp.float32)

    ones_img = jnp.ones((n, n), jnp.float32)
    row_sums = radon(ones_img, angles, n_detectors=nd)          # A 1
    col_sums = _backproject_plain(jnp.ones_like(sino), angles, n)  # A^T 1

    def body(_, x):
        # x <- x + lam * C A^T R (b - A x), C = 1/colsum, R = 1/rowsum
        resid = sino - radon(x, angles, n_detectors=nd)
        resid = resid / jnp.maximum(row_sums, 1e-6)
        corr = _backproject_plain(resid, angles, n)
        return x + relaxation * corr / jnp.maximum(col_sums, 1e-6)

    x0 = jnp.zeros((n, n), jnp.float32)
    return jax.lax.fori_loop(0, n_iterations, body, x0)


def _backproject_plain(sino, angles, n):
    nd = sino.shape[-1]
    c = (n - 1) / 2.0
    cd = (nd - 1) / 2.0
    ys = jnp.arange(n, dtype=jnp.float32) - c
    xs = jnp.arange(n, dtype=jnp.float32) - c

    def one(theta, proj):
        ct, st = jnp.cos(theta), jnp.sin(theta)
        t = xs[None, :] * ct + ys[:, None] * st + cd
        t0 = jnp.floor(t).astype(jnp.int32)
        dt = t - t0
        inside = (t0 >= 0) & (t0 < nd - 1)
        p0 = proj[jnp.clip(t0, 0, nd - 1)]
        p1 = proj[jnp.clip(t0 + 1, 0, nd - 1)]
        return jnp.where(inside, (1 - dt) * p0 + dt * p1, 0.0)

    return jnp.sum(jax.vmap(one)(angles, sino), axis=0)


# ---------------------------------------------------------------------------
# Cone-beam CT (circular trajectory) — FDK reconstruction.
# The reference's ReconstructionMethod covers parallel-beam only
# (ct_reconstruction_kernels.cu geometries); cone-beam is the production
# scanner geometry. Forward projection = vmapped trilinear ray sampling;
# FDK = cosine weighting + row-wise ramp filtering (shared _ramp_filter)
# + distance-weighted backprojection.
# Geometry: volume (N, N, N) as (z, y, x), rotation axis = z through the
# center; flat detector (nv, nu) with unit pixel pitch at distance `sdd`
# from the source; source orbit radius `sod`.
# ---------------------------------------------------------------------------


def _trilinear(vol, zz, yy, xx):
    nz, ny, nx = vol.shape
    z0, y0, x0 = (jnp.floor(c) for c in (zz, yy, xx))
    dz, dy, dx = zz - z0, yy - y0, xx - x0
    z0, y0, x0 = (c.astype(jnp.int32) for c in (z0, y0, x0))

    def at(zi, yi, xi):
        inside = ((zi >= 0) & (zi < nz) & (yi >= 0) & (yi < ny)
                  & (xi >= 0) & (xi < nx))
        return jnp.where(
            inside,
            vol[jnp.clip(zi, 0, nz - 1), jnp.clip(yi, 0, ny - 1),
                jnp.clip(xi, 0, nx - 1)], 0.0)

    return ((1 - dz) * ((1 - dy) * ((1 - dx) * at(z0, y0, x0)
                                    + dx * at(z0, y0, x0 + 1))
                        + dy * ((1 - dx) * at(z0, y0 + 1, x0)
                                + dx * at(z0, y0 + 1, x0 + 1)))
            + dz * ((1 - dy) * ((1 - dx) * at(z0 + 1, y0, x0)
                                + dx * at(z0 + 1, y0, x0 + 1))
                    + dy * ((1 - dx) * at(z0 + 1, y0 + 1, x0)
                            + dx * at(z0 + 1, y0 + 1, x0 + 1))))


@partial(jax.jit, static_argnames=("det_shape", "n_samples"))
def cone_beam_project(volume, angles, *, sod: float, sdd: float,
                      det_shape=(64, 64), n_samples: int = 0):
    """(A, nv, nu) cone-beam projections of a (N,N,N) volume."""
    vol = jnp.asarray(volume, jnp.float32)
    n = vol.shape[-1]
    nv, nu = det_shape
    n_samples = n_samples or int(1.5 * n)
    c = (n - 1) / 2.0
    u = jnp.arange(nu, dtype=jnp.float32) - (nu - 1) / 2.0
    v = jnp.arange(nv, dtype=jnp.float32) - (nv - 1) / 2.0
    uu, vv = jnp.meshgrid(u, v)                     # (nv, nu)
    t = jnp.linspace(0.0, 1.0, n_samples)           # along source->detector

    def project(theta):
        ct, st = jnp.cos(theta), jnp.sin(theta)
        src = jnp.asarray([sod * ct, sod * st, 0.0])
        # detector center sits at (sod - sdd) along the source direction
        det_c = jnp.asarray([(sod - sdd) * ct, (sod - sdd) * st, 0.0])
        eu = jnp.asarray([-st, ct, 0.0])            # detector u axis
        ev = jnp.asarray([0.0, 0.0, 1.0])           # detector v axis
        det = (det_c[:, None, None] + eu[:, None, None] * uu
               + ev[:, None, None] * vv)            # (3, nv, nu)
        ray = det - src[:, None, None]
        pts = src[:, None, None, None] + ray[:, None] * t[:, None, None]
        # world (x, y, z) -> voxel indices (z, y, x)
        xs = pts[0] + c
        ys = pts[1] + c
        zs = pts[2] + c
        samples = _trilinear(vol, zs, ys, xs)       # (T, nv, nu)
        seg = jnp.sqrt(jnp.sum(ray * ray, axis=0)) / (n_samples - 1)
        return jnp.sum(samples, axis=0) * seg

    return jax.vmap(project)(jnp.asarray(angles, jnp.float32))


@partial(jax.jit, static_argnames=("output_size", "filter_kind"))
def fdk_reconstruct(projections, angles, *, sod: float, sdd: float,
                    output_size: int = 0, filter_kind: str = "ramlak"):
    """Feldkamp-Davis-Kress cone-beam reconstruction -> (N, N, N)."""
    g = jnp.asarray(projections, jnp.float32)      # (A, nv, nu)
    na, nv, nu = g.shape
    n = output_size or nu
    u = jnp.arange(nu, dtype=jnp.float32) - (nu - 1) / 2.0
    v = jnp.arange(nv, dtype=jnp.float32) - (nv - 1) / 2.0

    # 1. cosine weighting
    w = sdd / jnp.sqrt(sdd ** 2 + u[None, :] ** 2 + v[:, None] ** 2)
    gw = g * w[None]

    # 2. row-wise ramp filtering (along u; _ramp_filter zero-pads to 2*nu)
    filt = _ramp_filter(nu, filter_kind)
    G = jnp.fft.rfft(gw, n=2 * nu, axis=-1)
    gf = jnp.fft.irfft(G * filt[None, None, :], n=2 * nu,
                       axis=-1)[..., :nu]

    # 3. weighted backprojection
    c = (n - 1) / 2.0
    zz, yy, xx = jnp.mgrid[0:n, 0:n, 0:n].astype(jnp.float32) - c

    def backproject(theta, proj):
        ct, st = jnp.cos(theta), jnp.sin(theta)
        # distance from source plane: U = sod - (x ct + y st) ... source at
        # +sod along (ct, st); voxel projection uses similar triangles
        U = sod - (xx * ct + yy * st)
        uu = sdd * (-xx * st + yy * ct) / U
        vv = sdd * zz / U
        val = _bilinear_2d_batch(proj, vv + (nv - 1) / 2.0,
                                 uu + (nu - 1) / 2.0)
        return val * (sod / U) ** 2

    vols = jax.vmap(backproject)(jnp.asarray(angles, jnp.float32), gf)
    return jnp.sum(vols, axis=0) * (jnp.pi / na)


def _bilinear_2d_batch(img, yy, xx):
    """Bilinear sample a 2-D image at arbitrary-shaped float coords."""
    shp = yy.shape
    out = _bilinear(img, yy.reshape(-1), xx.reshape(-1))
    return out.reshape(shp)
