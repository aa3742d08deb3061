"""Segmentation: thresholding (fixed/Otsu/adaptive), region growing,
watershed, Chan-Vese level set, MRF (graph-cut-class) labeling.

ref kernels: thresholding x4 (segmentation_kernels.cu:55-175), watershed
init/flood (:223-276), level-set update (:356), graph-cut (:448-578).
Iterative methods run a fixed number of data-parallel sweeps under
lax.fori_loop — the XLA-friendly equivalent of the reference's iterate-
until-converged GPU flood loops.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def threshold(image, value: float, high=1.0, low=0.0):
    """Binary threshold (ref: thresholding kernels :55-175)."""
    img = jnp.asarray(image)
    return jnp.where(img >= value, high, low)


def otsu_threshold(image, n_bins: int = 256) -> float:
    """Otsu's method: maximize between-class variance over the histogram."""
    a = np.asarray(image, np.float64).ravel()
    lo, hi = a.min(), a.max()
    if hi <= lo:
        return float(lo)
    hist, edges = np.histogram(a, bins=n_bins, range=(lo, hi))
    p = hist / hist.sum()
    centers = 0.5 * (edges[:-1] + edges[1:])
    w0 = np.cumsum(p)
    mu = np.cumsum(p * centers)
    mu_t = mu[-1]
    w1 = 1.0 - w0
    valid = (w0 > 0) & (w1 > 0)
    sigma_b = np.zeros(n_bins)
    sigma_b[valid] = ((mu_t * w0 - mu)[valid] ** 2) / (w0 * w1)[valid]
    # bimodal histograms give a plateau of equally optimal thresholds
    # between the modes; take its midpoint, not the first bin
    best = np.flatnonzero(sigma_b >= sigma_b.max() - 1e-12)
    return float(centers[int(best.mean())])


@partial(jax.jit, static_argnames=("n_iterations",))
def adaptive_threshold(image, block_sigma: float = 5.0, offset: float = 0.0,
                       n_iterations: int = 0):
    """Adaptive: pixel vs local gaussian mean."""
    from njw_tpu.medical.filters import gaussian_filter

    img = jnp.asarray(image, jnp.float32)
    local_mean = gaussian_filter(img, block_sigma)
    return jnp.where(img >= local_mean + offset, 1.0, 0.0)


@partial(jax.jit, static_argnames=("n_iterations",))
def region_growing(image, seed_yx, tolerance: float = 0.1,
                   n_iterations: int = 256):
    """Grow a region from a seed by iterated masked dilation
    (ref: region-growing adapter op, gpu_adaptability.hpp op list).
    Criterion: |pixel - seed value| <= tolerance."""
    img = jnp.asarray(image, jnp.float32)
    sy, sx = seed_yx
    seed_val = img[sy, sx]
    eligible = jnp.abs(img - seed_val) <= tolerance
    region = jnp.zeros_like(img, dtype=bool).at[sy, sx].set(True)

    def dilate(r):
        up = jnp.roll(r, -1, 0).at[-1, :].set(False)
        dn = jnp.roll(r, 1, 0).at[0, :].set(False)
        lf = jnp.roll(r, -1, 1).at[:, -1].set(False)
        rt = jnp.roll(r, 1, 1).at[:, 0].set(False)
        return r | up | dn | lf | rt

    def body(_, r):
        return dilate(r) & eligible

    region = jax.lax.fori_loop(0, n_iterations, body, region)
    return region.astype(jnp.float32)


@partial(jax.jit, static_argnames=("n_iterations",))
def watershed(image, markers, n_iterations: int = 256):
    """Marker-based watershed by gradient-ascent flooding: each unlabeled
    pixel takes the label of its lowest-valued labeled neighbor, sweeping
    until (fixed-iteration) convergence (ref: watershed init/flood kernels
    :223-276). markers: int array, 0 = unlabeled."""
    img = jnp.asarray(image, jnp.float32)
    labels = jnp.asarray(markers, jnp.int32)
    big = jnp.float32(3.4e38)

    def neighbors(arr, fill):
        up = jnp.roll(arr, -1, 0).at[-1, :].set(fill)
        dn = jnp.roll(arr, 1, 0).at[0, :].set(fill)
        lf = jnp.roll(arr, -1, 1).at[:, -1].set(fill)
        rt = jnp.roll(arr, 1, 1).at[:, 0].set(fill)
        return jnp.stack([up, dn, lf, rt])

    def body(_, labels):
        nl = neighbors(labels, 0)
        # neighbor elevations; unlabeled neighbors are infinitely high
        ne = neighbors(img, big)
        ne = jnp.where(nl > 0, ne, big)
        best = jnp.argmin(ne, axis=0)
        best_label = jnp.take_along_axis(nl, best[None], axis=0)[0]
        has_labeled_nb = jnp.min(ne, axis=0) < big
        return jnp.where((labels == 0) & has_labeled_nb, best_label, labels)

    return jax.lax.fori_loop(0, n_iterations, body, labels)


@partial(jax.jit, static_argnames=("n_iterations",))
def chan_vese(image, n_iterations: int = 100, mu: float = 0.2,
              dt: float = 0.5):
    """Chan-Vese active contour via level-set evolution
    (ref: level-set update kernel :356). Returns binary mask."""
    img = jnp.asarray(image, jnp.float32)
    img = (img - img.min()) / jnp.maximum(img.max() - img.min(), 1e-9)
    h, w = img.shape
    yy, xx = jnp.mgrid[0:h, 0:w]
    # checkerboard initialization
    phi = jnp.sin(yy * jnp.pi / 5.0) * jnp.sin(xx * jnp.pi / 5.0)

    def curvature(p):
        py = (jnp.roll(p, -1, 0) - jnp.roll(p, 1, 0)) / 2
        px = (jnp.roll(p, -1, 1) - jnp.roll(p, 1, 1)) / 2
        pyy = jnp.roll(p, -1, 0) - 2 * p + jnp.roll(p, 1, 0)
        pxx = jnp.roll(p, -1, 1) - 2 * p + jnp.roll(p, 1, 1)
        pxy = (jnp.roll(jnp.roll(p, -1, 0), -1, 1)
               - jnp.roll(jnp.roll(p, -1, 0), 1, 1)
               - jnp.roll(jnp.roll(p, 1, 0), -1, 1)
               + jnp.roll(jnp.roll(p, 1, 0), 1, 1)) / 4
        denom = (px ** 2 + py ** 2) ** 1.5 + 1e-8
        return (pxx * py ** 2 - 2 * px * py * pxy + pyy * px ** 2) / denom

    def body(_, phi):
        inside = phi > 0
        c1 = jnp.sum(jnp.where(inside, img, 0)) / jnp.maximum(
            jnp.sum(inside), 1)
        c2 = jnp.sum(jnp.where(~inside, img, 0)) / jnp.maximum(
            jnp.sum(~inside), 1)
        force = -(img - c1) ** 2 + (img - c2) ** 2 + mu * curvature(phi)
        # smoothed delta restricts the update near the front
        delta = 1.0 / (1.0 + phi ** 2)
        return phi + dt * delta * force

    phi = jax.lax.fori_loop(0, n_iterations, body, phi)
    return (phi > 0).astype(jnp.float32)


@partial(jax.jit, static_argnames=("n_iterations",))
def mrf_segment(image, threshold_value: float, beta: float = 1.0,
                n_iterations: int = 20):
    """Binary MRF labeling minimized with iterated conditional modes —
    the energy family the reference's graph-cut kernels target
    (ref: graph-cut + finalize kernels :448-578); ICM is the
    data-parallel-friendly minimizer. Data term: (I - mu_label)^2;
    smoothness: beta * #disagreeing neighbors."""
    img = jnp.asarray(image, jnp.float32)
    labels = (img >= threshold_value).astype(jnp.float32)

    def body(_, labels):
        mu1 = jnp.sum(img * labels) / jnp.maximum(jnp.sum(labels), 1)
        mu0 = jnp.sum(img * (1 - labels)) / jnp.maximum(
            jnp.sum(1 - labels), 1)
        nb_sum = (jnp.roll(labels, 1, 0) + jnp.roll(labels, -1, 0)
                  + jnp.roll(labels, 1, 1) + jnp.roll(labels, -1, 1))
        e1 = (img - mu1) ** 2 + beta * (4 - nb_sum)
        e0 = (img - mu0) ** 2 + beta * nb_sum
        return (e1 < e0).astype(jnp.float32)

    return jax.lax.fori_loop(0, n_iterations, body, labels)


_METHODS = {
    "threshold": lambda img, value=None, **kw: threshold(
        img, otsu_threshold(img) if value is None else value, **kw),
    "otsu": lambda img, **kw: threshold(img, otsu_threshold(img)),
    "adaptive": adaptive_threshold,
    "region_growing": region_growing,
    "watershed": watershed,
    "level_set": chan_vese,
    "chan_vese": chan_vese,
    "graph_cut": lambda img, **kw: mrf_segment(
        img, kw.pop("threshold_value", otsu_threshold(img)), **kw),
    "mrf": lambda img, **kw: mrf_segment(
        img, kw.pop("threshold_value", otsu_threshold(img)), **kw),
}


def apply_segmentation(image, method: str = "otsu", **kw):
    """ref: python/medical_imaging/__init__.py apply_segmentation."""
    data = image.data if hasattr(image, "modality") else image
    try:
        return _METHODS[method](data, **kw)
    except KeyError:
        raise ValueError(
            f"unknown segmentation {method!r}; available: {sorted(_METHODS)}"
        ) from None
