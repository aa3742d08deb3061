"""MRI reconstruction: Cartesian k-space inverse FFT + simple
non-Cartesian gridding.

ref: MRIReconstructor (medical_imaging.hpp:696-787, k-space recon :711);
non-Cartesian FFT adapter op (gpu_adaptability.hpp:456-676 op list).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def reconstruct_kspace(kspace):
    """Cartesian: centered inverse 2-D FFT -> magnitude image."""
    k = jnp.asarray(kspace)
    # convention: k-space is centered (DC at the middle); ifftshift moves
    # DC to corner for the FFT, and the result is already in image coords
    img = jnp.fft.ifft2(jnp.fft.ifftshift(k, axes=(-2, -1)))
    return jnp.abs(img)


def grid_noncartesian(samples, coords, grid_size: int,
                      oversampling: float = 1.0):
    """Grid scattered k-space samples onto a Cartesian grid with bilinear
    weights + density compensation, then inverse FFT.

    samples: (M,) complex; coords: (M, 2) in [-0.5, 0.5) k-space units.
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
