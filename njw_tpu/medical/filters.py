"""Image filters: 2-D convolution, gaussian, median, bilateral,
non-local means.

ref kernels: 2-D convolution x4 SM variants
(image_processing_kernels.cu:51-308), median (:360), bilateral (:464),
non-local means (:574). One XLA implementation each; convolutions go
through lax.conv (MXU), the window-rank filters build shifted stacks.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def convolve2d(image, kernel):
    """'same' 2-D convolution (ref: convolution kernels :51-308)."""
    img = jnp.asarray(image, jnp.float32)
    ker = jnp.asarray(kernel, jnp.float32)
    kh, kw = ker.shape
    out = jax.lax.conv_general_dilated(
        img[None, None], ker[::-1, ::-1][None, None],
        window_strides=(1, 1),
        padding=[(kh // 2, (kh - 1) // 2), (kw // 2, (kw - 1) // 2)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[0, 0]


def gaussian_kernel(sigma: float, radius: int = 0) -> np.ndarray:
    r = radius or max(1, int(3 * sigma))
    x = np.arange(-r, r + 1)
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    k = np.outer(g, g)
    return (k / k.sum()).astype(np.float32)


def gaussian_filter(image, sigma: float = 1.0):
    return convolve2d(image, gaussian_kernel(sigma))


def _shifted_stack(img, radius: int):
    """(K, H, W) stack of all window-shifted copies (edge-clamped)."""
    shifts = [(dy, dx) for dy in range(-radius, radius + 1)
              for dx in range(-radius, radius + 1)]
    pad = jnp.pad(img, radius, mode="edge")
    h, w = img.shape
    return jnp.stack([
        pad[radius + dy: radius + dy + h, radius + dx: radius + dx + w]
        for dy, dx in shifts
    ])


@partial(jax.jit, static_argnames=("size",))
def median_filter(image, size: int = 3):
    """ref: median kernel :360. Sort the window stack along axis 0."""
    img = jnp.asarray(image, jnp.float32)
    stack = _shifted_stack(img, size // 2)
    return jnp.sort(stack, axis=0)[stack.shape[0] // 2]


@partial(jax.jit, static_argnames=("size",))
def bilateral_filter(image, size: int = 5, sigma_space: float = 2.0,
                     sigma_intensity: float = 0.1):
    """ref: bilateral kernel :464."""
    img = jnp.asarray(image, jnp.float32)
    r = size // 2
    stack = _shifted_stack(img, r)
    coords = jnp.asarray(
        [(dy, dx) for dy in range(-r, r + 1) for dx in range(-r, r + 1)],
        jnp.float32)
    w_space = jnp.exp(-jnp.sum(coords ** 2, axis=1)
                      / (2 * sigma_space ** 2))[:, None, None]
    w_int = jnp.exp(-((stack - img[None]) ** 2)
                    / (2 * sigma_intensity ** 2))
    w = w_space * w_int
    return jnp.sum(w * stack, axis=0) / jnp.maximum(jnp.sum(w, axis=0), 1e-12)


@partial(jax.jit, static_argnames=("search_radius", "patch_radius"))
def nlm_filter(image, search_radius: int = 5, patch_radius: int = 1,
               h: float = 0.1):
    """Non-local means (ref: NLM kernel :574): weights from patch-distance
    between the center patch and each shifted patch; box-filtered squared
    differences give the patch distances in O(window) convs."""
    img = jnp.asarray(image, jnp.float32)
    box = jnp.ones((2 * patch_radius + 1, 2 * patch_radius + 1), jnp.float32)
    box = box / box.sum()
    num = jnp.zeros_like(img)
    den = jnp.zeros_like(img)
    pad = jnp.pad(img, search_radius, mode="edge")
    H, W = img.shape
    for dy in range(-search_radius, search_radius + 1):
        for dx in range(-search_radius, search_radius + 1):
            shifted = pad[search_radius + dy: search_radius + dy + H,
                          search_radius + dx: search_radius + dx + W]
            d2 = convolve2d((img - shifted) ** 2, box)
            w = jnp.exp(-d2 / (h * h))
            num = num + w * shifted
            den = den + w
    return num / jnp.maximum(den, 1e-12)


_FILTERS = {
    "gaussian": gaussian_filter,
    "median": median_filter,
    "bilateral": bilateral_filter,
    "nlm": nlm_filter,
    "non_local_means": nlm_filter,
}


def apply_filter(image, method: str = "gaussian", **kw):
    """ref: python/medical_imaging/__init__.py apply_filter.

    3-D/4-D images (ref MedicalImage dims, medical_imaging.hpp:193) are
    filtered slice-wise over the leading axes via vmap."""
    data = image.data if hasattr(image, "modality") else image
    try:
        fn = _FILTERS[method]
    except KeyError:
        raise ValueError(
            f"unknown filter {method!r}; available: {sorted(_FILTERS)}"
        ) from None
    data = jnp.asarray(data, jnp.float32)
    if data.ndim == 2:
        return fn(data, **kw)
    flat = data.reshape((-1,) + data.shape[-2:])
    out = jax.vmap(lambda sl: fn(sl, **kw))(flat)
    return out.reshape(data.shape)
