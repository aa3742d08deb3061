"""Window functions (ref: the 8 CUDA window-generator kernels,
fft_kernels.cu:60-153, and WindowType enum, spectral_analysis.h:41)."""
from __future__ import annotations

import jax.numpy as jnp


def _rectangular(n):
    return jnp.ones(n, jnp.float32)


def _hann(n):
    k = jnp.arange(n, dtype=jnp.float32)
    return 0.5 - 0.5 * jnp.cos(2 * jnp.pi * k / (n - 1))


def _hamming(n):
    k = jnp.arange(n, dtype=jnp.float32)
    return 0.54 - 0.46 * jnp.cos(2 * jnp.pi * k / (n - 1))


def _blackman(n):
    k = jnp.arange(n, dtype=jnp.float32)
    x = 2 * jnp.pi * k / (n - 1)
    return 0.42 - 0.5 * jnp.cos(x) + 0.08 * jnp.cos(2 * x)


def _blackman_harris(n):
    k = jnp.arange(n, dtype=jnp.float32)
    x = 2 * jnp.pi * k / (n - 1)
    return (0.35875 - 0.48829 * jnp.cos(x) + 0.14128 * jnp.cos(2 * x)
            - 0.01168 * jnp.cos(3 * x))


def _bartlett(n):
    k = jnp.arange(n, dtype=jnp.float32)
    return 1.0 - jnp.abs((k - (n - 1) / 2) / ((n - 1) / 2))


def _flattop(n):
    k = jnp.arange(n, dtype=jnp.float32)
    x = 2 * jnp.pi * k / (n - 1)
    return (0.21557895 - 0.41663158 * jnp.cos(x) + 0.277263158 * jnp.cos(2 * x)
            - 0.083578947 * jnp.cos(3 * x) + 0.006947368 * jnp.cos(4 * x))


def _kaiser(n, beta=8.6):
    k = jnp.arange(n, dtype=jnp.float32)
    x = beta * jnp.sqrt(1.0 - ((2 * k / (n - 1)) - 1.0) ** 2)
    return _i0(x) / _i0(jnp.asarray(beta, jnp.float32))


def _i0(x):
    """Modified Bessel I0 via its power series (converged for |x|<~20)."""
    x = jnp.asarray(x, jnp.float32)
    half2 = (x / 2.0) ** 2
    term = jnp.ones_like(x)
    total = jnp.ones_like(x)
    for k in range(1, 25):
        term = term * half2 / (k * k)
        total = total + term
    return total


WINDOWS = {
    "rectangular": _rectangular,
    "boxcar": _rectangular,
    "hann": _hann,
    "hanning": _hann,
    "hamming": _hamming,
    "blackman": _blackman,
    "blackman_harris": _blackman_harris,
    "bartlett": _bartlett,
    "flattop": _flattop,
    "kaiser": _kaiser,
}


def get_window(name: str, n: int, **kwargs) -> jnp.ndarray:
    try:
        return WINDOWS[name](n, **kwargs)
    except KeyError:
        raise ValueError(
            f"unknown window {name!r}; available: {sorted(set(WINDOWS))}"
        ) from None
