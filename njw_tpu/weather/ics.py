"""Initial conditions: a registry of pure functions.

Replaces the reference's virtual ``InitialCondition`` class hierarchy +
string factory (ref: src/weather-sim/cpp/src/initial_conditions.cpp:16-45,
initial_conditions.hpp:22-68) with pure vectorized functions
``ic(grid, key=None, **params) -> WeatherState``. Same nine names, same
math, same default parameters.

Coordinate convention matches the reference: normalized coordinates scale by
(n-1) (ref: initial_conditions.cpp e.g. :196-198), radii by min(nx, ny).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from njw_tpu.weather.grid import GridSpec, WeatherState

IC_REGISTRY: dict[str, Callable] = {}


def register_ic(name: str):
    def deco(fn):
        IC_REGISTRY[name] = fn
        return fn

    return deco


def make_initial_state(
    name: str, grid: GridSpec, key: Optional[jax.Array] = None, **params
) -> WeatherState:
    """Build an initial state by IC name (ref factory:
    initial_conditions.cpp:16-45; name->class map mirrored from
    python/weather_simulation.py:376-453)."""
    try:
        fn = IC_REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown initial condition {name!r}; available: {sorted(IC_REGISTRY)}"
        ) from None
    return fn(grid, key=key, **params)


def _xy_norm(grid: GridSpec):
    """Normalized [0,1] coordinates, (ny,1) and (1,nx), ref-style /(n-1)."""
    y, x = grid.coords()
    return y / max(grid.ny - 1, 1), x / max(grid.nx - 1, 1)


@register_ic("uniform")
def uniform(grid, key=None, u=0.0, v=0.0, h=10.0, p=1000.0, t=300.0, q=0.0):
    """Uniform fields (ref: initial_conditions.cpp:59-89)."""
    full = jnp.full(grid.shape, jnp.float32(1.0))
    return WeatherState(
        u=u * full, v=v * full, h=h * full, p=p * full, T=t * full, q=q * full
    )


@register_ic("random")
def random(grid, key=None, amplitude=1.0, seed=0):
    """Random perturbations u,v ~ U(-a,a), h = 10 + U(-a,a)
    (ref: initial_conditions.cpp:97-121; mt19937 there, threefry here)."""
    if key is None:
        key = jax.random.key(seed)
    ku, kv, kh = jax.random.split(key, 3)
    shape = grid.shape
    unif = lambda k: jax.random.uniform(
        k, shape, jnp.float32, -amplitude, amplitude
    )
    return WeatherState(u=unif(ku), v=unif(kv), h=10.0 + unif(kh))


@register_ic("zonal_flow")
def zonal_flow(grid, key=None, u_max=10.0, h_mean=10.0, beta=0.1):
    """Zonal flow with geostrophically balanced height
    (ref: initial_conditions.cpp:135-174): u = u_max sin(pi y),
    h = h_mean - f u^2 / (2 g) with f = 1e-4 + beta (y - 1/2)."""
    y_norm, _ = _xy_norm(grid)
    u = u_max * jnp.sin(jnp.pi * y_norm)
    f = 1.0e-4 + beta * (y_norm - 0.5)
    h = h_mean - 0.5 * f * u * u / 9.81
    ones_row = jnp.ones((1, grid.nx), jnp.float32)
    return WeatherState(
        u=(u * ones_row).astype(jnp.float32),
        v=jnp.zeros(grid.shape, jnp.float32),
        h=(h * ones_row).astype(jnp.float32),
    )


@register_ic("vortex")
def vortex(
    grid, key=None, x_center=0.5, y_center=0.5, radius=0.1, strength=10.0,
    h_mean=10.0,
):
    """Rankine-like vortex in cyclostrophic balance
    (ref: initial_conditions.cpp:187-237): inside r<=R,
    w = s * r_n * exp(1 - r_n^2), h = h_mean - w^2/(2*9.81),
    (u,v) = w * (-dy, dx)/max(r, 1e-6)."""
    y, x = grid.coords()
    xc = x_center * (grid.nx - 1)
    yc = y_center * (grid.ny - 1)
    rg = radius * min(grid.nx, grid.ny)
    dx = x - xc
    dy = y - yc
    r = jnp.sqrt(dx * dx + dy * dy)
    r_n = r / rg
    inside = (r > 0.0) & (r <= rg)
    w = jnp.where(inside, strength * r_n * jnp.exp(1.0 - r_n * r_n), 0.0)
    h = jnp.where(inside, h_mean - 0.5 * w * w / 9.81, h_mean)
    r_safe = jnp.maximum(r, 1.0e-6)
    u = -w * dy / r_safe
    v = w * dx / r_safe
    return WeatherState(
        u=u.astype(jnp.float32), v=v.astype(jnp.float32), h=h.astype(jnp.float32)
    )


@register_ic("jet_stream")
def jet_stream(grid, key=None, y_center=0.5, width=0.1, strength=10.0, h_mean=10.0):
    """Gaussian jet with geostrophic height tilt
    (ref: initial_conditions.cpp:249-286): u = s exp(-dy^2 / 2w^2),
    h = h_mean - (1e-4 u / 9.81) dy."""
    y, _ = grid.coords()
    yc = y_center * (grid.ny - 1)
    wg = width * grid.ny
    dy = y - yc
    u = strength * jnp.exp(-(dy * dy) / (2.0 * wg * wg))
    h = h_mean + (-1.0e-4 * u / 9.81) * dy
    ones_row = jnp.ones((1, grid.nx), jnp.float32)
    return WeatherState(
        u=(u * ones_row).astype(jnp.float32),
        v=jnp.zeros(grid.shape, jnp.float32),
        h=(h * ones_row).astype(jnp.float32),
    )


@register_ic("breaking_wave")
def breaking_wave(grid, key=None, amplitude=1.0, wavelength=0.2, h_mean=10.0):
    """Zonal flow + meridionally confined wave perturbation
    (ref: initial_conditions.cpp:289-341)."""
    y_norm, x_norm = _xy_norm(grid)
    _, x = grid.coords()
    wave_k = 2.0 * jnp.pi / (wavelength * grid.nx)
    u_base = 5.0 * jnp.sin(jnp.pi * y_norm)
    phase = wave_k * x - 0.1 * y_norm
    amp = amplitude * jnp.exp(-((y_norm - 0.5) ** 2) / 0.05)
    u = u_base + amp * jnp.sin(phase)
    v = amp * jnp.cos(phase)
    h = h_mean + amp * jnp.cos(phase)
    return WeatherState(
        u=u.astype(jnp.float32), v=v.astype(jnp.float32), h=h.astype(jnp.float32)
    )


@register_ic("front")
def front(
    grid, key=None, y_position=0.5, width=0.05, temp_difference=10.0,
    wind_shear=5.0,
):
    """Temperature front with wind shear (ref: initial_conditions.cpp:345-398):
    tanh transition in T, u, p; h stays at default."""
    y, _ = grid.coords()
    yc = y_position * (grid.ny - 1)
    wg = width * grid.ny
    trans = jnp.tanh((y - yc) / wg)
    T = 288.15 + 0.5 * temp_difference * trans
    u = 0.5 * wind_shear * trans
    p = 1013.25 - 0.1 * temp_difference * trans
    ones_row = jnp.ones((1, grid.nx), jnp.float32)
    return WeatherState(
        u=(u * ones_row).astype(jnp.float32),
        v=jnp.zeros(grid.shape, jnp.float32),
        h=jnp.full(grid.shape, 10.0, jnp.float32),
        p=(p * ones_row).astype(jnp.float32),
        T=(T * ones_row).astype(jnp.float32),
    )


@register_ic("mountain")
def mountain(
    grid, key=None, x_center=0.3, y_center=0.5, radius=0.1, height=1.0,
    u_base=5.0,
):
    """Bell mountain in the height field with diverted base flow
    (ref: initial_conditions.cpp:401-463)."""
    y, x = grid.coords()
    xc = x_center * (grid.nx - 1)
    yc = y_center * (grid.ny - 1)
    rg = radius * min(grid.nx, grid.ny)
    dx = x - xc
    dy = y - yc
    r = jnp.sqrt(dx * dx + dy * dy)
    profile = jnp.where(
        r <= 2.0 * rg, height * jnp.exp(-(r * r) / (rg * rg)), 0.0
    )
    h = 10.0 + profile
    reduction = jnp.where(r <= 3.0 * rg, 0.7 * profile / height, 0.0)
    u = u_base * (1.0 - reduction)
    v = jnp.where(r > 0.0, -0.5 * reduction * u_base * dy / jnp.maximum(r, 1e-12), 0.0)
    return WeatherState(
        u=u.astype(jnp.float32), v=v.astype(jnp.float32), h=h.astype(jnp.float32)
    )


# Latitude profiles for the atmospheric-profile IC. The reference hardcodes
# 10-entry per-latitude tables for standard/tropical/polar
# (ref: initial_conditions.cpp:485-560+); here the profiles are analytic
# (smooth in latitude), which is both simpler and friendlier to arbitrary
# grid sizes. Shapes: T decreasing poleward, subtropical jet in u.
_PROFILES = {
    #              T_eq     dT_pole  p0       q_eq   jet_u  jet_lat
    "standard": (298.0, 30.0, 1013.0, 0.8, 12.0, 0.55),
    "tropical": (302.0, 12.0, 1010.0, 0.9, 8.0, 0.45),
    "polar": (275.0, 25.0, 1016.0, 0.5, 15.0, 0.60),
}


@register_ic("atmospheric_profile")
def atmospheric_profile(grid, key=None, profile_name="standard"):
    """Latitude-dependent T/p/q/u profile with small zonal variation
    (ref: initial_conditions.cpp:468-560: tabulated profiles interpolated in
    y plus sinusoidal x variation of T +/-2, p +/-2, q +/-0.02)."""
    if profile_name not in _PROFILES:
        profile_name = "standard"
    T_eq, dT, p0, q_eq, jet_u, jet_lat = _PROFILES[profile_name]
    y_norm, x_norm = _xy_norm(grid)
    T_base = T_eq - dT * y_norm
    p_base = p0 - 4.0 * y_norm
    q_base = q_eq * (1.0 - 0.6 * y_norm)
    u_base = jet_u * jnp.exp(-((y_norm - jet_lat) ** 2) / 0.02)
    v_base = jnp.sin(2.0 * jnp.pi * y_norm)

    T = T_base + 2.0 * jnp.sin(2.0 * jnp.pi * x_norm)
    p = p_base + 2.0 * jnp.cos(2.0 * jnp.pi * x_norm)
    q = q_base + 0.02 * jnp.sin(4.0 * jnp.pi * x_norm)
    ones = jnp.ones(grid.shape, jnp.float32)
    return WeatherState(
        u=(u_base * ones).astype(jnp.float32),
        v=(v_base * ones).astype(jnp.float32),
        h=10.0 * ones,
        p=(p * ones).astype(jnp.float32),
        T=(T * ones).astype(jnp.float32),
        q=(q * ones).astype(jnp.float32),
    )
