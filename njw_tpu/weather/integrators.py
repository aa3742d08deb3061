"""Time integrators as higher-order functions.

Replaces the reference's virtual-dispatch integrator switch
(ref: src/weather-sim/cpp/src/weather_simulation.cpp:122-142) and fixes two
of its gaps: RK4 works for every model (the reference restricts RK4 to SWE
and silently falls back to RK2, ref :334-338), and Adams-Bashforth /
semi-implicit are real methods (the reference silently falls back to Euler,
ref :457-471).

An integrator is a ``Stepper``:

    carry0 = stepper.init(state)
    carry, state = stepper.step(carry, state, dt)

The carry holds multi-step history (AB2) and is an empty tuple for
single-step methods, so every method composes with ``lax.scan``.

All combination arithmetic is pytree-level (``jax.tree.map``), fused by XLA
into the stencil computation — the reference instead materializes k1..k4 in
host std::vectors (ref: weather_simulation.cpp:325-455).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax

TendencyFn = Callable  # state -> d(state)/dt


def _axpy(a, x, y):
    """y + a*x over matching pytrees (None leaves in x pass y through)."""
    return jax.tree.map(lambda yi, xi: yi + a * xi, y, x)


class Stepper(NamedTuple):
    init: Callable  # state -> carry
    step: Callable  # (carry, state, dt) -> (carry, state)
    name: str
    stages: int  # tendency evaluations per step (for roofline math)


def euler(tendency: TendencyFn) -> Stepper:
    """Explicit Euler (ref: weather_simulation.cpp:160-218)."""

    def step(carry, s, dt):
        return carry, _axpy(dt, tendency(s), s)

    return Stepper(lambda s: (), step, "euler", 1)


def rk2(tendency: TendencyFn) -> Stepper:
    """Midpoint RK2 (ref: weather_simulation.cpp:220-323)."""

    def step(carry, s, dt):
        k1 = tendency(s)
        mid = _axpy(0.5 * dt, k1, s)
        k2 = tendency(mid)
        return carry, _axpy(dt, k2, s)

    return Stepper(lambda s: (), step, "rk2", 2)


def rk4(tendency: TendencyFn) -> Stepper:
    """Classic RK4 (ref: weather_simulation.cpp:325-455, SWE-only there)."""

    def step(carry, s, dt):
        k1 = tendency(s)
        k2 = tendency(_axpy(0.5 * dt, k1, s))
        k3 = tendency(_axpy(0.5 * dt, k2, s))
        k4 = tendency(_axpy(dt, k3, s))
        incr = jax.tree.map(
            lambda a, b, c, d: (a + 2.0 * b + 2.0 * c + d) * (1.0 / 6.0),
            k1, k2, k3, k4,
        )
        return carry, _axpy(dt, incr, s)

    return Stepper(lambda s: (), step, "rk4", 4)


def ab2(tendency: TendencyFn) -> Stepper:
    """2nd-order Adams-Bashforth: s' = s + dt*(3/2 T_n - 1/2 T_{n-1}).

    Bootstraps with T_{-1} := T_0 (first step degenerates to Euler).
    Real implementation of the method the reference declares but maps to
    Euler (ref: weather_simulation.cpp:457-463).
    """

    def init(s):
        return tendency(s)  # carry = previous tendency

    def step(t_prev, s, dt):
        t_now = tendency(s)
        incr = jax.tree.map(lambda a, b: 1.5 * a - 0.5 * b, t_now, t_prev)
        return t_now, _axpy(dt, incr, s)

    return Stepper(init, step, "ab2", 1)


INTEGRATORS: dict[str, Callable[[TendencyFn], Stepper]] = {
    "euler": euler,
    "rk2": rk2,
    "rk4": rk4,
    "adams_bashforth": ab2,
}


def make_stepper(method: str, tendency: TendencyFn, **kwargs) -> Stepper:
    """Look up an integrator by name (ref name set: weather_sim.hpp:50-56).

    ``semi_implicit`` is model-specific (needs the linear-operator split and
    a spectral solve) and is constructed in
    :mod:`njw_tpu.weather.semi_implicit`; the generic registry handles the
    four explicit methods.
    """
    if method == "semi_implicit":
        from njw_tpu.weather.semi_implicit import semi_implicit_swe

        return semi_implicit_swe(tendency, **kwargs)
    try:
        return INTEGRATORS[method](tendency)
    except KeyError:
        raise ValueError(
            f"unknown integration method {method!r}; "
            f"available: {sorted(INTEGRATORS) + ['semi_implicit']}"
        ) from None
