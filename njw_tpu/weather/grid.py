"""Grid specification and prognostic state.

TPU-native replacement for the reference's ``WeatherGrid``
(ref: src/weather-sim/cpp/include/weather_sim/weather_sim.hpp:254-412):
instead of a mutable container of six named fields with getter/setter pairs
and an explicit ``swap()``, state is an immutable pytree of ``jnp`` arrays
that flows through ``jit``/``scan``/``shard_map``.

Array layout: 2-D fields are ``(ny, nx)`` with x as the minor (lane) axis —
the natural TPU (8,128) tiling. 3-D primitive-equation fields are
``(levels, ny, nx)``.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from njw_tpu.utils.pytree import pytree_dataclass, static_field


@pytree_dataclass
class GridSpec:
    """Static grid geometry. Hashable; safe as a jit static argument.

    Mirrors the grid parameters of the reference ``SimulationConfig``
    (ref: weather_sim.hpp:161-168): nx/ny/levels/dx/dy plus the boundary
    condition (ref: weather_sim.hpp:40-45 BoundaryCondition).
    """

    nx: int = static_field(default=256)
    ny: int = static_field(default=256)
    levels: int = static_field(default=1)
    dx: float = static_field(default=1.0)
    dy: float = static_field(default=1.0)
    # 'periodic': wrap-around (ref BoundaryCondition::Periodic);
    # 'clamped':  edge-clamped neighbor indices, the scheme the reference's
    #             CPU stencil actually implements (ref:
    #             weather_simulation.cpp:509-513 idx_left=(x>0)?idx-1:idx).
    bc: str = static_field(default="periodic")
    # 'cartesian' (A-grid, collocated) or 'staggered' (Arakawa C-grid,
    # Sadourny enstrophy-conserving scheme — weather/staggered.py).
    # ref: GridType{Cartesian,Staggered,Icosahedral,SphericalHarmonic}
    # declared at weather_sim.hpp:61-66, only Cartesian ever used.
    grid_type: str = static_field(default="cartesian")

    @property
    def shape(self) -> tuple[int, int]:
        return (self.ny, self.nx)

    @property
    def shape3(self) -> tuple[int, int, int]:
        return (self.levels, self.ny, self.nx)

    def coords(self, dtype=jnp.float32):
        """(y, x) index coordinate arrays of shape (ny, 1) and (1, nx)."""
        y = jnp.arange(self.ny, dtype=dtype)[:, None]
        x = jnp.arange(self.nx, dtype=dtype)[None, :]
        return y, x

    def validate(self) -> None:
        if self.bc not in ("periodic", "clamped", "outflow", "reflective"):
            raise ValueError(f"unknown boundary condition: {self.bc!r}")
        if self.grid_type not in ("cartesian", "staggered"):
            raise ValueError(
                f"unknown grid type: {self.grid_type!r} for a planar "
                "GridSpec (spherical_harmonic and icosahedral are global "
                "cores routed in Simulation.from_config — the reference "
                "declares all four GridTypes but implements none beyond "
                "Cartesian, ref: weather_sim.hpp:61-66)")
        if self.grid_type == "staggered" and self.bc != "periodic":
            raise ValueError("the C-grid core is periodic-only")
        if self.nx < 3 or self.ny < 3:
            raise ValueError("grid must be at least 3x3 for central differences")


@pytree_dataclass
class PhysicsParams:
    """Physical constants of the dynamical core.

    Mirrors the physical parameters of the reference ``SimulationConfig``
    (ref: weather_sim.hpp:170-176): gravity, coriolis_f, beta, viscosity,
    diffusivity. Traced leaves (changing them does not recompile).
    """

    gravity: jnp.ndarray = 9.81
    coriolis_f: jnp.ndarray = 0.0
    beta: jnp.ndarray = 0.0
    viscosity: jnp.ndarray = 0.0
    diffusivity: jnp.ndarray = 0.0
    # Mean fluid depth used by the semi-implicit solver's linearization.
    mean_depth: jnp.ndarray = 10.0


@pytree_dataclass
class WeatherState:
    """Prognostic state pytree.

    Fields match the reference ``WeatherGrid`` prognostics (ref:
    weather_sim.hpp:254-412): velocity (u, v), height h, plus optional
    pressure p, temperature T, humidity q (used by the 'front' /
    'atmospheric_profile' ICs and the primitive-equations core). Optional
    fields are ``None`` when unused — ``None`` is an empty pytree node, so
    jit/scan handle it natively with zero cost.

    Shapes: (ny, nx) for the 2-D cores; (levels, ny, nx) for primitive
    equations.
    """

    u: jnp.ndarray
    v: jnp.ndarray
    h: jnp.ndarray
    p: Optional[jnp.ndarray] = None
    T: Optional[jnp.ndarray] = None
    q: Optional[jnp.ndarray] = None
    ps: Optional[jnp.ndarray] = None  # surface pressure (PE core)

    @classmethod
    def zeros(cls, grid: GridSpec, dtype=jnp.float32, full: bool = False):
        """Default-initialized state.

        Defaults follow the reference WeatherGrid ctor: h=10, p=1013.25,
        T=288.15, q=0 (ref: weather_grid.cpp:63-65).
        """
        z = jnp.zeros(grid.shape, dtype)
        s = cls(u=z, v=z, h=jnp.full(grid.shape, 10.0, dtype))
        if full:
            s = s.replace(
                p=jnp.full(grid.shape, 1013.25, dtype),
                T=jnp.full(grid.shape, 288.15, dtype),
                q=z,
            )
        return s

    def astype(self, dtype):
        import jax

        return jax.tree.map(lambda a: a.astype(dtype), self)

    def to_numpy(self) -> dict[str, np.ndarray]:
        out = {}
        for name in ("u", "v", "h", "p", "T", "q", "ps"):
            val = getattr(self, name)
            if val is not None:
                out[name] = np.asarray(val)
        return out
