"""TPU-native weather stencil solver (the framework's north-star workload).

Covers the reference's three dynamical cores — Shallow Water Equations,
Barotropic Vorticity, Primitive Equations (ref:
src/weather-sim/cpp/include/weather_sim/weather_sim.hpp:30-35) — with real
implementations of all three (the reference falls back to SWE for the other
two, ref: weather_simulation.cpp:542-560).

Structure:
  grid.py         GridSpec + WeatherState pytree (replaces WeatherGrid)
  dynamics.py     tendency functions, pure jnp (XLA path)
  integrators.py  euler/rk2/rk4/ab2/semi-implicit as higher-order functions
  ics.py          registry of 9 named initial conditions
  oracle.py       NumPy CPU reference (the allclose oracle)
  model.py        Simulation driver: jitted lax.scan step loop + metrics
  staggered.py    Arakawa C-grid SWE (Sadourny enstrophy-conserving)
  spherical.py    global spectral BVE/SWE on the spherical-harmonic grid
  icosa.py        global FV SWE on the 10-panel icosahedral grid
  nested.py       two-way nested (space+time refined) patches for the SWE

All four GridTypes the reference declares (weather_sim.hpp:61-66) are
real here; the reference implements only Cartesian.
"""
from njw_tpu.weather.grid import GridSpec, PhysicsParams, WeatherState
from njw_tpu.weather.dynamics import make_tendency_fn, diagnostics
from njw_tpu.weather.integrators import make_stepper, INTEGRATORS
from njw_tpu.weather.ics import make_initial_state, IC_REGISTRY
from njw_tpu.weather.model import Simulation, SimConfig
