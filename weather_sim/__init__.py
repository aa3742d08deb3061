"""Compatibility shim: `import weather_sim` / `python -m weather_sim`.

BASELINE config 1 names the CLI `python -m weather_sim`; the implementation
lives in njw_tpu.weather.
"""
from njw_tpu.weather import *  # noqa: F401,F403
from njw_tpu.weather import (  # noqa: F401
    GridSpec, PhysicsParams, WeatherState, Simulation, SimConfig,
    make_initial_state, make_tendency_fn, make_stepper, diagnostics,
)
