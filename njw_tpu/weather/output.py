"""Output managers: CSV / NPZ / NetCDF / VTK writers + factory + field
statistics.

Working implementation of the capability the reference only declares —
its CSVOutputManager/NetCDFOutputManager/VTKOutputManager/
OutputManagerFactory/FieldStatistics are header-only with no .cpp anywhere
(ref: src/weather-sim/cpp/include/weather_sim/output_manager.hpp:51-429;
SURVEY §0.1). Formats:

  csv   one file per snapshot, long format (x, y, field, value)
  npz   compressed arrays per snapshot (fast self-describing binary)
  netcdf REAL classic NetCDF-3 via a pure-Python writer
        (njw_tpu.utils.netcdf3) — readable by ncdump/xarray/scipy
  vtk   legacy VTK structured-points ASCII, loadable by ParaView

Each manager implements write(fields, step, time) and close(); the factory
maps format name -> manager (ref: output_manager.hpp:217 factory shape).
"""
from __future__ import annotations

import csv
import json
import os
from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np


@dataclass
class OutputConfig:
    """ref: output_manager.hpp:35 OutputConfig."""

    path: str = "./output"
    prefix: str = "weather"
    format: str = "npz"  # csv | npz | vtk
    fields: Optional[list[str]] = None  # None = all


class OutputManager:
    """Base class (ref: weather_sim.hpp:549-570 abstract OutputManager)."""

    def __init__(self, config: OutputConfig):
        self.config = config
        os.makedirs(config.path, exist_ok=True)
        self.written: list[str] = []

    def _select(self, fields: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        names = self.config.fields
        out = {
            k: np.asarray(v)
            for k, v in fields.items()
            if (names is None or k in names) and hasattr(v, "shape")
        }
        return out

    def _fname(self, step: int, ext: str) -> str:
        return os.path.join(
            self.config.path, f"{self.config.prefix}_{step:08d}.{ext}"
        )

    def write(self, fields: dict, step: int, time: float) -> str:
        raise NotImplementedError

    def close(self) -> None:
        pass


class CSVOutputManager(OutputManager):
    """Long-format CSV (ref: output_manager.hpp:51)."""

    def write(self, fields, step, time):
        path = self._fname(step, "csv")
        sel = self._select(fields)
        with open(path, "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(["step", "time", "field", "y", "x", "value"])
            for name, arr in sel.items():
                a2 = arr.reshape(-1, arr.shape[-1]) if arr.ndim > 2 else arr
                for yy in range(a2.shape[0]):
                    row_vals = a2[yy]
                    for xx in range(a2.shape[1]):
                        w.writerow([step, time, name, yy, xx,
                                    float(row_vals[xx])])
        self.written.append(path)
        return path


class NPZOutputManager(OutputManager):
    """Self-describing compressed binary (NetCDF role,
    ref: output_manager.hpp:103 NetCDFOutputManager)."""

    def write(self, fields, step, time):
        path = self._fname(step, "npz")
        sel = self._select(fields)
        meta = json.dumps({"step": step, "time": time,
                           "fields": sorted(sel)})
        np.savez_compressed(path, __meta__=meta, **sel)
        self.written.append(path)
        return path


class NetCDFOutputManager(OutputManager):
    """REAL classic NetCDF-3 files via the pure-Python writer
    (njw_tpu.utils.netcdf3) — the capability the reference only declares
    (ref: output_manager.hpp:103 NetCDFOutputManager, no .cpp). Readable
    by ncdump/xarray/scipy."""

    def write(self, fields, step, time):
        from njw_tpu.utils.netcdf3 import write_netcdf

        path = self._fname(step, "nc")
        sel = self._select(fields)
        dims: dict[str, int] = {}
        variables = {}
        for name, arr in sel.items():
            arr = np.asarray(arr)
            if arr.ndim == 2:
                ny, nx = arr.shape
                dims.setdefault("y", ny)
                dims.setdefault("x", nx)
                variables[name] = (("y", "x"), arr)
            elif arr.ndim == 3:
                lev, ny, nx = arr.shape
                dims.setdefault("level", lev)
                dims.setdefault("y", ny)
                dims.setdefault("x", nx)
                variables[name] = (("level", "y", "x"), arr)
            else:
                variables[name] = ((), arr.reshape(()))
        write_netcdf(path, variables, dims,
                     global_attrs={"step": int(step), "time": float(time),
                                   "source": "njw_tpu"})
        self.written.append(path)
        return path


class VTKOutputManager(OutputManager):
    """Legacy VTK structured-points ASCII (ref: output_manager.hpp:166)."""

    def write(self, fields, step, time):
        path = self._fname(step, "vtk")
        sel = {k: v for k, v in self._select(fields).items() if v.ndim == 2}
        if not sel:
            raise ValueError("VTK writer needs at least one 2-D field")
        ny, nx = next(iter(sel.values())).shape
        with open(path, "w") as fh:
            fh.write("# vtk DataFile Version 3.0\n")
            fh.write(f"njw_tpu weather step={step} time={time}\n")
            fh.write("ASCII\nDATASET STRUCTURED_POINTS\n")
            fh.write(f"DIMENSIONS {nx} {ny} 1\n")
            fh.write("ORIGIN 0 0 0\nSPACING 1 1 1\n")
            fh.write(f"POINT_DATA {nx * ny}\n")
            for name, arr in sel.items():
                fh.write(f"SCALARS {name} float 1\nLOOKUP_TABLE default\n")
                np.savetxt(fh, arr.reshape(-1), fmt="%.7g")
        self.written.append(path)
        return path


_MANAGERS: dict[str, Callable[..., OutputManager]] = {
    "csv": CSVOutputManager,
    "npz": NPZOutputManager,
    "netcdf": NetCDFOutputManager,
    "vtk": VTKOutputManager,
}


def create_output_manager(config: OutputConfig) -> OutputManager:
    """ref: output_manager.hpp:217 OutputManagerFactory."""
    try:
        return _MANAGERS[config.format](config)
    except KeyError:
        raise ValueError(
            f"unknown output format {config.format!r}; "
            f"available: {sorted(_MANAGERS)}"
        ) from None


@dataclass
class FieldStatistics:
    """ref: output_manager.hpp:377 FieldStatistics."""

    name: str
    min: float
    max: float
    mean: float
    std: float
    finite_fraction: float

    @classmethod
    def of(cls, name: str, arr) -> "FieldStatistics":
        a = np.asarray(arr, dtype=np.float64)
        finite = np.isfinite(a)
        af = a[finite] if finite.any() else np.zeros(1)
        return cls(
            name=name, min=float(af.min()), max=float(af.max()),
            mean=float(af.mean()), std=float(af.std()),
            finite_fraction=float(finite.mean()),
        )


def attach_output(sim, config: OutputConfig):
    """Wire an output manager into a Simulation's run(callback=...) seam."""
    manager = create_output_manager(config)

    def callback(s):
        fields = s.output_fn(s.state) if s.output_fn else {}
        manager.write({k: np.asarray(v) for k, v in fields.items()},
                      s.step_count, s.time)

    return manager, callback
