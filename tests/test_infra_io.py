"""Checkpoint/restore + output managers (the reference declares output
managers but ships no implementation — ref: output_manager.hpp:51-429)."""
import os

import numpy as np
import pytest

from njw_tpu.utils.checkpoint import (
    load_checkpoint, restore_simulation, save_checkpoint, save_simulation,
)
from njw_tpu.weather import SimConfig, Simulation
from njw_tpu.weather.output import (
    FieldStatistics, OutputConfig, attach_output, create_output_manager,
)


def _sim(steps=0):
    cfg = SimConfig(grid_width=32, grid_height=32, dt=0.01)
    sim = Simulation.from_config(cfg, "vortex", strength=2.0)
    if steps:
        sim.step(steps)
    return sim


class TestCheckpoint:
    def test_roundtrip_pytree(self, tmp_path):
        sim = _sim(10)
        p = save_checkpoint(str(tmp_path / "ck"), sim.state, step=10,
                            time=0.1, extra={"note": "x"})
        state, meta = load_checkpoint(p, like=sim.state)
        assert meta["step"] == 10 and meta["extra"]["note"] == "x"
        np.testing.assert_array_equal(np.asarray(state.h),
                                      np.asarray(sim.state.h))

    def test_resume_continues_identically(self, tmp_path):
        """The key resume property: save at step 10, run to 20; vs
        restore into a fresh sim and run 10 more — identical states."""
        a = _sim(10)
        p = save_simulation(str(tmp_path / "ck"), a)
        a.step(10)

        b = _sim(0)
        restore_simulation(p, b)
        assert b.step_count == 10
        b.step(10)
        np.testing.assert_array_equal(np.asarray(a.state.h),
                                      np.asarray(b.state.h))

    def test_template_mismatch_raises(self, tmp_path):
        sim = _sim()
        p = save_checkpoint(str(tmp_path / "ck"), (sim.state.u, sim.state.v))
        with pytest.raises(ValueError, match="leaves"):
            load_checkpoint(p, like=(sim.state.u,))


class TestOutputManagers:
    FIELDS = {"h": np.arange(12.0, dtype=np.float32).reshape(3, 4),
              "u": np.ones((3, 4), np.float32)}

    @pytest.mark.parametrize("fmt,ext", [("csv", "csv"), ("npz", "npz"),
                                         ("vtk", "vtk"), ("netcdf", "nc")])
    def test_writers_produce_files(self, tmp_path, fmt, ext):
        m = create_output_manager(OutputConfig(path=str(tmp_path), format=fmt))
        p = m.write(self.FIELDS, step=3, time=0.03)
        assert p.endswith(f"_00000003.{ext}")
        assert os.path.getsize(p) > 0

    def test_npz_roundtrip(self, tmp_path):
        m = create_output_manager(OutputConfig(path=str(tmp_path), format="npz"))
        p = m.write(self.FIELDS, step=1, time=0.01)
        with np.load(p) as d:
            np.testing.assert_array_equal(d["h"], self.FIELDS["h"])

    def test_vtk_header(self, tmp_path):
        m = create_output_manager(OutputConfig(path=str(tmp_path), format="vtk"))
        p = m.write(self.FIELDS, step=0, time=0.0)
        head = open(p).read(200)
        assert "vtk DataFile" in head and "DIMENSIONS 4 3 1" in head

    def test_field_selection(self, tmp_path):
        m = create_output_manager(
            OutputConfig(path=str(tmp_path), format="npz", fields=["h"]))
        p = m.write(self.FIELDS, step=0, time=0.0)
        with np.load(p) as d:
            assert "h" in d and "u" not in d

    def test_unknown_format_raises(self, tmp_path):
        with pytest.raises(ValueError, match="unknown output format"):
            create_output_manager(OutputConfig(path=str(tmp_path),
                                               format="hdf9"))

    def test_attach_to_simulation(self, tmp_path):
        sim = _sim()
        manager, cb = attach_output(sim, OutputConfig(path=str(tmp_path),
                                                      format="npz"))
        sim.run(20, output_interval=10, callback=cb)
        assert len(manager.written) == 2


def test_field_statistics():
    arr = np.array([[1.0, 2.0], [3.0, np.nan]], np.float32)
    st = FieldStatistics.of("h", arr)
    assert st.min == 1.0 and st.max == 3.0
    assert st.finite_fraction == pytest.approx(0.75)


class TestNetCDF3:
    """Real classic NetCDF-3 writer (ref declares NetCDFOutputManager
    with no implementation, output_manager.hpp:103)."""

    def test_roundtrip(self, tmp_path):
        import numpy as np

        from njw_tpu.utils.netcdf3 import read_netcdf, write_netcdf

        rng = np.random.default_rng(0)
        h = rng.standard_normal((6, 8)).astype(np.float32)
        T = rng.standard_normal((3, 6, 8)).astype(np.float32)
        p = str(tmp_path / "snap.nc")
        write_netcdf(p, {"h": (("y", "x"), h),
                         "T": (("level", "y", "x"), T)},
                     {"y": 6, "x": 8, "level": 3},
                     global_attrs={"step": 7, "time": 1.5,
                                   "source": "njw_tpu"})
        variables, dims, gatts = read_netcdf(p)
        assert open(p, "rb").read(4) == b"CDF\x01"
        assert dims == {"y": 6, "x": 8, "level": 3}
        np.testing.assert_array_equal(variables["h"][1], h)
        np.testing.assert_array_equal(variables["T"][1], T)
        assert variables["T"][0] == ("level", "y", "x")
        assert int(gatts["step"]) == 7 and gatts["source"] == "njw_tpu"

    def test_scipy_compatible_if_available(self, tmp_path):
        import numpy as np

        from njw_tpu.utils.netcdf3 import write_netcdf

        p = str(tmp_path / "c.nc")
        a = np.arange(12, dtype=np.float32).reshape(3, 4)
        write_netcdf(p, {"a": (("y", "x"), a)}, {"y": 3, "x": 4})
        scipy_nc = pytest.importorskip("scipy.io")
        f = scipy_nc.netcdf_file(p, "r")
        np.testing.assert_array_equal(np.asarray(f.variables["a"][:]), a)

    def test_output_manager_writes_nc(self, tmp_path):
        import numpy as np

        from njw_tpu.utils.netcdf3 import read_netcdf
        from njw_tpu.weather.output import OutputConfig, create_output_manager

        m = create_output_manager(OutputConfig(path=str(tmp_path),
                                               format="netcdf"))
        path = m.write({"h": np.ones((4, 4), np.float32)}, step=3, time=0.3)
        assert path.endswith(".nc")
        variables, dims, gatts = read_netcdf(path)
        assert "h" in variables and dims["x"] == 4


class TestOrbaxCheckpoint:
    """Multi-host-safe checkpoint backend (ROADMAP r1: orbax pending)."""

    def test_roundtrip_sharded_state(self, tmp_path):
        import jax
        import numpy as np
        from jax.sharding import Mesh

        from njw_tpu.parallel.halo import sharded_state
        from njw_tpu.utils.checkpoint import (
            load_checkpoint_orbax, save_checkpoint_orbax,
        )
        from njw_tpu.weather.grid import GridSpec, WeatherState
        from njw_tpu.weather.ics import make_initial_state

        grid = GridSpec(nx=32, ny=32)
        s = make_initial_state("vortex", grid, strength=2.0)
        s = WeatherState(u=s.u, v=s.v, h=s.h)
        mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("y", "x"))
        sharded = sharded_state(s, mesh)

        p = save_checkpoint_orbax(str(tmp_path / "ck"), sharded,
                                  step=12, time=0.12,
                                  extra={"note": "r2"})
        back, meta = load_checkpoint_orbax(p, sharded)
        assert meta["step"] == 12
        assert meta["extra"]["note"] == "r2"
        np.testing.assert_array_equal(np.asarray(back.h),
                                      np.asarray(sharded.h))
        # restored array keeps the sharding of the template
        assert back.h.sharding == sharded.h.sharding
