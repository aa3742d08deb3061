"""Native C++ host library: build, correctness vs NumPy/JAX, async writer.

Skips gracefully if no C++ toolchain is available (mirrors the reference's
GPU-optional skip strategy, ref: tests/conftest.py:30-41)."""
import os

import numpy as np
import pytest

from njw_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason=f"native library unavailable: {native.load_error()}")


class TestSWE:
    def test_rk4_matches_numpy_oracle(self):
        from njw_tpu.weather.oracle import SWEOracle

        rng = np.random.default_rng(0)
        ny = nx = 48
        u = rng.normal(0, 0.5, (ny, nx)).astype(np.float32)
        v = rng.normal(0, 0.5, (ny, nx)).astype(np.float32)
        h = (10 + rng.normal(0, 0.1, (ny, nx))).astype(np.float32)

        nu, nv, nh = native.swe_rk4_run(u, v, h, dt=0.01, n_steps=20,
                                        coriolis_f=1e-4)
        ou, ov, oh = SWEOracle(coriolis_f=1e-4).run((u, v, h), 0.01, 20,
                                                    "rk4")
        np.testing.assert_allclose(nh, oh, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(nu, ou, rtol=1e-4, atol=1e-4)

    def test_openmp_enabled(self):
        assert native.load().omp_thread_count() >= 1


class TestNBody:
    def test_matches_jax_forces(self):
        from njw_tpu.nbody import accelerations, create_random_system

        s = create_random_system(256, seed=1)
        a_native = native.nbody_accelerations(
            np.asarray(s.pos), np.asarray(s.mass), G=1.0, softening=1e-6)
        a_jax = np.asarray(accelerations(s, method="direct"))
        np.testing.assert_allclose(a_native, a_jax, rtol=1e-4, atol=1e-4)


class TestLJ:
    def test_dimer_force_sign(self):
        pos = np.asarray([[0, 0, 0], [1.5, 0, 0]], np.float32) + 10
        f = native.lj_forces(pos, np.full(3, 50.0, np.float32))
        assert f[0, 0] > 0 > f[1, 0]  # attraction beyond r_min
        pos2 = np.asarray([[0, 0, 0], [0.9, 0, 0]], np.float32) + 10
        f2 = native.lj_forces(pos2, np.full(3, 50.0, np.float32))
        assert f2[0, 0] < 0 < f2[1, 0]  # repulsion inside


class TestFIR:
    def test_matches_numpy_convolution(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal(512).astype(np.float32)
        taps = rng.standard_normal(31).astype(np.float32)
        y = native.fir_filter(x, taps)
        ref = np.convolve(x, taps)[:512].astype(np.float32)
        np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4)


class TestAsyncWriter:
    def test_writes_and_reads_back(self, tmp_path):
        with native.AsyncSnapshotWriter(max_queue=2) as w:
            arrays = [np.full(100, float(i), np.float32) for i in range(5)]
            paths = [str(tmp_path / f"snap_{i}.bin") for i in range(5)]
            for i, (p, a) in enumerate(zip(paths, arrays)):
                assert w.enqueue(p, a, step=i)
            w.flush()
            assert w.written == 5
            step, data = native.AsyncSnapshotWriter.read_snapshot(paths[3])
            assert step == 3
            np.testing.assert_array_equal(data, arrays[3])
