"""Interop tests — incl. a real cross-process shared-memory roundtrip
(the reference SHIPS such tests without the module they import,
ref: tests/integrations/common/test_shared_memory.py:24)."""
import multiprocessing as mp

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from njw_tpu.interop import (
    DeviceMemoryManager, SharedArray, SharedMemoryManager,
    chunked_device_put, to_jax, to_numpy, to_torch, zero_copy_view,
)


def _child_doubles(name, out_q):
    sa = SharedArray.attach(name)
    sa.array[...] = sa.array * 2
    total = float(sa.array.sum())
    sa.close()
    out_q.put(total)


class TestSharedMemory:
    def test_create_attach_roundtrip(self):
        with SharedArray.create("njw_test_rt", (8, 8), np.float32) as sa:
            sa.array[...] = 7.0
            other = SharedArray.attach("njw_test_rt")
            np.testing.assert_array_equal(other.array, 7.0)
            other.array[0, 0] = 1.0
            assert sa.array[0, 0] == 1.0  # same memory
            other.close()

    def test_cross_process_mutation(self):
        """A child process mutates the shared segment in place."""
        ctx = mp.get_context("spawn")
        with SharedArray.from_array("njw_test_xp",
                                    np.arange(16.0, dtype=np.float32)) as sa:
            q = ctx.Queue()
            p = ctx.Process(target=_child_doubles, args=("njw_test_xp", q))
            p.start()
            p.join(timeout=30)
            assert p.exitcode == 0
            assert q.get(timeout=5) == pytest.approx(2 * np.arange(16.0).sum())
            np.testing.assert_array_equal(
                sa.array, 2 * np.arange(16.0, dtype=np.float32))

    def test_manager_lifecycle(self):
        with SharedMemoryManager(prefix="njwm") as mgr:
            a = mgr.allocate((4,), np.int32)
            b = mgr.share(np.ones(3, np.float64))
            assert a.array.sum() == 0
            np.testing.assert_array_equal(mgr.get(b.name).array, 1.0)
        # context exit released everything: attach must now fail
        with pytest.raises(FileNotFoundError):
            SharedArray.attach(a.name)


class TestDeviceMemory:
    def test_put_get_roundtrip(self):
        with DeviceMemoryManager() as mgr:
            h = np.random.default_rng(0).standard_normal(64).astype(np.float32)
            handle = mgr.to_device("x", h)
            handle.wait()
            back = mgr.to_host("x").wait()
            np.testing.assert_array_equal(back, h)
            assert mgr.allocated_bytes == h.nbytes
            stats = mgr.memory_stats()
            assert stats["tracked_buffers"] == 1

    def test_d2d_copy_and_free(self):
        with DeviceMemoryManager() as mgr:
            mgr.to_device("a", np.ones(8, np.float32))
            mgr.copy("a", "b").wait()
            np.testing.assert_array_equal(mgr.to_host("b").wait(), 1.0)
            mgr.free("a")
            with pytest.raises(KeyError):
                mgr.get("a")


class TestArrayOps:
    def test_conversions(self):
        x = np.arange(6.0, dtype=np.float32).reshape(2, 3)
        j = to_jax(x)
        t = to_torch(j)
        back = to_numpy(t)
        np.testing.assert_array_equal(back, x)
        assert zero_copy_view(t).shape == (2, 3)

    def test_chunked_device_put(self):
        x = np.random.default_rng(1).standard_normal((64, 128)).astype(
            np.float32)
        out = chunked_device_put(x, chunk_bytes=128 * 4 * 8)  # 8-row chunks
        np.testing.assert_array_equal(np.asarray(out), x)
