"""ctypes bindings for the native host library (native/libnjw_host.so).

The native layer is the framework's counterpart of the reference's C++17
CPU cores + pybind11 bindings (SURVEY §1 L3-L4) — built with plain
ctypes because pybind11 is not in this image. It provides:

* fast OpenMP CPU oracle kernels (SWE RK4, n-body, LJ, FIR) for
  large-grid validation and host fallback,
* an asynchronous double-buffered snapshot writer (bounded-queue
  background IO thread).

``load()`` builds the library on demand with make; every consumer guards
with ``available()`` and falls back to the NumPy oracle if the toolchain
is missing.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libnjw_host.so"))

_lib: Optional[ctypes.CDLL] = None
_load_error: Optional[str] = None

_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                       check=True, capture_output=True, timeout=300)
        return True
    except Exception as e:  # noqa: BLE001
        global _load_error
        _load_error = f"build failed: {e}"
        return False


def load() -> Optional[ctypes.CDLL]:
    global _lib, _load_error
    if _lib is not None:
        return _lib
    # Always run make: it is a no-op when the .so is newer than the
    # sources, and it guarantees we never load a stale or foreign-built
    # (-march=native elsewhere) binary (ADVICE r1).
    if not _build() and not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        _load_error = str(e)
        return None

    lib.swe_tendencies.argtypes = [_f32p] * 6 + [
        ctypes.c_int32, ctypes.c_int32,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float]
    lib.swe_rk4_step.argtypes = [_f32p] * 4 + [
        ctypes.c_int32, ctypes.c_int32, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_float]
    lib.nbody_accelerations.argtypes = [
        _f32p, _f32p, _f32p, ctypes.c_int32, ctypes.c_float, ctypes.c_float]
    lib.lj_forces.argtypes = [
        _f32p, _f32p, ctypes.c_int32, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, _f32p]
    lib.fir_filter.argtypes = [
        _f32p, _f32p, _f32p, ctypes.c_int64, ctypes.c_int32]
    lib.omp_thread_count.restype = ctypes.c_int32

    lib.snapshot_writer_create.restype = ctypes.c_void_p
    lib.snapshot_writer_create.argtypes = [ctypes.c_int64]
    lib.snapshot_writer_enqueue.restype = ctypes.c_int32
    lib.snapshot_writer_enqueue.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, _f32p, ctypes.c_int64,
        ctypes.c_int64]
    lib.snapshot_writer_flush.argtypes = [ctypes.c_void_p]
    lib.snapshot_writer_written.restype = ctypes.c_int64
    lib.snapshot_writer_written.argtypes = [ctypes.c_void_p]
    lib.snapshot_writer_destroy.argtypes = [ctypes.c_void_p]

    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


def load_error() -> Optional[str]:
    return _load_error


# ---------------------------------------------------------------------------
# High-level wrappers
# ---------------------------------------------------------------------------

def swe_rk4_run(u, v, h, *, dt: float, n_steps: int, dx: float = 1.0,
                dy: float = 1.0, gravity: float = 9.81,
                coriolis_f: float = 0.0):
    """Run n_steps of RK4 SWE on the native OpenMP core (periodic BC).
    Returns new (u, v, h) float32 arrays."""
    lib = load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_load_error}")
    u = np.ascontiguousarray(u, np.float32).copy()
    v = np.ascontiguousarray(v, np.float32).copy()
    h = np.ascontiguousarray(h, np.float32).copy()
    ny, nx = u.shape
    scratch = np.empty(12 * ny * nx, np.float32)
    for _ in range(n_steps):
        lib.swe_rk4_step(u.ravel(), v.ravel(), h.ravel(), scratch,
                         ny, nx, dx, dy, gravity, coriolis_f, dt)
    return u, v, h


def nbody_accelerations(pos, mass, G: float = 1.0,
                        softening: float = 1e-6) -> np.ndarray:
    lib = load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_load_error}")
    pos = np.ascontiguousarray(pos, np.float32)
    mass = np.ascontiguousarray(mass, np.float32)
    acc = np.empty_like(pos)
    lib.nbody_accelerations(pos.ravel(), mass, acc.ravel(),
                            pos.shape[0], G, softening)
    return acc


def lj_forces(pos, box, epsilon: float = 1.0, sigma: float = 1.0,
              cutoff: float = 2.5) -> np.ndarray:
    lib = load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_load_error}")
    pos = np.ascontiguousarray(pos, np.float32)
    box = np.ascontiguousarray(box, np.float32)
    force = np.empty_like(pos)
    lib.lj_forces(pos.ravel(), force.ravel(), pos.shape[0],
                  epsilon, sigma, cutoff, box)
    return force


def fir_filter(x, taps) -> np.ndarray:
    lib = load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_load_error}")
    x = np.ascontiguousarray(x, np.float32)
    taps = np.ascontiguousarray(taps, np.float32)
    y = np.empty_like(x)
    lib.fir_filter(x, taps, y, x.shape[0], taps.shape[0])
    return y


class AsyncSnapshotWriter:
    """Bounded-queue background snapshot writer (native thread)."""

    def __init__(self, max_queue: int = 4):
        lib = load()
        if lib is None:
            raise RuntimeError(f"native library unavailable: {_load_error}")
        self._lib = lib
        self._handle = lib.snapshot_writer_create(max_queue)

    def enqueue(self, path: str, data, step: int = 0) -> bool:
        arr = np.ascontiguousarray(data, np.float32).ravel()
        return bool(self._lib.snapshot_writer_enqueue(
            self._handle, path.encode(), arr, arr.size, step))

    def flush(self):
        self._lib.snapshot_writer_flush(self._handle)

    @property
    def written(self) -> int:
        return int(self._lib.snapshot_writer_written(self._handle))

    def close(self):
        if self._handle:
            self._lib.snapshot_writer_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    @staticmethod
    def read_snapshot(path: str):
        """Read back a snapshot file -> (step, float32 array)."""
        with open(path, "rb") as fh:
            header = np.fromfile(fh, np.int64, 2)
            data = np.fromfile(fh, np.float32, int(header[1]))
        return int(header[0]), data
