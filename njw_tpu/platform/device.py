"""The platform layer: device detection, roofline constants, mesh topology.

ONE module replaces the reference's six near-identical per-workload "GPU
adaptability" stacks (ref: weather gpu_adaptability.hpp:35-237; medical
gpu_adaptability.hpp:37-95; nbody device_adaptor.hpp:21; signal
device_detection.h:54-143; geospatial gpu_adaptability.hpp:22-47; MD
common.hpp:203) — the SURVEY §1 cross-cutting observation.

What survives the translation:
* device detection        -> jax.devices() + device_kind parsing
* theoretical-bandwidth   -> per-generation HBM GB/s table (the roofline
  table (ref: device_detection.h:90-110)    denominator for the >=70% SoL target)
* per-device launch params -> per-generation Pallas block-shape table
  (ref: gpu_adaptability.cpp:154-346)
* hybrid CPU/GPU split    -> dropped; multi-chip SPMD over a Mesh instead
  (ref: gpu_adaptability.cpp:594-717)
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional

import jax
import numpy as np


@dataclasses.dataclass(frozen=True)
class DeviceCaps:
    """TPU analog of the reference DeviceCapabilities struct
    (ref: weather gpu_adaptability.hpp:35-88, signal device_detection.h:54-113)."""

    platform: str            # 'tpu' | 'cpu' | 'gpu'
    generation: str          # 'v4' | 'v5e' | 'v5p' | 'v6e' | 'cpu' | ...
    num_devices: int
    hbm_gb: float            # per-chip HBM capacity
    hbm_bandwidth_gbps: float  # per-chip HBM bandwidth (roofline denominator)
    vmem_bytes: int          # conservative per-kernel VMEM working budget
    vmem_physical_bytes: int  # physical per-core VMEM (scoped-cap ceiling)
    peak_bf16_tflops: float  # MXU peak (per chip)
    ici_bandwidth_gbps: float  # per-link ICI bandwidth (0 for CPU)

    @property
    def is_tpu(self) -> bool:
        return self.platform == "tpu"


# Per-generation constants (public figures; the analog of the reference's
# per-device bandwidth table, ref: device_detection.h:90-110).
_TPU_TABLE = {
    #  gen     hbm_gb  bw_gbps  vmem-budget  vmem-phys   bf16_tflops  ici_gbps
    # vmem-budget is the conservative default working set (Mosaic's 16M
    # scoped-vmem default); vmem-phys is the physical per-core VMEM a
    # kernel may raise its scoped cap toward (128 MiB on v4+ cores).
    "v2": (8.0, 700.0, 16 << 20, 16 << 20, 46.0, 100.0),
    "v3": (16.0, 900.0, 16 << 20, 16 << 20, 123.0, 100.0),
    "v4": (32.0, 1228.0, 16 << 20, 128 << 20, 275.0, 100.0),
    "v5e": (16.0, 819.0, 16 << 20, 128 << 20, 197.0, 200.0),
    "v5p": (95.0, 2765.0, 16 << 20, 128 << 20, 459.0, 200.0),
    "v6e": (32.0, 1640.0, 16 << 20, 128 << 20, 918.0, 200.0),
}


def _parse_generation(device_kind: str) -> str:
    dk = device_kind.lower()
    # device_kind strings look like 'TPU v4', 'TPU v5 lite', 'TPU v5p', ...
    if "v6" in dk:
        return "v6e"
    if "v5" in dk:
        return "v5e" if ("lite" in dk or "v5e" in dk) else "v5p"
    if "v4" in dk:
        return "v4"
    if "v3" in dk:
        return "v3"
    if "v2" in dk:
        return "v2"
    return "v5e"  # conservative default


@functools.lru_cache(maxsize=None)
def detect(backend: Optional[str] = None) -> DeviceCaps:
    """Probe jax.devices() once (analog of AdaptiveKernelManager::initialize
    device probing, ref: gpu_adaptability.cpp:39-150)."""
    try:
        devs = jax.devices(backend) if backend else jax.devices()
    except RuntimeError:
        devs = jax.devices("cpu")
    d0 = devs[0]
    if d0.platform == "tpu":
        gen = _parse_generation(getattr(d0, "device_kind", ""))
        hbm, bw, vmem, vphys, tflops, ici = _TPU_TABLE[gen]
        return DeviceCaps(
            platform="tpu", generation=gen, num_devices=len(devs),
            hbm_gb=hbm, hbm_bandwidth_gbps=bw, vmem_bytes=vmem,
            vmem_physical_bytes=vphys,
            peak_bf16_tflops=tflops, ici_bandwidth_gbps=ici,
        )
    # CPU (tests / oracle runs): nominal numbers, roofline is meaningless.
    return DeviceCaps(
        platform=d0.platform, generation="cpu", num_devices=len(devs),
        hbm_gb=0.0, hbm_bandwidth_gbps=50.0, vmem_bytes=16 << 20,
        vmem_physical_bytes=128 << 20,
        peak_bf16_tflops=1.0, ici_bandwidth_gbps=0.0,
    )


def tpu_generation() -> str:
    return detect().generation


def hbm_bandwidth_gbps() -> float:
    return detect().hbm_bandwidth_gbps


# ---------------------------------------------------------------------------
# Block-shape selection for stencil kernels. The analog of the reference's
# per-device tuned launch-param tables (ref: gpu_adaptability.cpp:154-346,
# block sizes {16x16, 8x8, 32x8} per SM) — but ONE table keyed by TPU
# generation, with VMEM-budget-derived defaults instead of a variant zoo.
# ---------------------------------------------------------------------------

def stencil_block_shape(
    ny: int, nx: int, n_fields: int = 3, dtype_bytes: int = 4,
    caps: Optional[DeviceCaps] = None,
) -> tuple[int, int]:
    """Pick a (by, bx) VMEM block for a fused stencil over n_fields.

    Constraints: bx multiple of 128 (lanes), by multiple of 8 (f32
    sublanes); roughly 2*(n_fields in + n_fields out) buffers plus halo
    staging must fit the VMEM budget with double buffering.
    """
    caps = caps or detect()
    budget = int(caps.vmem_bytes * 0.6)  # leave headroom for Mosaic
    # bytes per block ~ 2(double-buffer) * 2(in+out) * n_fields * by*bx*dtype
    per_point = 4 * n_fields * dtype_bytes
    max_points = max(budget // per_point, 8 * 128)
    bx = min(_round_down_pow2_mult(nx, 128), 1024)
    by = max_points // bx
    by = min(_round_down_pow2_mult(ny, 8), _floor_mult(by, 8))
    by = max(by, 8)
    return (by, bx)


def _floor_mult(x: int, m: int) -> int:
    return max((x // m) * m, m)


def _round_down_pow2_mult(x: int, m: int) -> int:
    """Largest multiple of m that divides x if possible, else min(x,m)."""
    if x % m == 0:
        return min(x, 4096)
    return m


def is_tpu_available() -> bool:
    """ref: is_cuda_available, python/weather_simulation.py:471."""
    return detect().is_tpu


def get_device_info() -> dict:
    """ref: get_device_info, python/weather_simulation.py:483-520 and
    molecular_dynamics.py:338-365."""
    caps = detect()
    return {
        "platform": caps.platform,
        "generation": caps.generation,
        "num_devices": caps.num_devices,
        "hbm_gb": caps.hbm_gb,
        "hbm_bandwidth_gbps": caps.hbm_bandwidth_gbps,
        "vmem_bytes": caps.vmem_bytes,
        "peak_bf16_tflops": caps.peak_bf16_tflops,
        "ici_bandwidth_gbps": caps.ici_bandwidth_gbps,
    }


def default_mesh(shape: Optional[tuple[int, int]] = None,
                 axis_names: tuple[str, str] = ("x", "y")):
    """Build a 2-D device mesh for spatial domain decomposition.

    With n devices and no explicit shape, factor n as close to square as
    possible (e.g. 8 -> 4x2). This is the scaling layer the reference never
    had (SURVEY §5.8); meshes feed shard_map/pjit in njw_tpu.parallel.
    """
    devs = jax.devices()
    n = len(devs)
    if shape is None:
        a = int(math.sqrt(n))
        while n % a:
            a -= 1
        shape = (n // a, a)
    from jax.sharding import Mesh

    return Mesh(np.array(devs[: shape[0] * shape[1]]).reshape(shape), axis_names)
