"""njw_tpu — a TPU-native scientific-computing framework.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
``scttfrdmn/nvidia-jetson-workload`` reference suite (CUDA/C++/pybind11,
see /root/reference): six scientific workloads (weather simulation, n-body,
molecular dynamics, medical imaging, signal processing, geospatial) plus a
geo-financial integration, a benchmark/cost-modeling layer, and shared
platform infrastructure.

Design principles (TPU-first, not a port):

* One platform layer (``njw_tpu.platform``) replaces the reference's six
  copy-pasted per-workload "GPU adaptability" stacks
  (ref: src/*/cpp/include/*/gpu_adaptability.hpp).
* Fused Pallas stencil kernels (``njw_tpu.ops``) replace the reference's
  SM-specialized tiled CUDA kernel zoo
  (ref: src/weather-sim/cpp/src/kernels/shallow_water_kernels.cu:50-603).
* SPMD over a ``jax.sharding.Mesh`` (``njw_tpu.parallel``) replaces the
  reference's hybrid CPU/GPU work splitting — and adds the multi-chip /
  multi-host scaling layer the reference never had.
* Device-resident state in ``lax.scan`` loops replaces the reference's
  per-step host<->device shuffling (ref: adaptive_kernels.cu:432-454).
"""

__version__ = "0.3.0"
