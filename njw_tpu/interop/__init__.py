"""Cross-workload data transfer (the reference's missing module).

The reference *tests* src/integrations/common/ (shared_memory,
gpu_memory_manager, array_ops — tests/integrations/common/
test_shared_memory.py:24 imports it) but the module does not exist
anywhere in its tree (SURVEY §0.1). This package implements the
capability for real:

  shared_memory   cross-process zero-copy NumPy arrays
                  (multiprocessing.shared_memory)
  device_memory   device buffer manager: put/get with shardings, async
                  transfer handles, live-buffer tracking, memory stats
  array_ops       conversions between NumPy / JAX / torch-CPU +
                  chunked host<->device transfer
"""
from njw_tpu.interop.shared_memory import SharedArray, SharedMemoryManager
from njw_tpu.interop.device_memory import DeviceMemoryManager
from njw_tpu.interop.array_ops import (
    to_numpy, to_jax, to_torch, chunked_device_put, zero_copy_view,
)
