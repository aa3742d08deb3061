"""Device memory manager.

TPU-native role of the reference's MemoryManager singleton (device
alloc/free, H2D/D2H/D2D, stream create/sync — ref: medical
gpu_adaptability.cpp:852-1013 and DeviceImage RAII :1018-1163). XLA owns
allocation, so the useful surface is: tracked named buffers, placement
(device / sharding), async transfer handles, and memory statistics.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np


class TransferHandle:
    """Async H2D/D2H handle: jax transfers are async by construction;
    wait() blocks until materialized (stream-sync analog)."""

    def __init__(self, value):
        self.value = value

    def wait(self):
        jax.block_until_ready(self.value)
        return self.value

    @property
    def ready(self) -> bool:
        try:
            # jax arrays expose is_ready(); host values are always ready
            return bool(getattr(self.value, "is_ready", lambda: True)())
        except Exception:  # noqa: BLE001
            return True


class DeviceMemoryManager:
    """Named device-buffer registry with placement + stats."""

    def __init__(self, device: Optional[Any] = None):
        self.device = device or jax.devices()[0]
        self._buffers: dict[str, Any] = {}

    # -- transfers -------------------------------------------------------
    def to_device(self, name: str, host_array, sharding=None) -> TransferHandle:
        """H2D (ref: MemoryManager::copyHostToDevice)."""
        target = sharding if sharding is not None else self.device
        buf = jax.device_put(np.asarray(host_array), target)
        self._buffers[name] = buf
        return TransferHandle(buf)

    def to_host(self, name: str) -> TransferHandle:
        """D2H (ref: copyDeviceToHost)."""
        return TransferHandle(np.asarray(self._buffers[name]))

    def copy(self, src: str, dst: str) -> TransferHandle:
        """D2D (ref: copyDeviceToDevice)."""
        buf = jax.device_put(self._buffers[src], self.device)
        self._buffers[dst] = buf
        return TransferHandle(buf)

    # -- registry --------------------------------------------------------
    def get(self, name: str):
        return self._buffers[name]

    def free(self, name: str):
        buf = self._buffers.pop(name, None)
        if buf is not None and hasattr(buf, "delete"):
            try:
                buf.delete()
            except Exception:  # noqa: BLE001 — already donated/deleted
                pass

    def free_all(self):
        for name in list(self._buffers):
            self.free(name)

    @property
    def allocated_bytes(self) -> int:
        total = 0
        for buf in self._buffers.values():
            if hasattr(buf, "nbytes"):
                total += int(buf.nbytes)
        return total

    def memory_stats(self) -> dict:
        """Device-level stats where the backend exposes them."""
        stats = {}
        try:
            stats = dict(self.device.memory_stats() or {})
        except Exception:  # noqa: BLE001 — CPU backend has none
            pass
        stats["tracked_buffers"] = len(self._buffers)
        stats["tracked_bytes"] = self.allocated_bytes
        return stats

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.free_all()
