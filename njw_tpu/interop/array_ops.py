"""Array conversion + transfer ops between NumPy / JAX / torch(CPU).

ref role: src/integrations/common array_ops (tested but absent in the
reference, SURVEY §0.1) and the DomainMapper/Connector patterns
(docs/integration_patterns.md:52-443).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def to_numpy(a: Any) -> np.ndarray:
    """Any array-like (jax / torch / numpy / nested list) -> np.ndarray."""
    if isinstance(a, np.ndarray):
        return a
    if hasattr(a, "detach"):          # torch tensor
        return a.detach().cpu().numpy()
    return np.asarray(a)


def to_jax(a: Any, dtype=None, sharding=None) -> jax.Array:
    arr = to_numpy(a)
    if dtype is not None:
        arr = arr.astype(dtype)
    if sharding is not None:
        return jax.device_put(arr, sharding)
    return jnp.asarray(arr)


def to_torch(a: Any):
    """-> torch CPU tensor (torch is CPU-only in this image)."""
    import torch

    return torch.from_numpy(np.ascontiguousarray(to_numpy(a)))


def zero_copy_view(a: Any) -> np.ndarray:
    """NumPy view without copying when the buffer protocol allows it
    (jax CPU arrays and torch CPU tensors support dlpack/buffer)."""
    if isinstance(a, np.ndarray):
        return a
    if hasattr(a, "numpy"):  # torch
        return a.numpy()
    try:
        return np.from_dlpack(a)
    except Exception:  # noqa: BLE001 — fall back to a copy
        return np.asarray(a)


def chunked_device_put(host_array, chunk_bytes: int = 64 << 20,
                       sharding=None) -> jax.Array:
    """Transfer a large host array to device in bounded chunks along axis
    0, then concatenate on device — bounds peak host pinned memory (the
    role of the reference's staged H2D copies)."""
    arr = to_numpy(host_array)
    if arr.nbytes <= chunk_bytes or arr.ndim == 0 or arr.shape[0] <= 1:
        return to_jax(arr, sharding=sharding)
    rows_per_chunk = max(int(chunk_bytes // max(arr[0:1].nbytes, 1)), 1)
    parts = [
        jax.device_put(arr[i: i + rows_per_chunk])
        for i in range(0, arr.shape[0], rows_per_chunk)
    ]
    out = jnp.concatenate(parts, axis=0)
    if sharding is not None:
        out = jax.device_put(out, sharding)
    return out
