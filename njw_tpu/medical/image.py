"""MedicalImage container + IO.

ref: medical_imaging.hpp:193-231 (MedicalImage: 2D/3D/4D typed image with
file IO ctor) and enums :34-97. IO formats: .npy/.npz (native), .png via
matplotlib if available (no DICOM dependency in this image — the loader
raises a clear error for unsupported suffixes).
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
import jax.numpy as jnp
import numpy as np


@dataclass
class MedicalImage:
    data: jnp.ndarray                 # (H, W) | (D, H, W) | (T, D, H, W)
    spacing: tuple = (1.0, 1.0, 1.0)  # physical voxel spacing
    modality: str = "generic"         # CT | MRI | ...
    metadata: dict = field(default_factory=dict)

    @property
    def ndim(self) -> int:
        return self.data.ndim

    @property
    def shape(self):
        return self.data.shape

    def slice2d(self, index: int = 0) -> jnp.ndarray:
        if self.data.ndim == 2:
            return self.data
        return self.data.reshape((-1,) + self.data.shape[-2:])[index]

    def astype(self, dtype):
        return MedicalImage(self.data.astype(dtype), self.spacing,
                            self.modality, dict(self.metadata))

    def statistics(self) -> dict:
        a = np.asarray(self.data, np.float64)
        return {"min": float(a.min()), "max": float(a.max()),
                "mean": float(a.mean()), "std": float(a.std())}


def load_image(path: str, **kw) -> MedicalImage:
    """ref: python/medical_imaging/__init__.py load_image."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".npy":
        return MedicalImage(jnp.asarray(np.load(path)), **kw)
    if ext == ".npz":
        with np.load(path) as d:
            key = "data" if "data" in d else d.files[0]
            return MedicalImage(jnp.asarray(d[key]), **kw)
    if ext in (".png", ".jpg", ".jpeg"):
        import matplotlib.image as mpimg

        arr = mpimg.imread(path)
        if arr.ndim == 3:
            arr = arr[..., :3].mean(axis=-1)
        return MedicalImage(jnp.asarray(arr, jnp.float32), **kw)
    raise ValueError(f"unsupported image format {ext!r} (npy/npz/png)")


def save_image(path: str, image: MedicalImage | jnp.ndarray) -> str:
    """ref: python/medical_imaging/__init__.py save_image."""
    data = image.data if isinstance(image, MedicalImage) else image
    arr = np.asarray(data)
    ext = os.path.splitext(path)[1].lower()
    if ext == ".npy":
        np.save(path, arr)
    elif ext == ".npz":
        np.savez_compressed(path, data=arr)
    elif ext == ".png":
        import matplotlib.image as mpimg

        lo, hi = arr.min(), arr.max()
        norm = (arr - lo) / (hi - lo) if hi > lo else arr * 0
        mpimg.imsave(path, norm, cmap="gray")
    else:
        raise ValueError(f"unsupported image format {ext!r}")
    return path
