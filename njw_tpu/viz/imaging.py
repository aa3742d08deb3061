"""Medical-imaging visualization (ref: src/medical-imaging/python/
visualization.py, 431 LoC: image display, sinogram, comparisons)."""
from __future__ import annotations

from typing import Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def show_image(image, title: str = "image", cmap: str = "gray",
               path: Optional[str] = None):
    fig, ax = plt.subplots(figsize=(4.5, 4.5))
    im = ax.imshow(np.asarray(image), cmap=cmap)
    fig.colorbar(im, ax=ax)
    ax.set_title(title)
    ax.axis("off")
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
        plt.close(fig)
    return fig


def show_sinogram(sinogram, path: Optional[str] = None):
    fig, ax = plt.subplots(figsize=(5, 4))
    im = ax.imshow(np.asarray(sinogram), aspect="auto", cmap="magma")
    fig.colorbar(im, ax=ax)
    ax.set_xlabel("detector")
    ax.set_ylabel("angle")
    ax.set_title("sinogram")
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
        plt.close(fig)
    return fig


def compare_images(images: dict, cmap: str = "gray",
                   path: Optional[str] = None):
    """Side-by-side panels: name -> 2-D array."""
    n = len(images)
    fig, axes = plt.subplots(1, n, figsize=(3.2 * n, 3.4))
    if n == 1:
        axes = [axes]
    for ax, (name, img) in zip(axes, images.items()):
        ax.imshow(np.asarray(img), cmap=cmap)
        ax.set_title(name)
        ax.axis("off")
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
        plt.close(fig)
    return fig
