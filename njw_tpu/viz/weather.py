"""Weather visualization (ref: src/weather-sim/python/visualization/
visualization.py — visualize_field :31, visualize_velocity :93 (quiver +
streamlines), visualize_vorticity :175, visualize_height :209,
animate_simulation :283, plot_performance :405)."""
from __future__ import annotations

from typing import Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def _finish(fig, path: Optional[str]):
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
        plt.close(fig)
    return fig


def visualize_field(field, title: str = "field", cmap: str = "viridis",
                    path: Optional[str] = None):
    """ref :31."""
    fig, ax = plt.subplots(figsize=(5, 4))
    im = ax.imshow(np.asarray(field), origin="lower", cmap=cmap)
    fig.colorbar(im, ax=ax)
    ax.set_title(title)
    return _finish(fig, path)


def visualize_velocity(u, v, mode: str = "quiver", stride: int = 8,
                       path: Optional[str] = None):
    """Quiver or streamline plot (ref :93)."""
    u = np.asarray(u)
    v = np.asarray(v)
    ny, nx = u.shape
    y, x = np.mgrid[0:ny, 0:nx]
    fig, ax = plt.subplots(figsize=(5, 4))
    if mode == "quiver":
        s = slice(None, None, stride)
        ax.quiver(x[s, s], y[s, s], u[s, s], v[s, s],
                  np.hypot(u, v)[s, s], cmap="coolwarm")
    elif mode == "streamlines":
        ax.streamplot(x[0], y[:, 0], u, v, color=np.hypot(u, v),
                      cmap="coolwarm", density=1.2)
    else:
        raise ValueError(f"unknown velocity plot mode {mode!r}")
    ax.set_title(f"velocity ({mode})")
    return _finish(fig, path)


def visualize_vorticity(u, v, dx: float = 1.0, dy: float = 1.0,
                        path: Optional[str] = None):
    """ref :175."""
    from njw_tpu.weather.oracle import diagnostics_np

    vort, _ = diagnostics_np(np.asarray(u), np.asarray(v), dx=dx, dy=dy,
                             bc="clamped")
    lim = np.abs(vort).max() or 1.0
    fig, ax = plt.subplots(figsize=(5, 4))
    im = ax.imshow(vort, origin="lower", cmap="RdBu_r", vmin=-lim, vmax=lim)
    fig.colorbar(im, ax=ax)
    ax.set_title("vorticity")
    return _finish(fig, path)


def visualize_height(h, path: Optional[str] = None):
    """ref :209."""
    return visualize_field(h, "height", cmap="terrain", path=path)


def animate_simulation(snapshots, field: str = "h",
                       path: Optional[str] = None, fps: int = 10):
    """Write an animated GIF from Simulation.snapshots (ref :283)."""
    from matplotlib.animation import FuncAnimation, PillowWriter

    frames = [np.asarray(s[field]) for s in snapshots if field in s]
    if not frames:
        raise ValueError(f"no snapshots contain field {field!r}")
    fig, ax = plt.subplots(figsize=(5, 4))
    vmin = min(f.min() for f in frames)
    vmax = max(f.max() for f in frames)
    im = ax.imshow(frames[0], origin="lower", cmap="viridis",
                   vmin=vmin, vmax=vmax)
    fig.colorbar(im, ax=ax)

    def update(i):
        im.set_data(frames[i])
        ax.set_title(f"{field} @ step {snapshots[i].get('step', i)}")
        return (im,)

    anim = FuncAnimation(fig, update, frames=len(frames))
    if path:
        anim.save(path, writer=PillowWriter(fps=fps))
        plt.close(fig)
    return anim


def plot_performance(metrics: dict, path: Optional[str] = None):
    """Bar chart of the PerformanceMetrics dict (ref :405)."""
    keys = [k for k, v in metrics.items()
            if isinstance(v, (int, float)) and v > 0]
    fig, ax = plt.subplots(figsize=(6, 3.5))
    ax.bar(keys, [metrics[k] for k in keys], color="#4878cf")
    ax.set_yscale("log")
    plt.setp(ax.get_xticklabels(), rotation=25, ha="right")
    ax.set_title("performance metrics")
    return _finish(fig, path)
