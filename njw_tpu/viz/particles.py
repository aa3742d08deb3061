"""N-body / MD visualization (ref: src/nbody_sim viz usage +
src/molecular-dynamics/python/visualization.py)."""
from __future__ import annotations

from typing import Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def plot_particles_3d(positions, masses=None, title: str = "particles",
                      path: Optional[str] = None):
    pos = np.asarray(positions)
    fig = plt.figure(figsize=(5, 5))
    ax = fig.add_subplot(projection="3d")
    size = 4.0
    if masses is not None:
        m = np.asarray(masses)
        size = 2 + 30 * (m - m.min()) / max(m.max() - m.min(), 1e-12)
    ax.scatter(pos[:, 0], pos[:, 1], pos[:, 2], s=size, alpha=0.6)
    ax.set_title(title)
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
        plt.close(fig)
    return fig


def plot_energy_history(times, energies: dict,
                        path: Optional[str] = None):
    """energies: name -> series (e.g. kinetic/potential/total)."""
    fig, ax = plt.subplots(figsize=(6, 3.5))
    for name, series in energies.items():
        ax.plot(np.asarray(times), np.asarray(series), label=name)
    ax.set_xlabel("time")
    ax.set_ylabel("energy")
    ax.legend()
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
        plt.close(fig)
    return fig


def plot_trajectory(frames, particle_indices=None,
                    path: Optional[str] = None):
    """frames: list of (N, 3) position snapshots."""
    frames = [np.asarray(f) for f in frames]
    idx = particle_indices or range(min(16, frames[0].shape[0]))
    fig, ax = plt.subplots(figsize=(5, 5))
    for i in idx:
        xs = [f[i, 0] for f in frames]
        ys = [f[i, 1] for f in frames]
        ax.plot(xs, ys, lw=0.8, alpha=0.8)
    ax.set_title("trajectories (xy)")
    ax.set_aspect("equal")
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
        plt.close(fig)
    return fig

def plot_temperature(temperatures, times=None, target_temp=None,
                     path: Optional[str] = None):
    """Temperature-vs-time with an optional target line (ref:
    molecular-dynamics/python/visualization.py:327 temperature_plot)."""
    temp = np.asarray(temperatures, np.float64)
    t = np.asarray(times) if times is not None else np.arange(len(temp))
    fig, ax = plt.subplots(figsize=(6, 3.5))
    ax.plot(t, temp, color="#d65f5f", label="temperature")
    if target_temp is not None:
        ax.axhline(target_temp, color="#4878cf", linestyle="--",
                   label=f"target {target_temp:g} K")
    ax.set_xlabel("time")
    ax.set_ylabel("temperature (K)")
    ax.legend()
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
        plt.close(fig)
    return fig
