"""Checkpoint / restore for simulation state.

The recovery primitive of the framework (SURVEY §5.4): the reference has
npz save/load for n-body (ref: src/nbody_sim/python/simulation.py:157-190)
and MD (ref: molecular_dynamics.py:322-330) but NO weather resume at all.
Here every workload checkpoints through one API:

    save_checkpoint(path, state, step=..., time=..., extra={...})
    state, meta = load_checkpoint(path, like=state_template)

Format: a single .npz (compressed) with the flattened pytree leaves +
a JSON metadata entry holding the treedef, step/time, and user extras.
Sharded arrays are gathered to host before writing; on restore the caller
re-shards (njw_tpu.parallel.halo.sharded_state). For multi-host runs each
process saves its addressable shards under path.<proc>; v1 targets the
single-controller case.
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np


def save_checkpoint(path: str, state: Any, *, step: int = 0,
                    time: float = 0.0, extra: Optional[dict] = None) -> str:
    """Write state pytree + metadata to ``path`` (.npz appended if absent)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    meta = {
        "version": 1,
        "step": int(step),
        "time": float(time),
        "n_leaves": len(leaves),
        "treedef": str(treedef),
        "extra": extra or {},
    }
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as fh:
        np.savez_compressed(fh, __meta__=json.dumps(meta), **arrays)
    os.replace(tmp, path)  # atomic: no torn checkpoints on crash
    return path


def load_checkpoint(path: str, like: Any = None):
    """Read a checkpoint. If ``like`` (a pytree template) is given, leaves
    are unflattened into its structure; otherwise a list of arrays is
    returned. Returns (state, meta)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path, allow_pickle=False) as data:
        meta = json.loads(str(data["__meta__"]))
        leaves = [data[f"leaf_{i}"] for i in range(meta["n_leaves"])]
    if like is not None:
        treedef = jax.tree.structure(like)
        if treedef.num_leaves != len(leaves):
            raise ValueError(
                f"checkpoint has {len(leaves)} leaves, template has "
                f"{treedef.num_leaves}"
            )
        state = jax.tree.unflatten(treedef, leaves)
    else:
        state = leaves
    return state, meta


def save_checkpoint_orbax(path: str, state: Any, *, step: int = 0,
                          time: float = 0.0,
                          extra: Optional[dict] = None) -> str:
    """Multi-host-safe checkpoint via orbax: each process writes its
    addressable shards (no host gather — the npz path gathers and is
    single-controller only). Use for sharded states on pods."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"state": state}, force=True)
    ckptr.wait_until_finished()
    # metadata sidecar (strings are not a StandardCheckpointer leaf type)
    if jax.process_index() == 0:
        with open(os.path.join(path, "njw_meta.json"), "w") as fh:
            json.dump({"step": int(step), "time": float(time),
                       "extra": extra or {}}, fh)
    return path


def load_checkpoint_orbax(path: str, like: Any):
    """Restore an orbax checkpoint into the structure (and shardings) of
    ``like``. Returns (state, meta)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    out = ckptr.restore(path, {"state": like})
    meta_path = os.path.join(path, "njw_meta.json")
    meta = {"step": 0, "time": 0.0, "extra": {}}
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
    return out["state"], meta


def save_simulation(path: str, sim) -> str:
    """Checkpoint a njw_tpu.weather Simulation (state + step counter +
    config snapshot)."""
    import dataclasses

    extra = {}
    cfg = getattr(sim, "config", None)
    if cfg is not None:
        extra["config"] = dataclasses.asdict(cfg)
    return save_checkpoint(path, sim.state, step=sim.step_count,
                           time=sim.time, extra=extra)


def restore_simulation(path: str, sim):
    """Restore state/step/time into an existing Simulation (built with a
    matching config). Returns the simulation."""
    state, meta = load_checkpoint(path, like=sim.state)
    sim.state = jax.tree.map(jax.numpy.asarray, state)
    sim.step_count = meta["step"]
    sim.time = meta["time"]
    sim._carry = sim.stepper.init(sim.state)
    return sim
