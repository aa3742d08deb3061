"""Distributed layer: 2-D domain decomposition over a device mesh.

This layer has NO reference counterpart — the reference is single-node,
single-GPU with zero collectives (SURVEY §5.8: no NCCL/MPI/Gloo anywhere).
It is mandated by BASELINE: 2-D multi-host domain decomposition with
ppermute halo exchange overlapped with interior compute.

Canonical mesh: ``Mesh(devices.reshape(py, px), ('y', 'x'))`` — axis 'y'
shards array rows (dim -2), axis 'x' shards columns (dim -1).
"""
from njw_tpu.parallel.halo import (
    halo_pad_2d, make_padded_shift_fn, sharded_swe_step, sharded_state,
)
