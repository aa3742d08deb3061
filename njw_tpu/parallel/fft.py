"""Distributed 2-D FFT and Poisson solve via all-to-all transposes.

The stencil-world analog of tensor-parallel all-to-all (SURVEY §2.10): for
a row-sharded domain (mesh axis 'y' over array rows), each chip FFTs its
local rows along x, the array is transposed across chips with a single
all-to-all, the second FFT runs along (now-local) y, and the spectral
multiply happens in the transposed layout. One more all-to-all brings the
result home:

  rows (y-sharded) --fft_x--> all_to_all --> cols (x-sharded) --fft_y-->
  multiply(symbol) --ifft_y--> all_to_all --> --ifft_x--> rows

Used by the multi-chip barotropic core (streamfunction inversion) and
semi-implicit SWE. The reference has no counterpart (no distributed
anything, SURVEY §5.8).
"""
from __future__ import annotations

from typing import Callable, Sequence, Union

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from njw_tpu.ops.spectral import _fd_wavenumbers_np

AxisName = Union[str, Sequence[str]]


def _local_transpose_fwd(block, axis_name: str):
    """(ny_loc, nx) y-sharded block -> (nx_loc, ny) x-sharded block.

    all_to_all splits axis 1 (x) across devices and concatenates axis 0
    (y), then a local transpose orders it as (nx_loc, ny).
    """
    n = lax.axis_size(axis_name)
    if n == 1:
        return block.T
    # split x into n chunks -> (ny_loc, n, nx/n); all_to_all over chunk dim
    ny_loc, nx = block.shape
    parts = block.reshape(ny_loc, n, nx // n)
    # after all_to_all: dim 1 indexes the source device (y block)
    swapped = lax.all_to_all(parts, axis_name, split_axis=1, concat_axis=1,
                             tiled=False)
    # swapped: (ny_loc, n, nx/n) where dim1 = original y-block index
    out = jnp.transpose(swapped, (2, 1, 0)).reshape(nx // n, n * ny_loc)
    return out


def _local_transpose_bwd(block, axis_name: str):
    """Inverse of _local_transpose_fwd: (nx_loc, ny) -> (ny_loc, nx)."""
    n = lax.axis_size(axis_name)
    if n == 1:
        return block.T
    nx_loc, ny = block.shape
    parts = jnp.transpose(
        block.reshape(nx_loc, n, ny // n), (2, 1, 0))  # (ny/n, n, nx_loc)
    swapped = lax.all_to_all(parts, axis_name, split_axis=1, concat_axis=1,
                             tiled=False)
    return swapped.reshape(ny // n, n * nx_loc)


def spectral_apply_distributed(
    f_local: jnp.ndarray, symbol_fn: Callable, axis_name: str = "y",
):
    """Apply a diagonal spectral operator to a row-sharded real field.

    symbol_fn(ky_local, kx) -> multiplier over the (nx_loc, ny)-transposed
    spectral block, where kx spans the full x spectrum (local axis 1 holds
    full y after transpose... see layout notes inside). Must be called
    inside shard_map over a 1-D ('y',) mesh axis.
    """
    ny_loc, nx = f_local.shape
    n = lax.axis_size(axis_name)
    ny = ny_loc * n

    # FFT along x (fully local)
    fx = jnp.fft.fft(f_local, axis=1)
    # transpose: x becomes sharded, y becomes local
    ft = _local_transpose_fwd(fx, axis_name)          # (nx_loc, ny) complex
    # FFT along y (now local, axis 1)
    ft = jnp.fft.fft(ft, axis=1)

    # wavenumbers: rows are x-frequencies owned by this shard
    idx = lax.axis_index(axis_name)
    nx_loc = nx // n
    kx_all = jnp.asarray(_fd_wavenumbers_np(nx, 1.0, "spectral"))
    kx_local = lax.dynamic_slice_in_dim(kx_all, idx * nx_loc, nx_loc)
    ky = jnp.asarray(_fd_wavenumbers_np(ny, 1.0, "spectral"))
    ft = ft * symbol_fn(kx_local[:, None], ky[None, :])

    # inverse: ifft_y, transpose back, ifft_x
    ft = jnp.fft.ifft(ft, axis=1)
    fx = _local_transpose_bwd(ft, axis_name)
    return jnp.real(jnp.fft.ifft(fx, axis=1))


def distributed_poisson_solve(
    f_local: jnp.ndarray, dx: float, dy: float, axis_name: str = "y",
    kind: str = "laplacian5",
):
    """Row-sharded Poisson solve matching ops.spectral.poisson_solve.

    Must run inside shard_map over a ('y',) mesh. Zero-mean gauge.
    """
    ny_loc, nx = f_local.shape
    n = lax.axis_size(axis_name)
    ny = ny_loc * n
    nx_loc = nx // n

    kx2_all = jnp.asarray(_fd_wavenumbers_np(nx, dx, kind))
    ky2 = jnp.asarray(_fd_wavenumbers_np(ny, dy, kind))
    if kind != "laplacian5":
        kx2_all = kx2_all * kx2_all
        ky2 = ky2 * ky2
    idx = lax.axis_index(axis_name)

    def symbol(kx_loc_unused, ky_unused):
        kx2 = lax.dynamic_slice_in_dim(kx2_all, idx * nx_loc, nx_loc)
        denom = -(kx2[:, None] + ky2[None, :])
        # k=0 mode lives on shard 0, row 0, col 0: zero it (gauge)
        safe = jnp.where(denom == 0.0, 1.0, denom)
        inv = 1.0 / safe
        return jnp.where(denom == 0.0, 0.0, inv)

    return spectral_apply_distributed(f_local, symbol, axis_name)


def make_distributed_poisson(mesh: Mesh, ny: int, nx: int, dx: float,
                             dy: float, kind: str = "laplacian5"):
    """Jitted whole-array Poisson solve sharded over mesh axis 'y'."""
    n = mesh.devices.size

    def local(f):
        return distributed_poisson_solve(f, dx, dy, "y", kind)

    fn = jax.shard_map(local, mesh=mesh, in_specs=P("y", None),
                       out_specs=P("y", None), check_vma=False)
    return jax.jit(fn)


# ---------------------------------------------------------------------------
# 2-D mesh ('y','x') generalization: pencil decomposition
# ---------------------------------------------------------------------------
#
# On a py*px mesh the local block is (ny/py, nx/px): x is sharded, so the
# first FFT cannot run locally. One all-to-all along the 'x' ring trades
# rows for columns ("pencils"): device (iy, ix) ends up with the full x
# extent of rows [(iy*px + ix) * ny/(py*px), ...) — a pure row
# decomposition over the *combined* ('y','x') axis (row-major flattened
# index iy*px + ix, exactly lax.axis_index(('y','x'))). The proven 1-D
# transpose-FFT core then runs unchanged over the combined axis, and a
# final all-to-all puts the result back in the 2-D block layout. Total
# collective cost: 2 extra all-to-alls over the 'x' subring on top of the
# 1-D scheme's 2 combined-axis all-to-alls.


def _pencilize(block: jnp.ndarray, x_axis: str = "x") -> jnp.ndarray:
    """(ny_loc, nx_loc) 2-D-sharded block -> (ny_loc/px, nx) x-local pencil.

    Must run inside shard_map over a mesh that includes `x_axis`. Rows of
    the pencil are globally ordered by the combined row-block index
    iy*px + ix.
    """
    px = lax.axis_size(x_axis)
    if px == 1:
        return block
    ny_loc, nx_loc = block.shape
    if ny_loc % px:
        raise ValueError(
            f"x-ring size {px} must divide the local rows {ny_loc}")
    parts = block.reshape(px, ny_loc // px, nx_loc)
    # split_axis=0 scatters row-part j to x-neighbor j; received parts
    # stack at axis 1 = column chunks in source order -> full x extent.
    sw = lax.all_to_all(parts, x_axis, split_axis=0, concat_axis=1,
                        tiled=False)                  # (ny_pen, px, nx_loc)
    return sw.reshape(ny_loc // px, px * nx_loc)


def _unpencilize(pencil: jnp.ndarray, x_axis: str = "x") -> jnp.ndarray:
    """Inverse of _pencilize: (ny_pen, nx) -> (ny_loc, nx_loc)."""
    px = lax.axis_size(x_axis)
    if px == 1:
        return pencil
    ny_pen, nx = pencil.shape
    parts = pencil.reshape(ny_pen, px, nx // px)
    sw = lax.all_to_all(parts, x_axis, split_axis=1, concat_axis=0,
                        tiled=False)                  # (px, ny_pen, nx_loc)
    return sw.reshape(px * ny_pen, nx // px)


def spectral_apply_distributed_2d(
    f_local: jnp.ndarray, symbol_fn: Callable, y_axis: str = "y",
    x_axis: str = "x",
):
    """2-D-mesh version of spectral_apply_distributed.

    Must be called inside shard_map over a ('y','x') mesh with the field
    sharded on both trailing dims. Pencil-izes along the x ring, runs the
    1-D transpose-FFT core over the combined ('y','x') axis, and restores
    the block layout.
    """
    pencil = _pencilize(f_local, x_axis)
    out = spectral_apply_distributed(pencil, symbol_fn, (y_axis, x_axis))
    return _unpencilize(out, x_axis)


def distributed_poisson_solve_2d(
    f_local: jnp.ndarray, dx: float, dy: float, y_axis: str = "y",
    x_axis: str = "x", kind: str = "laplacian5",
):
    """2-D-block-sharded Poisson solve matching ops.spectral.poisson_solve.

    Must run inside shard_map over a ('y','x') mesh. Zero-mean gauge.
    """
    pencil = _pencilize(f_local, x_axis)
    out = distributed_poisson_solve(pencil, dx, dy, (y_axis, x_axis), kind)
    return _unpencilize(out, x_axis)


def make_distributed_poisson_2d(mesh: Mesh, ny: int, nx: int, dx: float,
                                dy: float, kind: str = "laplacian5"):
    """Jitted whole-array Poisson solve sharded over a ('y','x') mesh."""
    py = mesh.shape["y"]
    px = mesh.shape["x"]
    n = py * px
    if ny % (py * px) or (ny // py) % px:
        raise ValueError(f"ny={ny} must divide py*px={n} with local rows "
                         f"divisible by px={px}")
    if nx % n:
        raise ValueError(f"nx={nx} must divide the total device count {n} "
                         "(the transpose FFT re-shards x)")

    def local(f):
        return distributed_poisson_solve_2d(f, dx, dy, "y", "x", kind)

    fn = jax.shard_map(local, mesh=mesh, in_specs=P("y", "x"),
                       out_specs=P("y", "x"), check_vma=False)
    return jax.jit(fn)
