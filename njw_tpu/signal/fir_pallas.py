"""Fused batch-FIR Pallas kernel: one HBM read + one write.

The XLA banded-matmul FIR (filters._fir_apply_mxu) is correct but
traffic-bound on large batches: pad + frame + shifted-prev copies plus two
einsum reads move ~7x the operand size through HBM (measured 5.3 ms for
1000 x 100k — the reference's batch row, ref:
src/signal_processing/README.md:151). This kernel streams each (rows,
frames) block of x through VMEM exactly once: the frame/shift structure is
built in-register, and the convolution runs as banded MXU matmuls with an
explicit bf16 hi/lo split (3-pass, ~f32 accuracy), so the kernel's HBM
traffic is the floor: read x once, write y once.

Same math as filters.fir_apply: y[t] = sum_d h[d] x[t-d] with zero initial
state (causal) — the in-frame band H0 and previous-frame band H1 of
filters._fir_band_matrices. Replaces the reference's three CUDA FIR
kernels for the batched case (ref: filter_kernels.cu:77-170).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F = 128  # MXU lane width / frame size


def _split_hi_lo(a_f32):
    hi = a_f32.astype(jnp.bfloat16)
    lo = (a_f32 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _fir_batch_kernel(x_ref, tail_ref, h0hi_ref, h0lo_ref, h1hi_ref,
                      h1lo_ref, y_ref, *, n: int, bw: int, passes: int):
    j = pl.program_id(1)
    bm = x_ref.shape[0]
    nfb = bw // _F

    xb = x_ref[...]
    # zero the garbage tail of a partial final block (j*bw + col >= n):
    # H0's zero band would otherwise propagate NaN garbage into valid
    # columns of the same frame (0 * nan = nan).
    col = jax.lax.broadcasted_iota(jnp.int32, (bm, bw), 1)
    xb = jnp.where(col + j * bw < n, xb, 0.0)
    # previous 128 samples (last frame of block j-1); zeros for j == 0
    tail = jnp.where(j > 0, tail_ref[...], 0.0)

    x_hi, x_lo = _split_hi_lo(xb)
    t_hi, t_lo = _split_hi_lo(tail)

    def bands(xs, ts):
        frames = xs.reshape(bm, nfb, _F)
        prev = jnp.concatenate([ts[:, None, :], frames[:, :-1, :]], axis=1)
        return frames.reshape(bm * nfb, _F), prev.reshape(bm * nfb, _F)

    c_hi, p_hi = bands(x_hi, t_hi)
    dot = partial(jnp.dot, preferred_element_type=jnp.float32)
    y = dot(c_hi, h0hi_ref[...]) + dot(p_hi, h1hi_ref[...])
    if passes >= 2:
        c_lo, p_lo = bands(x_lo, t_lo)
        y += dot(c_lo, h0hi_ref[...]) + dot(p_lo, h1hi_ref[...])
    if passes >= 3:
        y += dot(c_hi, h0lo_ref[...]) + dot(p_hi, h1lo_ref[...])
    y_ref[...] = y.reshape(bm, bw)


@partial(jax.jit,
         static_argnames=("block_rows", "block_frames", "passes",
                          "interpret"))
def _fir_batch_call(x, h0, h1, block_rows: int, block_frames: int,
                    passes: int, interpret: bool):
    b, n = x.shape
    bm = block_rows
    bw = block_frames * _F
    grid = (pl.cdiv(b, bm), pl.cdiv(n, bw))

    h0hi, h0lo = _split_hi_lo(h0)
    h1hi, h1lo = _split_hi_lo(h1)

    hspec = pl.BlockSpec((_F, _F), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
    # tail block = the single 128-lane frame preceding block j; its block
    # index is in units of 128 lanes: j * block_frames - 1 (clamped; the
    # kernel zeroes it for j == 0).
    nfb = block_frames
    return pl.pallas_call(
        partial(_fir_batch_kernel, n=n, bw=bw, passes=passes),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bw), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, _F),
                         lambda i, j: (i, jnp.maximum(j * nfb - 1, 0)),
                         memory_space=pltpu.VMEM),
            hspec, hspec, hspec, hspec,
        ],
        out_specs=pl.BlockSpec((bm, bw), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, x, h0hi, h0lo, h1hi, h1lo)


def _fir_flat_kernel(x_ref, tail_ref, h0hi_ref, h0lo_ref, h1hi_ref,
                     h1lo_ref, y_ref, *, passes: int):
    i = pl.program_id(0)
    xb = x_ref[...]                                   # (bmf, 128) frames
    tail = jnp.where(i > 0, tail_ref[...], 0.0)[-1:, :]  # frame before blk

    x_hi, x_lo = _split_hi_lo(xb)
    t_hi, t_lo = _split_hi_lo(tail)
    p_hi = jnp.concatenate([t_hi, x_hi[:-1, :]], axis=0)
    dot = partial(jnp.dot, preferred_element_type=jnp.float32)
    y = dot(x_hi, h0hi_ref[...]) + dot(p_hi, h1hi_ref[...])
    if passes >= 2:
        p_lo = jnp.concatenate([t_lo, x_lo[:-1, :]], axis=0)
        y += dot(x_lo, h0hi_ref[...]) + dot(p_lo, h1hi_ref[...])
    if passes >= 3:
        y += dot(x_hi, h0lo_ref[...]) + dot(p_hi, h1lo_ref[...])
    y_ref[...] = y


@partial(jax.jit, static_argnames=("block_frames", "passes", "interpret"))
def _fir_flat_call(xf, h0, h1, block_frames: int, passes: int,
                   interpret: bool):
    """xf: (n_frames, 128) — the FREE row-major view of the flat stream.
    Frames are already sublane rows, so the banded matmuls run in native
    layout with NO in-kernel relayout (the (B, n)-blocked kernel spends
    ~40% of its time re-tiling lanes into frames)."""
    nf = xf.shape[0]
    bmf = block_frames
    h0hi, h0lo = _split_hi_lo(h0)
    h1hi, h1lo = _split_hi_lo(h1)
    hspec = pl.BlockSpec((_F, _F), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_fir_flat_kernel, passes=passes),
        out_shape=jax.ShapeDtypeStruct((nf, _F), jnp.float32),
        grid=(pl.cdiv(nf, bmf),),
        in_specs=[
            pl.BlockSpec((bmf, _F), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            # the 8-frame slab ending right before this block (min f32
            # sublane tile is 8); the kernel uses its last row only
            pl.BlockSpec((8, _F),
                         lambda i: (jnp.maximum(i * (bmf // 8) - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            hspec, hspec, hspec, hspec,
        ],
        out_specs=pl.BlockSpec((bmf, _F), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(xf, xf, h0hi, h0lo, h1hi, h1lo)


def fir_batch_pallas_flat(x, taps, *, block_frames: int = 4096,
                          passes: int = 3, interpret: bool = False):
    """Causal batch FIR via the flat-stream kernel. Requires
    (B * n) % 128 == 0 (e.g. the 1000 x 100k benchmark row). The (B, n)
    array is VIEWED as ((B*n)/128, 128) — a free row-major bitcast — and
    convolved as one continuous stream; the first taps-1 samples of each
    row (which wrongly see the previous row's tail) are then patched with
    a cheap (B, 128) framed-matmul pass."""
    from njw_tpu.signal.filters import _fir_apply_mxu, _fir_band_matrices

    x = jnp.asarray(x, jnp.float32)
    b, n = x.shape
    k = int(np.shape(taps)[0])
    if (b * n) % _F != 0:
        raise ValueError("flat kernel needs (B*n) % 128 == 0")
    if k > _F or n < 2 * _F:
        raise ValueError("taps must be <= 128 and n >= 256")
    h0, h1 = _fir_band_matrices(np.asarray(taps))
    h0j, h1j = jnp.asarray(h0), jnp.asarray(h1)
    xf = x.reshape(-1, _F)
    bf = min(block_frames, xf.shape[0])
    yf = _fir_flat_call(xf, h0j, h1j, bf, passes, interpret)
    y = yf.reshape(b, n)
    # patch the per-row heads: zero initial state instead of stream carry
    head = _fir_apply_mxu(x[:, :_F], h0j, h1j, mode="causal", k=k)
    return jax.lax.dynamic_update_slice(y, head[:, :k - 1], (0, 0))


def _fir_lanes_scratch_kernel(x_ref, hcat_hi_ref, hcat_lo_ref, y_ref,
                              carry_ref, *, n: int, bw: int, passes: int):
    """Lanes kernel with the previous-frame tail carried in VMEM scratch
    across grid steps (j innermost): removes the second aliased x input
    (which both re-reads HBM and can defeat Mosaic's double-buffering)."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    bm = x_ref.shape[0]
    nfb = bw // _F

    xb = x_ref[...]
    if n % bw != 0:
        def _masked():
            col = jax.lax.broadcasted_iota(jnp.int32, (bm, bw), 1)
            return jnp.where(col + j * bw < n, xb, 0.0)

        xb = jax.lax.cond(j == nj - 1, _masked, lambda: xb)
    tail = jnp.where(j > 0, carry_ref[...], 0.0)

    if passes == 6:
        # f32 operands at Precision.HIGH: Mosaic runs the bf16_3x
        # decomposition inside the MXU pipeline — zero VPU converts.
        dot = partial(jnp.dot, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGH)
        hcat = hcat_hi_ref[...]
        outs = []
        for f in range(nfb):
            c = (jnp.concatenate([tail, xb[:, :_F]], axis=1) if f == 0
                 else xb[:, (f - 1) * _F:(f + 1) * _F])
            outs.append(dot(c, hcat))
        y_ref[...] = jnp.concatenate(outs, axis=1)
        carry_ref[...] = xb[:, bw - _F:]
        return

    x_hi, x_lo = _split_hi_lo(xb)
    t_hi, t_lo = _split_hi_lo(tail)
    dot = partial(jnp.dot, preferred_element_type=jnp.float32)

    hcat_hi = hcat_hi_ref[...]
    outs = []
    for f in range(nfb):
        w = slice((f - 1) * _F, (f + 1) * _F)
        if f == 0:
            c_hi = jnp.concatenate([t_hi, x_hi[:, :_F]], axis=1)
        else:
            c_hi = x_hi[:, w]
        y = dot(c_hi, hcat_hi)
        if passes >= 2:
            c_lo = (jnp.concatenate([t_lo, x_lo[:, :_F]], axis=1)
                    if f == 0 else x_lo[:, w])
            y += dot(c_lo, hcat_hi)
        if passes >= 3:
            y += dot(c_hi, hcat_lo_ref[...])
        outs.append(y)
    y_ref[...] = jnp.concatenate(outs, axis=1)
    carry_ref[...] = xb[:, bw - _F:]


def _fir_lanes_kernel(x_ref, tail_ref, hcat_hi_ref, hcat_lo_ref, y_ref, *,
                      n: int, bw: int, passes: int):
    """Time-on-LANES variant: no relayout at all. The (bm, bw) block keeps
    the natural (batch, time) layout; each frame's [prev|cur] 256-lane
    operand is a free register slice of the block, so the whole band
    convolution is ONE K=256 MXU matmul per frame per pass (the blocked
    kernel instead reshapes frames onto sublanes — a full-block relayout
    that dominates its runtime). The garbage-column mask runs only on the
    final (partial) grid block."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    bm = x_ref.shape[0]
    nfb = bw // _F

    xb = x_ref[...]
    if n % bw != 0:
        # zero the garbage tail of the partial final block: H's zero band
        # would otherwise propagate NaN garbage into valid columns
        def _masked():
            col = jax.lax.broadcasted_iota(jnp.int32, (bm, bw), 1)
            return jnp.where(col + j * bw < n, xb, 0.0)

        xb = jax.lax.cond(j == nj - 1, _masked, lambda: xb)
    tail = jnp.where(j > 0, tail_ref[...], 0.0)

    if passes == 0:
        # f32 operands, HIGHEST precision: Mosaic performs the multi-pass
        # bf16 decomposition inside the MXU pipeline (no explicit VPU
        # converts in the kernel body).
        dot = partial(jnp.dot, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        hcat = hcat_hi_ref[...]
        outs = []
        for f in range(nfb):
            c = (jnp.concatenate([tail, xb[:, :_F]], axis=1) if f == 0
                 else xb[:, (f - 1) * _F:(f + 1) * _F])
            outs.append(dot(c, hcat))
        y_ref[...] = jnp.concatenate(outs, axis=1)
        return

    x_hi, x_lo = _split_hi_lo(xb)
    t_hi, t_lo = _split_hi_lo(tail)
    dot = partial(jnp.dot, preferred_element_type=jnp.float32)

    hcat_hi = hcat_hi_ref[...]
    outs = []
    for f in range(nfb):
        w = slice((f - 1) * _F, (f + 1) * _F)
        if f == 0:
            c_hi = jnp.concatenate([t_hi, x_hi[:, :_F]], axis=1)
        else:
            c_hi = x_hi[:, w]
        y = dot(c_hi, hcat_hi)
        if passes >= 2:
            c_lo = (jnp.concatenate([t_lo, x_lo[:, :_F]], axis=1)
                    if f == 0 else x_lo[:, w])
            y += dot(c_lo, hcat_hi)
        if passes >= 3:
            y += dot(c_hi, hcat_lo_ref[...])
        outs.append(y)
    y_ref[...] = jnp.concatenate(outs, axis=1)


@partial(jax.jit,
         static_argnames=("block_rows", "block_frames", "passes",
                          "interpret", "scratch"))
def _fir_lanes_call(x, h0, h1, block_rows: int, block_frames: int,
                    passes: int, interpret: bool, scratch: bool = True):
    b, n = x.shape
    bm = block_rows
    bw = block_frames * _F
    grid = (pl.cdiv(b, bm), pl.cdiv(n, bw))
    hcat = jnp.concatenate([h1, h0], axis=0)       # (256, 128): [H1; H0]
    if passes in (0, 6):
        hcat_hi, hcat_lo = hcat, hcat              # f32, used directly
    else:
        hcat_hi, hcat_lo = _split_hi_lo(hcat)
    hspec = pl.BlockSpec((2 * _F, _F), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
    nfb = block_frames
    xspec = pl.BlockSpec((bm, bw), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
    if scratch and passes > 0:
        return pl.pallas_call(
            partial(_fir_lanes_scratch_kernel, n=n, bw=bw, passes=passes),
            out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
            grid=grid,
            in_specs=[xspec, hspec, hspec],
            out_specs=xspec,
            scratch_shapes=[pltpu.VMEM((bm, _F), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("arbitrary", "arbitrary")),
            interpret=interpret,
        )(x, hcat_hi, hcat_lo)
    return pl.pallas_call(
        partial(_fir_lanes_kernel, n=n, bw=bw, passes=passes),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        grid=grid,
        in_specs=[
            xspec,
            pl.BlockSpec((bm, _F),
                         lambda i, j: (i, jnp.maximum(j * nfb - 1, 0)),
                         memory_space=pltpu.VMEM),
            hspec, hspec,
        ],
        out_specs=pl.BlockSpec((bm, bw), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, x, hcat_hi, hcat_lo)


def fir_batch_pallas_lanes(x, taps, *, block_rows: int = 1000,
                           block_frames: int = 8, passes: int = 3,
                           interpret: bool = False, scratch: bool = True):
    """Causal batch FIR, time-on-lanes fused kernel (see
    _fir_lanes_kernel). Same semantics as fir_batch_pallas."""
    from njw_tpu.signal.filters import _fir_band_matrices

    x = jnp.asarray(x, jnp.float32)
    if x.ndim != 2:
        raise ValueError("fir_batch_pallas_lanes expects (B, n) signals")
    k = int(np.shape(taps)[0])
    if k > _F:
        raise ValueError(f"taps must be <= {_F}")
    h0, h1 = _fir_band_matrices(np.asarray(taps))
    bm = min(block_rows, x.shape[0])
    bf = min(block_frames, pl.cdiv(x.shape[1], _F))
    return _fir_lanes_call(x, jnp.asarray(h0), jnp.asarray(h1),
                           bm, bf, passes, interpret, scratch)


def _fir_lanes_bf16_nonscratch_kernel(x_ref, tail_ref, hcat_ref,
                                      hcat_lo_ref, y_ref, *, n: int,
                                      bw: int, taps_passes: int,
                                      out_dtype):
    """bf16 lanes kernel without the VMEM carry: the previous-frame tail
    arrives as a second (aliased) input block, so both grid axes can be
    declared parallel and Mosaic is free to pipeline blocks."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    bm = x_ref.shape[0]
    nfb = bw // _F

    xb = x_ref[...]
    if n % bw != 0:
        def _masked():
            col = jax.lax.broadcasted_iota(jnp.int32, (bm, bw), 1)
            return jnp.where(col + j * bw < n, xb, jnp.bfloat16(0))

        xb = jax.lax.cond(j == nj - 1, _masked, lambda: xb)
    tail = jnp.where(j > 0, tail_ref[...], jnp.bfloat16(0))

    dot = partial(jnp.dot, preferred_element_type=jnp.float32)
    hcat = hcat_ref[...]
    outs = []
    for f in range(nfb):
        c = (jnp.concatenate([tail, xb[:, :_F]], axis=1) if f == 0
             else xb[:, (f - 1) * _F:(f + 1) * _F])
        y = dot(c, hcat)
        if taps_passes >= 2:
            y += dot(c, hcat_lo_ref[...])
        outs.append(y)
    y_ref[...] = jnp.concatenate(outs, axis=1).astype(out_dtype)


def _fir_lanes_bf16_kernel(x_ref, hcat_ref, hcat_lo_ref, y_ref, carry_ref,
                           *, n: int, bw: int, taps_passes: int,
                           out_dtype):
    """bf16 time-on-lanes kernel: bf16 signal operand (no hi/lo split of
    x at all — the VPU-convert bottleneck of the f32 kernel vanishes),
    f32 MXU accumulation, bf16 output. Matches the reference's own
    half-precision tensor-core contract (half x half -> float accumulate,
    ref: high_perf_gpu_support.cu:103-144). taps_passes=2 adds one extra
    matmul against the taps' bf16 residual, recovering ~f32 tap accuracy
    at zero extra HBM traffic."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    bm = x_ref.shape[0]
    nfb = bw // _F

    xb = x_ref[...]                                    # bf16
    if n % bw != 0:
        def _masked():
            col = jax.lax.broadcasted_iota(jnp.int32, (bm, bw), 1)
            return jnp.where(col + j * bw < n, xb,
                             jnp.bfloat16(0))

        xb = jax.lax.cond(j == nj - 1, _masked, lambda: xb)
    tail = jnp.where(j > 0, carry_ref[...], jnp.bfloat16(0))

    dot = partial(jnp.dot, preferred_element_type=jnp.float32)
    hcat = hcat_ref[...]
    outs = []
    for f in range(nfb):
        c = (jnp.concatenate([tail, xb[:, :_F]], axis=1) if f == 0
             else xb[:, (f - 1) * _F:(f + 1) * _F])
        y = dot(c, hcat)
        if taps_passes >= 2:
            y += dot(c, hcat_lo_ref[...])
        outs.append(y)
    y_ref[...] = jnp.concatenate(outs, axis=1).astype(out_dtype)
    carry_ref[...] = xb[:, bw - _F:]


@partial(jax.jit,
         static_argnames=("block_rows", "block_frames", "taps_passes",
                          "interpret", "out_dtype", "scratch"))
def _fir_lanes_bf16_call(x, h0, h1, block_rows: int, block_frames: int,
                         taps_passes: int, interpret: bool,
                         out_dtype=jnp.bfloat16, scratch: bool = True):
    b, n = x.shape
    bm = block_rows
    bw = block_frames * _F
    grid = (pl.cdiv(b, bm), pl.cdiv(n, bw))
    hcat = jnp.concatenate([h1, h0], axis=0)       # (256, 128): [H1; H0]
    hcat_hi, hcat_lo = _split_hi_lo(hcat)
    hspec = pl.BlockSpec((2 * _F, _F), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((bm, bw), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
    if not scratch:
        nfb = block_frames
        return pl.pallas_call(
            partial(_fir_lanes_bf16_nonscratch_kernel, n=n, bw=bw,
                    taps_passes=taps_passes, out_dtype=out_dtype),
            out_shape=jax.ShapeDtypeStruct((b, n), out_dtype),
            grid=grid,
            in_specs=[
                xspec,
                pl.BlockSpec((bm, _F),
                             lambda i, j: (i, jnp.maximum(j * nfb - 1,
                                                          0)),
                             memory_space=pltpu.VMEM),
                hspec, hspec,
            ],
            out_specs=xspec,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(x, x, hcat_hi, hcat_lo)
    return pl.pallas_call(
        partial(_fir_lanes_bf16_kernel, n=n, bw=bw,
                taps_passes=taps_passes, out_dtype=out_dtype),
        out_shape=jax.ShapeDtypeStruct((b, n), out_dtype),
        grid=grid,
        in_specs=[xspec, hspec, hspec],
        out_specs=xspec,
        scratch_shapes=[pltpu.VMEM((bm, _F), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(x, hcat_hi, hcat_lo)


def fir_batch_pallas_bf16(x, taps, *, block_rows: int = 1000,
                          block_frames: int = 64, taps_passes: int = 1,
                          out_dtype=jnp.bfloat16, scratch: bool = False,
                          interpret: bool = False):
    """Opt-in half-precision batch FIR: bf16 signal in, bf16 out, f32
    accumulation — the equal-precision comparison against the reference's
    tensor-core rows (its WMMA path is half in/out with float accumulate,
    ref: high_perf_gpu_support.cu:103-144). HBM traffic halves vs the f32
    kernel (0.4 GB for the 1000 x 100k row -> 0.49 ms v5e floor) and the
    VPU hi/lo-convert bottleneck disappears (x is used as-is).

    Accepts f32 (converted once, outside the kernel) or bf16 input;
    returns bf16. taps_passes=2 adds one in-VMEM matmul against the
    taps' bf16 residual (3.9e-3 -> 3.1e-3 rel err; signal quantization
    dominates either way, so single-pass is the default — it measures
    1.04 ms vs 1.56 for tp2 at the tuned block shape). Tuned on v5e
    (BENCH_NOTES r4): block_frames=64, non-scratch (parallel grid
    pipelining beats the VMEM tail carry), 1.036 ms for the 1000 x 100k
    row vs H100's published 1.6 ms (ref README.md:151) — 47% of the
    0.49 ms HBM floor."""
    from njw_tpu.signal.filters import _fir_band_matrices

    x = jnp.asarray(x)
    if x.ndim != 2:
        raise ValueError("fir_batch_pallas_bf16 expects (B, n) signals")
    if x.dtype != jnp.bfloat16:
        x = x.astype(jnp.bfloat16)
    k = int(np.shape(taps)[0])
    if k > _F:
        raise ValueError(f"taps must be <= {_F}")
    h0, h1 = _fir_band_matrices(np.asarray(taps))
    bm = min(block_rows, x.shape[0])
    bf = min(block_frames, pl.cdiv(x.shape[1], _F))
    return _fir_lanes_bf16_call(x, jnp.asarray(h0), jnp.asarray(h1),
                                bm, bf, taps_passes, interpret,
                                jnp.dtype(out_dtype).type, scratch)


def fir_batch_pallas(x, taps, *, block_rows: int = 40,
                     block_frames: int = 128, passes: int = 3,
                     interpret: bool = False):
    """Causal FIR over a (B, n) batch, fused single-pass Pallas kernel.

    passes: bf16 matmul passes — 3 (default) is the hi/lo split with
    ~f32 accuracy; 1 is pure-bf16 (2x less MXU work, ~2e-3 rel error).
    """
    from njw_tpu.signal.filters import _fir_band_matrices

    x = jnp.asarray(x, jnp.float32)
    if x.ndim != 2:
        raise ValueError("fir_batch_pallas expects (B, n) signals")
    k = int(np.shape(taps)[0])
    if k > _F:
        raise ValueError(f"taps must be <= {_F}")
    h0, h1 = _fir_band_matrices(np.asarray(taps))
    bm = min(block_rows, x.shape[0])
    bf = min(block_frames, pl.cdiv(x.shape[1], _F))
    return _fir_batch_call(x, jnp.asarray(h0), jnp.asarray(h1),
                           bm, bf, passes, interpret)
