"""Fused Pallas TPU stencil kernels for the shallow-water core.

TPU-native replacement for the reference's SM-specialized shared-memory
tiled CUDA kernels (ref: shallow_water_kernels.cu:50-603 — four per-SM
variants, each staging a block+1 halo into shared memory). Here ONE kernel
with a tunable strip height covers all TPU generations, and it fuses the
*entire RK4 step* (4 stencil stages + combines), not just one
tendency+Euler update like the reference kernel (ref :213-217):

    HBM traffic/step: read u,v,h + 2x8-row halo slabs, write u',v',h'
      = ~24 B/point + ~(16/BY) overhead  — vs ~96 B/point for 4 ideal
      unfused stages and ~4 GB/step for the roll-materializing XLA path.

Layout: the grid iterates over full-width row strips (BY, nx). The x
direction stays whole inside the block, so x-wraparound is an in-VMEM lane
roll. The y halo (4 rows for 4 chained stencil stages) comes from two 8-row
neighbor slabs fetched via block index_maps — the multi-stage validity
shrinks by one row per stage, ending exactly on the (BY, nx) interior:

    rows valid:  load [0,BY+8) -> s1 [1,BY+7) -> s2 [2,BY+6)
                 -> s3 [3,BY+5) -> T(s3) [4,BY+4) == output strip.

RK4 in state form (no k-storage; identical arithmetic to integrators.rk4):
    s1 = s + (dt/2) T(s);  s2 = s + (dt/2) T(s1);  s3 = s + dt T(s2)
    s' = (-s + s1 + 2 s2 + s3)/3 + (dt/6) T(s3)

Restrictions (fall back to the XLA path otherwise): periodic BC, constant
Coriolis f (no beta field), nx % 128 == 0, ny % BY == 0.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from njw_tpu.weather.grid import GridSpec, PhysicsParams

HALO = 4  # rows of halo each side = chained stencil stages per step


def _pick_by(ny: int, nx: int, vmem_bytes: int) -> int:
    """Measured-best strip height whose ~18 live field buffers fit VMEM."""
    # Mosaic's scoped-vmem stack holds ~30 live strip-sized f32 buffers at
    # the deepest point of the fused 4-stage computation. Preference order
    # is MEASURED on v5e at nx=2048: by=64 12.82G pts/s, by=128 neutral,
    # by=256 11.01G (-16%: VMEM pressure hurts pipelining), by=32 10.6G.
    for by in (64, 128, 256, 32, 16, 8):
        if ny % by:
            continue
        strip_bytes = (by + 2 * HALO) * nx * 4
        if 32 * strip_bytes <= int(vmem_bytes * 1.4):
            return by
    return 8


def swe_rk4_kernel(u_c, u_t, u_b, v_c, v_t, v_b, h_c, h_t, h_b,
                   u_o, v_o, h_o, *, dt: float, gravity: float,
                   coriolis_f: float, dx: float, dy: float, by: int,
                   x_halo: int = 0, variant: str = "slices",
                   viscosity: float = 0.0):
    """One grid step: fused RK4 over a (by, w) strip with 4-row y halos.

    x_halo=0: x is the whole (periodic) domain width — lane rolls wrap
    correctly. x_halo=128: the strip carries 128-lane x halo slabs from
    the x-neighbors (2-D decomposition); rolls still wrap the padded
    width, the outer lanes go stale by one per stage (4 stages << 128)
    and the output crops to the interior columns.

    variant: 'base' | 'folded' (fold cx/cy into per-field products and
    g*cx/g*cy at trace time — 3 fewer VPU mults per point per stage) |
    'bf16' (advection differences in bf16, f32 combine — halves register
    traffic at ~4e-3 relative error per step; opt-in, measured either way
    per ROADMAP). viscosity != 0 adds the 5-point Laplacian on u, v
    (2 extra rolls per field per stage).
    """
    cx = 0.5 / dx
    cy = 0.5 / dy
    g = gravity
    f = coriolis_f
    nu = viscosity
    h4 = HALO

    def pad(c, t, b):
        # top slab rows [g-8, g): need last HALO rows; bottom [g+by, g+by+8):
        # need first HALO rows.
        return jnp.concatenate([t[8 - h4:8], c[:], b[0:h4]], axis=0)

    u = pad(u_c, u_t, u_b)
    v = pad(v_c, v_t, v_b)
    h = pad(h_c, h_t, h_b)

    if variant in ("slices", "bf16s"):
        # Static lane/sublane slice+concat instead of dynamic rotate:
        # same wraparound semantics, but lowers without Mosaic's
        # dynamic_rotate (which is the r3 blocker for sub-32-bit types
        # and a candidate for the VPU issue gap — measured either way).
        def sx(a, s):
            return jnp.concatenate([a[:, s % a.shape[1]:],
                                    a[:, :s % a.shape[1]]], axis=1)

        def sy(a, s):
            return jnp.concatenate([a[s % a.shape[0]:],
                                    a[:s % a.shape[0]]], axis=0)
    else:
        def sx(a, s):  # result[i] = a[x + s]; x wraps (periodic)
            return pltpu.roll(a, (-s) % a.shape[1], 1)

        def sy(a, s):  # y shift inside the strip; edge rows go invalid
            return pltpu.roll(a, (-s) % a.shape[0], 0)

    def visc(uu, vv, du, dv):
        if not nu:
            return du, dv
        ix2, iy2 = nu / (dx * dx), nu / (dy * dy)
        du = du + (sx(uu, 1) + sx(uu, -1) - 2.0 * uu) * ix2 \
            + (sy(uu, 1) + sy(uu, -1) - 2.0 * uu) * iy2
        dv = dv + (sx(vv, 1) + sx(vv, -1) - 2.0 * vv) * ix2 \
            + (sy(vv, 1) + sy(vv, -1) - 2.0 * vv) * iy2
        return du, dv

    def tendency_base(uu, vv, hh):
        u_x = (sx(uu, 1) - sx(uu, -1)) * cx
        u_y = (sy(uu, 1) - sy(uu, -1)) * cy
        v_x = (sx(vv, 1) - sx(vv, -1)) * cx
        v_y = (sy(vv, 1) - sy(vv, -1)) * cy
        h_x = (sx(hh, 1) - sx(hh, -1)) * cx
        h_y = (sy(hh, 1) - sy(hh, -1)) * cy
        du = -uu * u_x - vv * u_y - g * h_x + f * vv
        dv = -uu * v_x - vv * v_y - g * h_y - f * uu
        dh = -hh * (u_x + v_y) - uu * h_x - vv * h_y
        return visc(uu, vv, du, dv) + (dh,)

    def tendency_folded(uu, vv, hh):
        # fold cx/cy into the advecting fields (4 mults) instead of into
        # every difference (6 mults), and g*cx / g*cy into constants.
        dxu = sx(uu, 1) - sx(uu, -1)
        dyu = sy(uu, 1) - sy(uu, -1)
        dxv = sx(vv, 1) - sx(vv, -1)
        dyv = sy(vv, 1) - sy(vv, -1)
        dxh = sx(hh, 1) - sx(hh, -1)
        dyh = sy(hh, 1) - sy(hh, -1)
        ucx = uu * cx
        vcy = vv * cy
        hcx = hh * cx
        hcy = hh * cy
        du = -ucx * dxu - vcy * dyu - (g * cx) * dxh + f * vv
        dv = -ucx * dxv - vcy * dyv - (g * cy) * dyh - f * uu
        dh = -hcx * dxu - hcy * dyv - ucx * dxh - vcy * dyh
        return visc(uu, vv, du, dv) + (dh,)

    def tendency_bf16(uu, vv, hh):
        ub = uu.astype(jnp.bfloat16)
        vb = vv.astype(jnp.bfloat16)
        hb = hh.astype(jnp.bfloat16)
        u_x = ((sx(ub, 1) - sx(ub, -1)) * jnp.bfloat16(cx))
        u_y = ((sy(ub, 1) - sy(ub, -1)) * jnp.bfloat16(cy))
        v_x = ((sx(vb, 1) - sx(vb, -1)) * jnp.bfloat16(cx))
        v_y = ((sy(vb, 1) - sy(vb, -1)) * jnp.bfloat16(cy))
        h_x = ((sx(hb, 1) - sx(hb, -1)) * jnp.bfloat16(cx))
        h_y = ((sy(hb, 1) - sy(hb, -1)) * jnp.bfloat16(cy))
        du = (-ub * u_x - vb * u_y).astype(jnp.float32) \
            - g * h_x.astype(jnp.float32) + f * vv
        dv = (-ub * v_x - vb * v_y).astype(jnp.float32) \
            - g * h_y.astype(jnp.float32) - f * uu
        dh = (-hb * (u_x + v_y) - ub * h_x - vb * h_y).astype(jnp.float32)
        return visc(uu, vv, du, dv) + (dh,)

    tendency = {"base": tendency_base, "folded": tendency_folded,
                "bf16": tendency_bf16, "slices": tendency_base,
                "bf16s": tendency_bf16}[variant]

    half = 0.5 * dt
    # Accumulator form of s' = (-s + s1 + 2 s2 + s3)/3 + (dt/6) T(s3):
    # keeps only {s, current stage, accumulator} live (the naive form's
    # s1..s3 all-live peak OOM'd VMEM at by=64).
    du, dv, dh = tendency(u, v, h)                      # k1
    cu, cv, ch = u + half * du, v + half * dv, h + half * dh    # s1
    au, av, ah = cu - u, cv - v, ch - h                 # acc = -s + s1
    du, dv, dh = tendency(cu, cv, ch)                   # k2
    cu, cv, ch = u + half * du, v + half * dv, h + half * dh    # s2
    au, av, ah = au + 2.0 * cu, av + 2.0 * cv, ah + 2.0 * ch
    du, dv, dh = tendency(cu, cv, ch)                   # k3
    cu, cv, ch = u + dt * du, v + dt * dv, h + dt * dh  # s3
    au, av, ah = au + cu, av + cv, ah + ch
    du, dv, dh = tendency(cu, cv, ch)                   # k4
    third = 1.0 / 3.0
    sixth = dt / 6.0
    u_new = au * third + sixth * du
    v_new = av * third + sixth * dv
    h_new = ah * third + sixth * dh

    if x_halo:
        w = u_c.shape[1] - 2 * x_halo
        u_o[:] = u_new[h4:h4 + by, x_halo:x_halo + w]
        v_o[:] = v_new[h4:h4 + by, x_halo:x_halo + w]
        h_o[:] = h_new[h4:h4 + by, x_halo:x_halo + w]
    else:
        u_o[:] = u_new[h4:h4 + by, :]
        v_o[:] = v_new[h4:h4 + by, :]
        h_o[:] = h_new[h4:h4 + by, :]


@functools.partial(
    jax.jit,
    static_argnames=("grid", "dt", "gravity", "coriolis_f", "by", "interpret",
                     "variant", "viscosity"),
)
def swe_rk4_step_pallas(
    u, v, h, *, grid: GridSpec, dt: float, gravity: float = 9.81,
    coriolis_f: float = 0.0, by: Optional[int] = None, interpret: bool = False,
    variant: str = "slices", viscosity: float = 0.0,
):
    """One fused RK4 SWE step on (ny, nx) f32 fields. See module docstring."""
    ny, nx = grid.ny, grid.nx
    if nx % 128 or grid.bc != "periodic":
        raise ValueError("pallas SWE kernel: nx%128==0 and periodic BC required")
    if by is None:
        from njw_tpu.platform.device import detect

        by = _pick_by(ny, nx, detect().vmem_bytes)
    if ny % by:
        raise ValueError(f"ny={ny} not divisible by strip height {by}")
    nby = ny // 8  # number of 8-row slabs

    kern = functools.partial(
        swe_rk4_kernel, dt=float(dt), gravity=float(gravity),
        coriolis_f=float(coriolis_f), dx=float(grid.dx), dy=float(grid.dy),
        by=by, variant=variant, viscosity=float(viscosity),
    )
    center = pl.BlockSpec((by, nx), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    r = by // 8  # slab blocks per strip
    top = pl.BlockSpec((8, nx), lambda i: ((i * r - 1) % nby, 0),
                       memory_space=pltpu.VMEM)
    bot = pl.BlockSpec((8, nx), lambda i: ((i * r + r) % nby, 0),
                       memory_space=pltpu.VMEM)
    out = pl.BlockSpec((by, nx), lambda i: (i, 0), memory_space=pltpu.VMEM)

    shape = jax.ShapeDtypeStruct((ny, nx), jnp.float32)
    flops_pt = 4 * 33 + 24
    return pl.pallas_call(
        kern,
        grid=(ny // by,),
        in_specs=[center, top, bot] * 3,
        out_specs=(out, out, out),
        out_shape=(shape, shape, shape),
        cost_estimate=pl.CostEstimate(
            flops=flops_pt * ny * nx,
            bytes_accessed=int((6 + 6 * 16 / by) * ny * nx * 4),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_cap(by, nx)),
        interpret=interpret,
    )(u, u, u, v, v, v, h, h, h)


def _vmem_cap(by: int, width: int) -> int:
    """Scoped-VMEM cap for the fused kernel: ~36 live strip buffers at
    the 4-stage peak, floored at Mosaic's raised default, bounded by
    physical VMEM (128 MiB on v4+ cores)."""
    need = 36 * (by + 2 * HALO) * width * 4
    return max(24 << 20, min(need, 100 << 20))


def make_pallas_rk4_stepper(grid: GridSpec, params: PhysicsParams, dt: float,
                            by: Optional[int] = None,
                            interpret: bool = False,
                            variant: str = "slices"):
    """Stepper-shaped wrapper so the Simulation driver / scan can use the
    fused kernel interchangeably with the XLA integrators."""
    from njw_tpu.weather.grid import WeatherState
    from njw_tpu.weather.integrators import Stepper

    g = float(params.gravity)
    f = float(params.coriolis_f)
    nu = float(params.viscosity)

    def step(carry, s, _dt_ignored):
        u, v, h = swe_rk4_step_pallas(
            s.u, s.v, s.h, grid=grid, dt=float(dt), gravity=g,
            coriolis_f=f, by=by, interpret=interpret, variant=variant,
            viscosity=nu,
        )
        return carry, WeatherState(u=u, v=v, h=h)

    return Stepper(lambda s: (), step, "rk4_pallas", 4)


def pallas_supported(grid: GridSpec, params: PhysicsParams, model: str,
                     method: str) -> bool:
    """Eligibility for the fused kernel (otherwise XLA path)."""
    import numbers

    return (
        model == "shallow_water"
        and method == "rk4"
        and grid.grid_type == "cartesian"
        and grid.bc == "periodic"
        and grid.nx % 128 == 0
        and grid.ny % 8 == 0
        and isinstance(params.gravity, numbers.Number)
        and isinstance(params.coriolis_f, numbers.Number)
        and isinstance(params.beta, numbers.Number)
        and float(params.beta) == 0.0
        and isinstance(params.viscosity, numbers.Number)
        # viscosity IS supported in-kernel (5-point Laplacian per stage,
        # r3); beta needs a per-row field, which stays on the XLA path
    )


@functools.partial(
    jax.jit,
    static_argnames=("ly", "nx", "dt", "gravity", "coriolis_f", "dx", "dy",
                     "by", "interpret"),
)
def swe_rk4_step_pallas_local(
    u_p, v_p, h_p, *, ly: int, nx: int, dt: float, gravity: float = 9.81,
    coriolis_f: float = 0.0, dx: float = 1.0, dy: float = 1.0,
    by: Optional[int] = None, interpret: bool = False,
):
    """Fused RK4 step on an 8-row-halo-padded LOCAL block (ly+16, nx).

    The multi-chip variant: a shard_map caller exchanges 8-row halos with
    lax.ppermute, and this call runs the same fused kernel on the padded
    block — no modular slab wrap (the halo rows ARE the neighbors). x must
    be whole (1-D row decomposition). Returns the (ly, nx) interior step.
    """
    if by is None:
        from njw_tpu.platform.device import detect

        by = _pick_by(ly, nx, detect().vmem_bytes)
    if ly % by or nx % 128:
        raise ValueError(f"ly={ly} % by={by} != 0 or nx % 128 != 0")
    r = by // 8

    kern = functools.partial(
        swe_rk4_kernel, dt=float(dt), gravity=float(gravity),
        coriolis_f=float(coriolis_f), dx=float(dx), dy=float(dy), by=by,
    )
    # center view starts 8 rows into the padded array (sliced outside so
    # block indices stay integral); slabs index the padded array directly.
    center = pl.BlockSpec((by, nx), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    top = pl.BlockSpec((8, nx), lambda i: (i * r, 0),
                       memory_space=pltpu.VMEM)
    bot = pl.BlockSpec((8, nx), lambda i: ((i + 1) * r + 1, 0),
                       memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((ly, nx), jnp.float32)

    u_c = jax.lax.slice_in_dim(u_p, 8, 8 + ly, axis=0)
    v_c = jax.lax.slice_in_dim(v_p, 8, 8 + ly, axis=0)
    h_c = jax.lax.slice_in_dim(h_p, 8, 8 + ly, axis=0)

    return pl.pallas_call(
        kern,
        grid=(ly // by,),
        in_specs=[center, top, bot] * 3,
        out_specs=(pl.BlockSpec((by, nx), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),) * 3,
        out_shape=(shape, shape, shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_cap(by, nx)),
        interpret=interpret,
    )(u_c, u_p, u_p, v_c, v_p, v_p, h_c, h_p, h_p)


@functools.partial(
    jax.jit,
    static_argnames=("ly", "nx", "dt", "gravity", "coriolis_f", "dx", "dy",
                     "by", "interpret"),
)
def swe_rk4_step_pallas_carry(
    u_p, v_p, h_p, *, ly: int, nx: int, by: int, dt: float,
    gravity: float = 9.81, coriolis_f: float = 0.0, dx: float = 1.0,
    dy: float = 1.0, interpret: bool = False,
):
    """Fused RK4 step on a PERSISTENT by-row-padded local block.

    Carry-form variant of :func:`swe_rk4_step_pallas_local` for sharded
    scan loops: the (ly + 2*by, nx) padded block IS the scan carry, the
    kernel writes a new padded block (interior strips only — the halo
    rows come back garbage and the next iteration's ppermute refresh
    rewrites the 4 rows per side the kernel actually reads; slab rows it
    never reads may hold garbage, see swe_rk4_kernel pad()). This removes
    the full-state concat copy the local variant pays per step — measured
    0.40 vs 0.32 ms/step at 2048^2 on v5e (BENCH_NOTES r4).

    Layout: interior rows [by, by+ly); the kernel reads, per strip i,
    center rows [by+i*by, by+(i+1)*by) plus the adjacent 8-row slabs —
    for the first/last strip those slabs overlap the halo band where only
    rows [by-4, by) and [by+ly, by+ly+4) are consumed. by must divide ly.
    """
    if ly % by or nx % 128 or by % 8:
        raise ValueError(f"ly={ly} % by={by} != 0 or nx % 128 != 0")
    r = by // 8

    kern = functools.partial(
        swe_rk4_kernel, dt=float(dt), gravity=float(gravity),
        coriolis_f=float(coriolis_f), dx=float(dx), dy=float(dy), by=by,
    )
    center = pl.BlockSpec((by, nx), lambda i: (i + 1, 0),
                          memory_space=pltpu.VMEM)
    top = pl.BlockSpec((8, nx), lambda i: ((i + 1) * r - 1, 0),
                       memory_space=pltpu.VMEM)
    bot = pl.BlockSpec((8, nx), lambda i: ((i + 1) * r + r, 0),
                       memory_space=pltpu.VMEM)
    out = pl.BlockSpec((by, nx), lambda i: (i + 1, 0),
                       memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((ly + 2 * by, nx), jnp.float32)

    return pl.pallas_call(
        kern,
        grid=(ly // by,),
        in_specs=[center, top, bot] * 3,
        out_specs=(out, out, out),
        out_shape=(shape, shape, shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_cap(by, nx)),
        interpret=interpret,
    )(u_p, u_p, u_p, v_p, v_p, v_p, h_p, h_p, h_p)


@functools.partial(
    jax.jit,
    static_argnames=("ly", "lx", "dt", "gravity", "coriolis_f", "dx", "dy",
                     "by", "interpret"),
)
def swe_rk4_step_pallas_local2d(
    u_p, v_p, h_p, *, ly: int, lx: int, dt: float, gravity: float = 9.81,
    coriolis_f: float = 0.0, dx: float = 1.0, dy: float = 1.0,
    by: Optional[int] = None, interpret: bool = False,
):
    """Fused RK4 step on a 2-D-halo-padded LOCAL block (ly+16, lx+256).

    The ('y','x')-mesh variant of swe_rk4_step_pallas_local: the caller
    ppermutes 128-lane x slabs first, then 8-row y slabs of the x-padded
    block (corners ride along), and this runs the fused kernel with
    x_halo=128 cropping. Returns the (ly, lx) interior step.
    """
    w = lx + 256
    if by is None:
        from njw_tpu.platform.device import detect

        by = _pick_by(ly, w, detect().vmem_bytes)
    if ly % by or lx % 128:
        raise ValueError(f"ly={ly} % by={by} != 0 or lx % 128 != 0")
    r = by // 8

    kern = functools.partial(
        swe_rk4_kernel, dt=float(dt), gravity=float(gravity),
        coriolis_f=float(coriolis_f), dx=float(dx), dy=float(dy), by=by,
        x_halo=128,
    )
    center = pl.BlockSpec((by, w), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    top = pl.BlockSpec((8, w), lambda i: (i * r, 0),
                       memory_space=pltpu.VMEM)
    bot = pl.BlockSpec((8, w), lambda i: ((i + 1) * r + 1, 0),
                       memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((ly, lx), jnp.float32)

    u_c = jax.lax.slice_in_dim(u_p, 8, 8 + ly, axis=0)
    v_c = jax.lax.slice_in_dim(v_p, 8, 8 + ly, axis=0)
    h_c = jax.lax.slice_in_dim(h_p, 8, 8 + ly, axis=0)

    return pl.pallas_call(
        kern,
        grid=(ly // by,),
        in_specs=[center, top, bot] * 3,
        out_specs=(pl.BlockSpec((by, lx), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),) * 3,
        out_shape=(shape, shape, shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_cap(by, w)),
        interpret=interpret,
    )(u_c, u_p, u_p, v_c, v_p, v_p, h_c, h_p, h_p)


def _swe_rk4_multi_kernel(u_c, u_t, u_b, v_c, v_t, v_b, h_c, h_t, h_b,
                          u_o, v_o, h_o, *, dt: float, gravity: float,
                          coriolis_f: float, dx: float, dy: float, by: int,
                          n_fused: int):
    """n_fused chained RK4 steps in one VMEM residency.

    Halo = 4 * n_fused rows each side (the full 8-row slabs cover
    n_fused=2). Validity shrinks 4 rows per fused step; the output crop
    lands exactly on the interior strip. Doubles arithmetic per HBM
    round-trip — profitable when the kernel is bandwidth/overhead bound.
    """
    cx = 0.5 / dx
    cy = 0.5 / dy
    g = gravity
    f = coriolis_f
    halo = 4 * n_fused

    u = jnp.concatenate([u_t[8 - halo:8], u_c[:], u_b[0:halo]], axis=0)
    v = jnp.concatenate([v_t[8 - halo:8], v_c[:], v_b[0:halo]], axis=0)
    h = jnp.concatenate([h_t[8 - halo:8], h_c[:], h_b[0:halo]], axis=0)

    def sx(a, s):
        return pltpu.roll(a, (-s) % a.shape[1], 1)

    def sy(a, s):
        return pltpu.roll(a, (-s) % a.shape[0], 0)

    def tendency(uu, vv, hh):
        u_x = (sx(uu, 1) - sx(uu, -1)) * cx
        u_y = (sy(uu, 1) - sy(uu, -1)) * cy
        v_x = (sx(vv, 1) - sx(vv, -1)) * cx
        v_y = (sy(vv, 1) - sy(vv, -1)) * cy
        h_x = (sx(hh, 1) - sx(hh, -1)) * cx
        h_y = (sy(hh, 1) - sy(hh, -1)) * cy
        du = -uu * u_x - vv * u_y - g * h_x + f * vv
        dv = -uu * v_x - vv * v_y - g * h_y - f * uu
        dh = -hh * (u_x + v_y) - uu * h_x - vv * h_y
        return du, dv, dh

    half = 0.5 * dt
    third = 1.0 / 3.0
    sixth = dt / 6.0
    for _ in range(n_fused):
        du, dv, dh = tendency(u, v, h)
        cu, cv, ch = u + half * du, v + half * dv, h + half * dh
        au, av, ah = cu - u, cv - v, ch - h
        du, dv, dh = tendency(cu, cv, ch)
        cu, cv, ch = u + half * du, v + half * dv, h + half * dh
        au, av, ah = au + 2.0 * cu, av + 2.0 * cv, ah + 2.0 * ch
        du, dv, dh = tendency(cu, cv, ch)
        cu, cv, ch = u + dt * du, v + dt * dv, h + dt * dh
        au, av, ah = au + cu, av + cv, ah + ch
        du, dv, dh = tendency(cu, cv, ch)
        u = au * third + sixth * du
        v = av * third + sixth * dv
        h = ah * third + sixth * dh

    u_o[:] = u[halo:halo + by, :]
    v_o[:] = v[halo:halo + by, :]
    h_o[:] = h[halo:halo + by, :]


@functools.partial(
    jax.jit,
    static_argnames=("grid", "dt", "gravity", "coriolis_f", "by", "n_fused",
                     "interpret"),
)
def swe_rk4_multistep_pallas(
    u, v, h, *, grid: GridSpec, dt: float, gravity: float = 9.81,
    coriolis_f: float = 0.0, by: Optional[int] = None, n_fused: int = 2,
    interpret: bool = False,
):
    """n_fused fused RK4 steps per HBM round-trip (n_fused <= 2: the
    8-row neighbor slabs bound the halo at 8 rows)."""
    ny, nx = grid.ny, grid.nx
    if nx % 128 or grid.bc != "periodic":
        raise ValueError("nx%128==0 and periodic BC required")
    if not 1 <= n_fused <= 2:
        raise ValueError("n_fused must be 1 or 2 (8-row slab halo bound)")
    if by is None:
        by = 32 if ny % 32 == 0 else 8
    if ny % by:
        raise ValueError(f"ny={ny} not divisible by {by}")
    nby = ny // 8
    r = by // 8

    kern = functools.partial(
        _swe_rk4_multi_kernel, dt=float(dt), gravity=float(gravity),
        coriolis_f=float(coriolis_f), dx=float(grid.dx), dy=float(grid.dy),
        by=by, n_fused=n_fused,
    )
    center = pl.BlockSpec((by, nx), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    top = pl.BlockSpec((8, nx), lambda i: ((i * r - 1) % nby, 0),
                       memory_space=pltpu.VMEM)
    bot = pl.BlockSpec((8, nx), lambda i: ((i * r + r) % nby, 0),
                       memory_space=pltpu.VMEM)
    out = pl.BlockSpec((by, nx), lambda i: (i, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((ny, nx), jnp.float32)

    return pl.pallas_call(
        kern,
        grid=(ny // by,),
        in_specs=[center, top, bot] * 3,
        out_specs=(out, out, out),
        out_shape=(shape, shape, shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024),
        interpret=interpret,
    )(u, u, u, v, v, v, h, h, h)
