"""Fused Pallas kernel for the barotropic vorticity tendency stage.

The barotropic core is: spectral Poisson inversion (XLA's native FFT —
left alone) + a 9-point Arakawa Jacobian stencil + beta/viscosity terms.
The XLA stencil path materializes every roll; this kernel computes one
full RK stage

    out = base + c_dt * (-J(psi, zeta) - beta * dpsi/dx + nu lap(zeta))

in a single pass over (by, nx) row strips with 1-row y halo slabs
(x wraps via in-VMEM lane rolls), reading psi, zeta, base and writing
out — one HBM round-trip per stage instead of ~20 materialized rolls.

Arithmetic matches weather.barotropic.arakawa_jacobian exactly
(Arakawa 1966 J1+J2+J3 average).

ref: the reference declares SimulationModel::Barotropic and falls back
to SWE (weather_simulation.cpp:542-549); this is the TPU-native
realization of the capability at BASELINE config-3 scale (1024²).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from njw_tpu.weather.grid import GridSpec, PhysicsParams


def _baro_stage_kernel(p_c, p_t, p_b, z_c, z_t, z_b, b_c, o,
                       *, by: int, dx: float, dy: float, beta: float,
                       nu: float, c_dt: float):
    def pad(c, t, b):
        return jnp.concatenate([t[7:8, :], c[:], b[0:1, :]], axis=0)

    p = pad(p_c, p_t, p_b)   # (by+2, nx)
    z = pad(z_c, z_t, z_b)

    def sh(f, dx_, dy_):
        out = f
        if dx_:
            out = pltpu.roll(out, dx_ % f.shape[1], 1)  # f[i+dx_]
        if dy_:
            out = pltpu.roll(out, dy_ % f.shape[0], 0)
        return out

    # NOTE roll sign: result[i] = f[i + s] needs roll by -s; sh above
    # passes dx_ % n where the caller already negated (see _S below).
    pE, pW = sh(p, -1, 0), sh(p, 1, 0)
    pN, pS = sh(p, 0, -1), sh(p, 0, 1)
    pNE, pNW = sh(p, -1, -1), sh(p, 1, -1)
    pSE, pSW = sh(p, -1, 1), sh(p, 1, 1)
    zE, zW = sh(z, -1, 0), sh(z, 1, 0)
    zN, zS = sh(z, 0, -1), sh(z, 0, 1)
    zNE, zNW = sh(z, -1, -1), sh(z, 1, -1)
    zSE, zSW = sh(z, -1, 1), sh(z, 1, 1)

    j1 = (pE - pW) * (zN - zS) - (pN - pS) * (zE - zW)
    j2 = (pE * (zNE - zSE) - pW * (zNW - zSW)
          - pN * (zNE - zNW) + pS * (zSE - zSW))
    j3 = (zN * (pNE - pNW) - zS * (pSE - pSW)
          - zE * (pNE - pSE) + zW * (pNW - pSW))
    dz = (j1 + j2 + j3) * (-1.0 / (12.0 * dx * dy))

    if beta != 0.0:
        v = (pE - pW) * (0.5 / dx)
        dz = dz - beta * v
    if nu != 0.0:
        lap = ((zE - 2.0 * z + zW) / (dx * dx)
               + (zN - 2.0 * z + zS) / (dy * dy))
        dz = dz + nu * lap

    o[:] = b_c[:] + c_dt * dz[1:1 + by, :]


def baro_pallas_supported(grid: GridSpec, params: PhysicsParams) -> bool:
    import numbers

    from njw_tpu.platform.device import detect

    return (
        grid.bc == "periodic"
        and grid.nx % 128 == 0
        and grid.ny % 8 == 0
        and isinstance(params.beta, numbers.Number)
        and isinstance(params.viscosity, numbers.Number)
        # a strip must genuinely fit (otherwise fall back to XLA
        # instead of compile-failing under backend='auto')
        and _pick_by(grid.ny, grid.nx, detect().vmem_bytes) is not None
    )


def _pick_by(ny: int, nx: int, vmem_bytes: int):
    for by in (256, 128, 64, 32, 16, 8):
        if ny % by:
            continue
        # ~24 live (by+2, nx) f32 buffers at the Jacobian's peak
        if 24 * (by + 2) * nx * 4 <= int(vmem_bytes * 1.4):
            return by
    return None


@functools.partial(
    jax.jit,
    static_argnames=("grid", "c_dt", "beta", "nu", "by", "interpret"),
)
def baro_stage_pallas(
    psi, zeta, base, *, grid: GridSpec, c_dt: float, beta: float = 0.0,
    nu: float = 0.0, by: Optional[int] = None, interpret: bool = False,
):
    """out = base + c_dt * baro_tendency(psi, zeta) in one fused pass."""
    ny, nx = grid.ny, grid.nx
    if nx % 128 or grid.bc != "periodic":
        raise ValueError("baro pallas: nx%128==0 and periodic BC required")
    if by is None:
        from njw_tpu.platform.device import detect

        by = _pick_by(ny, nx, detect().vmem_bytes)
        if by is None:
            raise ValueError("baro pallas: no strip height fits VMEM "
                             f"(nx={nx}); use the XLA backend")
    if ny % by:
        raise ValueError(f"ny={ny} not divisible by {by}")
    nby = ny // 8
    r = by // 8

    kern = functools.partial(
        _baro_stage_kernel, by=by, dx=float(grid.dx), dy=float(grid.dy),
        beta=float(beta), nu=float(nu), c_dt=float(c_dt),
    )
    center = pl.BlockSpec((by, nx), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    top = pl.BlockSpec((8, nx), lambda i: ((i * r - 1) % nby, 0),
                       memory_space=pltpu.VMEM)
    bot = pl.BlockSpec((8, nx), lambda i: ((i * r + r) % nby, 0),
                       memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((ny, nx), jnp.float32)

    return pl.pallas_call(
        kern,
        grid=(ny // by,),
        in_specs=[center, top, bot, center, top, bot, center],
        out_specs=center,
        out_shape=shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(max(24 << 20,
                                     int(24 * (by + 2) * nx * 4 * 1.4)),
                                 100 << 20)),
        interpret=interpret,
    )(psi, psi, psi, zeta, zeta, zeta, base)


def make_baro_pallas_rk4_stepper(grid: GridSpec, params: PhysicsParams,
                                 dt: float, interpret: bool = False):
    """RK4 with the fused stage kernel; the spectral Poisson inversion
    stays in XLA (jnp.fft is already native) between stages."""
    from njw_tpu.ops.spectral import poisson_solve
    from njw_tpu.weather.barotropic import BarotropicState
    from njw_tpu.weather.integrators import Stepper

    beta = float(params.beta)
    nu = float(params.viscosity)
    dt = float(dt)

    def stage(cur_z, base_z, c_dt):
        psi = poisson_solve(cur_z, grid.dx, grid.dy, kind="laplacian5")
        return baro_stage_pallas(psi, cur_z, base_z, grid=grid, c_dt=c_dt,
                                 beta=beta, nu=nu, interpret=interpret)

    def step(carry, s: BarotropicState, _dt_ignored):
        z = s.zeta
        z1 = stage(z, z, 0.5 * dt)
        z2 = stage(z1, z, 0.5 * dt)
        z3 = stage(z2, z, dt)
        acc = (-z + z1 + 2.0 * z2 + z3) * (1.0 / 3.0)
        out = stage(z3, acc, dt / 6.0)
        return carry, BarotropicState(zeta=out)

    return Stepper(lambda s: (), step, "baro_rk4_pallas", 4)
