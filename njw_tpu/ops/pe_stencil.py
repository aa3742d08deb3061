"""Fused Pallas kernel for the primitive-equations tendency stage.

The PE XLA path materializes ~9.3 GB per RK4 step at 512^2 x 20 (measured
via compiled cost analysis) because every pad/shift/vertical-integral
intermediate round-trips HBM. This kernel computes one full tendency stage

    out = base + c * T(cur)

in a single pass over y-strips with all levels resident in VMEM:
read cur (4L+1 fields) + base, write out — ~250 MB per stage at
512^2 x 20 instead of ~2.3 GB.

Layout: 3-D fields are (L, by, nx) strips with two (L, 8, nx) neighbor
slabs for the 1-row y halo (single-stage kernel => halo 1; the validity
of edge rows shrinks by one, exactly covering the interior output).
x wraps periodically via in-VMEM lane rolls. Vertical sums/cumsums are
unrolled Python loops over the static L.

Eligibility: periodic BC, constant f, viscosity 0 (fall back to the XLA
path otherwise) and VMEM budget permitting (L * nx bounded — checked by
``pe_pallas_supported``).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from njw_tpu.weather.grid import GridSpec, PhysicsParams
from njw_tpu.weather.primitive import KAPPA, R_DRY, PEState


def _pe_stage_kernel(
    # cur state (center + top/bottom slabs per field)
    u_c, u_t, u_b, v_c, v_t, v_b, T_c, T_t, T_b, q_c, q_t, q_b,
    ps_c, ps_t, ps_b,
    # base state (center only — combined on the valid interior)
    bu, bv, bT, bq, bps,
    # outputs
    ou, ov, oT, oq, ops,
    *, L: int, by: int, dx: float, dy: float, f: float, c_dt: float,
):
    cx = 0.5 / dx
    cy = 0.5 / dy
    dsig = 1.0 / L

    def pad3(c, t, b):
        return jnp.concatenate([t[:, 7:8, :], c[:], b[:, 0:1, :]], axis=1)

    def pad2(c, t, b):
        return jnp.concatenate([t[7:8, :], c[:], b[0:1, :]], axis=0)

    u = pad3(u_c, u_t, u_b)
    v = pad3(v_c, v_t, v_b)
    T = pad3(T_c, T_t, T_b)
    q = pad3(q_c, q_t, q_b)
    ps = pad2(ps_c, ps_t, ps_b)   # (by+2, nx)

    def sx(a, s):
        return pltpu.roll(a, (-s) % a.shape[-1], a.ndim - 1)

    def sy(a, s):  # y shift; edge rows invalid (cropped at output)
        return pltpu.roll(a, (-s) % a.shape[-2], a.ndim - 2)

    def ddx(a):
        return (sx(a, 1) - sx(a, -1)) * cx

    def ddy(a):
        return (sy(a, 1) - sy(a, -1)) * cy

    lnps = jnp.log(ps)
    lnps_x = ddx(lnps)
    lnps_y = ddy(lnps)

    # per-level flux divergence, running sum and cumulative list
    flux_sum = None
    cum = []
    for kk in range(L):
        fd = ddx(ps * u[kk]) + ddy(ps * v[kk])
        flux_sum = fd if flux_sum is None else flux_sum + fd
        cum.append(flux_sum)
    dps = -flux_sum * dsig                       # (by+2, nx)

    # sigma-dot at interfaces 1..L-1 (0 at top/bottom)
    inv_ps = 1.0 / ps
    sdot_half = [None] * (L + 1)
    for kk in range(1, L):
        sig_h = kk / L
        sdot_half[kk] = (-sig_h * dps - cum[kk - 1] * dsig) * inv_ps
    zero = jnp.zeros_like(dps)
    sdot_half[0] = zero
    sdot_half[L] = zero

    # hydrostatic geopotential (full levels, integrating up from bottom)
    sig = [(kk + 0.5) / L for kk in range(L)]
    phi = [None] * L
    phi[L - 1] = (R_DRY * (-np.log(sig[L - 1]))) * T[L - 1]
    for kk in range(L - 2, -1, -1):
        thick = (R_DRY * 0.5 * np.log(sig[kk + 1] / sig[kk]))
        phi[kk] = phi[kk + 1] + thick * (T[kk] + T[kk + 1])

    inv2dsig = 0.5 / dsig

    for kk in range(L):
        uk, vk, Tk, qk = u[kk], v[kk], T[kk], q[kk]
        u_x, u_y = ddx(uk), ddy(uk)
        v_x, v_y = ddx(vk), ddy(vk)
        T_x, T_y = ddx(Tk), ddy(Tk)
        q_x, q_y = ddx(qk), ddy(qk)
        phi_x, phi_y = ddx(phi[kk]), ddy(phi[kk])

        # vertical advection, interface form
        sd_up = sdot_half[kk]       # k-1/2
        sd_dn = sdot_half[kk + 1]   # k+1/2
        u_up = (u[kk] - u[kk - 1]) if kk > 0 else zero
        u_dn = (u[kk + 1] - u[kk]) if kk < L - 1 else zero
        v_up = (v[kk] - v[kk - 1]) if kk > 0 else zero
        v_dn = (v[kk + 1] - v[kk]) if kk < L - 1 else zero
        T_up = (T[kk] - T[kk - 1]) if kk > 0 else zero
        T_dn = (T[kk + 1] - T[kk]) if kk < L - 1 else zero
        q_up = (q[kk] - q[kk - 1]) if kk > 0 else zero
        q_dn = (q[kk + 1] - q[kk]) if kk < L - 1 else zero
        vadv_u = (sd_dn * u_dn + sd_up * u_up) * inv2dsig
        vadv_v = (sd_dn * v_dn + sd_up * v_up) * inv2dsig
        vadv_T = (sd_dn * T_dn + sd_up * T_up) * inv2dsig
        vadv_q = (sd_dn * q_dn + sd_up * q_up) * inv2dsig

        du = (-uk * u_x - vk * u_y - vadv_u + f * vk
              - phi_x - R_DRY * Tk * lnps_x)
        dv = (-uk * v_x - vk * v_y - vadv_v - f * uk
              - phi_y - R_DRY * Tk * lnps_y)

        dlnps_adv = dps * inv_ps + uk * lnps_x + vk * lnps_y
        sdot_full = 0.5 * (sd_up + sd_dn)
        omega_over_p = sdot_full / sig[kk] + dlnps_adv
        dT = (-uk * T_x - vk * T_y - vadv_T
              + KAPPA * Tk * omega_over_p)
        dq = -uk * q_x - vk * q_y - vadv_q

        # combine with base on the valid interior rows [1, by+1)
        ou[kk, :, :] = bu[kk] + c_dt * du[1:1 + by, :]
        ov[kk, :, :] = bv[kk] + c_dt * dv[1:1 + by, :]
        oT[kk, :, :] = bT[kk] + c_dt * dT[1:1 + by, :]
        oq[kk, :, :] = bq[kk] + c_dt * dq[1:1 + by, :]

    ops[:, :] = bps[:] + c_dt * dps[1:1 + by, :]


def _pick_by(L: int, ny: int, nx: int, vmem_bytes: int) -> Optional[int]:
    """Strip height: ~3.2x the (4L+1)-field input footprint must fit."""
    for by in (32, 16, 8):
        if ny % by:
            continue
        strip = (by + 16) * nx * 4
        if 3.2 * (4 * L + 1) * strip <= vmem_bytes * 0.9:
            return by
    return None


def pe_pallas_supported(grid: GridSpec, params: PhysicsParams) -> bool:
    import numbers

    from njw_tpu.platform.device import detect

    return (
        grid.bc == "periodic"
        and grid.nx % 128 == 0
        and grid.ny % 8 == 0
        and grid.levels >= 2
        and isinstance(params.coriolis_f, numbers.Number)
        and isinstance(params.beta, numbers.Number)
        and float(params.beta) == 0.0
        and isinstance(params.viscosity, numbers.Number)
        and float(params.viscosity) == 0.0
        and _pick_by(grid.levels, grid.ny, grid.nx,
                     detect().vmem_bytes) is not None
    )


@functools.partial(
    jax.jit,
    static_argnames=("grid", "c_dt", "coriolis_f", "by", "interpret"),
)
def pe_stage_pallas(
    cur: PEState, base: PEState, *, grid: GridSpec, c_dt: float,
    coriolis_f: float = 0.0, by: Optional[int] = None,
    interpret: bool = False,
) -> PEState:
    """out = base + c_dt * T(cur) in one fused pass."""
    L, ny, nx = grid.levels, grid.ny, grid.nx
    if by is None:
        from njw_tpu.platform.device import detect

        by = _pick_by(L, ny, nx, detect().vmem_bytes)
        if by is None:
            raise ValueError("PE pallas kernel: VMEM budget exceeded")
    nby = ny // 8
    r = by // 8

    kern = functools.partial(
        _pe_stage_kernel, L=L, by=by, dx=float(grid.dx), dy=float(grid.dy),
        f=float(coriolis_f), c_dt=float(c_dt),
    )
    c3 = pl.BlockSpec((L, by, nx), lambda i: (0, i, 0),
                      memory_space=pltpu.VMEM)
    t3 = pl.BlockSpec((L, 8, nx), lambda i: (0, (i * r - 1) % nby, 0),
                      memory_space=pltpu.VMEM)
    b3 = pl.BlockSpec((L, 8, nx), lambda i: (0, (i * r + r) % nby, 0),
                      memory_space=pltpu.VMEM)
    c2 = pl.BlockSpec((by, nx), lambda i: (i, 0), memory_space=pltpu.VMEM)
    t2 = pl.BlockSpec((8, nx), lambda i: ((i * r - 1) % nby, 0),
                      memory_space=pltpu.VMEM)
    b2 = pl.BlockSpec((8, nx), lambda i: ((i * r + r) % nby, 0),
                      memory_space=pltpu.VMEM)

    s3 = jax.ShapeDtypeStruct((L, ny, nx), jnp.float32)
    s2 = jax.ShapeDtypeStruct((ny, nx), jnp.float32)

    out = pl.pallas_call(
        kern,
        grid=(ny // by,),
        in_specs=(
            [c3, t3, b3] * 4 + [c2, t2, b2]      # cur
            + [c3, c3, c3, c3, c2]               # base (center only)
        ),
        out_specs=(c3, c3, c3, c3, c2),
        out_shape=(s3, s3, s3, s3, s2),
        # the (4L+1)-field working set slightly exceeds the default 16M
        # scoped-vmem cap at L=20; v5e has headroom for a modest raise
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024),
        interpret=interpret,
    )(
        cur.u, cur.u, cur.u, cur.v, cur.v, cur.v,
        cur.T, cur.T, cur.T, cur.q, cur.q, cur.q,
        cur.ps, cur.ps, cur.ps,
        base.u, base.v, base.T, base.q, base.ps,
    )
    return PEState(u=out[0], v=out[1], T=out[2], q=out[3], ps=out[4])


def make_pe_pallas_rk4_stepper(grid: GridSpec, params: PhysicsParams,
                               dt: float, interpret: bool = False):
    """RK4 via 4 fused stage kernels + one XLA accumulator pass:
    s1 = s + dt/2 T(s);  s2 = s + dt/2 T(s1);  s3 = s + dt T(s2)
    acc = (-s + s1 + 2 s2 + s3)/3;  s' = acc + dt/6 T(s3)."""
    from njw_tpu.weather.integrators import Stepper

    f = float(params.coriolis_f)
    dt = float(dt)
    stage = functools.partial(pe_stage_pallas, grid=grid, coriolis_f=f,
                              interpret=interpret)

    def step(carry, s: PEState, _dt_ignored):
        s1 = stage(s, s, c_dt=0.5 * dt)
        s2 = stage(s1, s, c_dt=0.5 * dt)
        s3 = stage(s2, s, c_dt=dt)
        acc = jax.tree.map(
            lambda a, b, c, d: (-a + b + 2.0 * c + d) * (1.0 / 3.0),
            s, s1, s2, s3)
        out = stage(s3, acc, c_dt=dt / 6.0)
        return carry, out

    return Stepper(lambda s: (), step, "pe_rk4_pallas", 4)
