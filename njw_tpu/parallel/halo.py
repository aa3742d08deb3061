"""Halo exchange over a 2-D device mesh via shard_map + lax.ppermute.

The multi-chip generalization of the reference's intra-GPU shared-memory
halo tiles (ref: shallow_water_kernels.cu:61-188 stages a block+1 halo into
shared memory with __syncthreads) — here the "block" is a whole chip's
shard and the staging is ICI neighbor exchange:

  1. each device sends its edge strips to its mesh neighbors (ppermute
     rings along 'x' and 'y'),
  2. the local block is padded with the received strips (corners come for
     free by exchanging y-strips of the already-x-padded block),
  3. stencils run on the padded block with plain slicing — no rolls, no
     global communication.

XLA schedules the ppermutes asynchronously; because the interior stencil
has no data dependence on the halo strips, the compiler can overlap the
edge exchange with interior compute (the BASELINE overlap requirement —
measured by the scaling benchmark, see njw_tpu/bench).

Boundary conditions: 'periodic' maps to pure ppermute rings. 'clamped' uses
the same ring exchange plus edge-clamp masking on the global-boundary
shards (ref CPU stencil behavior, weather_simulation.cpp:509-513).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from njw_tpu.weather.grid import GridSpec, PhysicsParams, WeatherState


def _ring_shift(x: jnp.ndarray, axis_name: str, shift: int) -> jnp.ndarray:
    """ppermute ring: returns the array held by the neighbor at -shift.

    shift=+1: each device receives its *left/up* neighbor's payload
    (src i -> dst i+1).
    """
    n = lax.axis_size(axis_name)
    if n == 1:
        return x
    perm = [(i, (i + shift) % n) for i in range(n)]
    return lax.ppermute(x, axis_name, perm)


def halo_pad_2d(
    f: jnp.ndarray, halo: int = 1, *, x_axis: str = "x", y_axis: str = "y",
    bc: str = "periodic", wall_sign_x: float = 1.0,
    wall_sign_y: float = 1.0,
) -> jnp.ndarray:
    """Pad a local (ly, lx) shard to (ly+2h, lx+2h) with neighbor data.

    Must be called inside shard_map over a ('y','x') mesh. For
    bc='clamped'/'reflective' the exchange is still a ring, but shards on
    the global boundary overwrite the wrapped halo with their own edge
    (clamp), scaled by wall_sign_{x,y} — the reflective wall-normal
    velocity ghost flip is wall_sign_x=-1 for u, wall_sign_y=-1 for v
    (SURVEY §7 hard-part 5: per-shard edge masking; matches the
    whole-domain construction in dynamics.swe_tendencies, where the x
    flip is applied before the y clamp so corners get exactly one flip).
    """
    h = halo
    clampy = bc in ("clamped", "reflective")
    # --- x direction (minor axis) ---
    left_halo = _ring_shift(f[..., :, -h:], x_axis, +1)   # from left neighbor
    right_halo = _ring_shift(f[..., :, :h], x_axis, -1)   # from right neighbor
    if clampy:
        ix = lax.axis_index(x_axis)
        nx = lax.axis_size(x_axis)
        left_halo = jnp.where(
            ix == 0, wall_sign_x * f[..., :, :1].repeat(h, -1), left_halo)
        right_halo = jnp.where(
            ix == nx - 1, wall_sign_x * f[..., :, -1:].repeat(h, -1),
            right_halo)
    fx = jnp.concatenate([left_halo, f, right_halo], axis=-1)

    # --- y direction (includes x halos -> corners correct) ---
    top_halo = _ring_shift(fx[..., -h:, :], y_axis, +1)
    bot_halo = _ring_shift(fx[..., :h, :], y_axis, -1)
    if clampy:
        iy = lax.axis_index(y_axis)
        ny = lax.axis_size(y_axis)
        top_halo = jnp.where(
            iy == 0, wall_sign_y * fx[..., :1, :].repeat(h, -2), top_halo)
        bot_halo = jnp.where(
            iy == ny - 1, wall_sign_y * fx[..., -1:, :].repeat(h, -2),
            bot_halo)
    return jnp.concatenate([top_halo, fx, bot_halo], axis=-2)


def make_padded_shift_fn(halo: int, ly: int, lx: int):
    """Slicing-view shift accessor over an (ly+2h, lx+2h) padded block,
    matching the signature of dynamics.make_shift_fn: shift(f, dxi, dyi)
    returns the (ly, lx) view offset by (dxi, dyi)."""
    h = halo

    def shift(fp: jnp.ndarray, dxi: int = 0, dyi: int = 0) -> jnp.ndarray:
        return fp[..., h + dyi: h + dyi + ly, h + dxi: h + dxi + lx]

    return shift


def interior_crop(halo: int, ly: int, lx: int):
    h = halo

    def crop(fp: jnp.ndarray) -> jnp.ndarray:
        return fp[..., h: h + ly, h: h + lx]

    return crop


# ---------------------------------------------------------------------------
# Sharded SWE step
# ---------------------------------------------------------------------------

def sharded_state(state, mesh: Mesh):
    """Place a whole-domain state pytree onto the mesh: trailing two dims
    (rows, cols) over ('y', 'x'); leading dims (e.g. levels) replicated."""

    def put(a):
        names = mesh.axis_names
        y_ax = "y" if "y" in names else None
        x_ax = "x" if "x" in names else None
        spec = P(*([None] * (a.ndim - 2) + [y_ax, x_ax]))
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree.map(put, state)


def _pad4_filler(f, y_axis: str = "y"):
    """y halo pad for the fused SWE RK4 kernel paths: exchange only the
    4 rows the 4-stage kernel consumes (top slab rows 4-7, bottom slab
    rows 0-3), embedded in 8-row slabs with zero filler it never reads —
    half the ICI payload of full 8-row exchange."""
    top4 = _ring_shift(f[..., -4:, :], y_axis, +1)
    bot4 = _ring_shift(f[..., :4, :], y_axis, -1)
    filler = jnp.zeros(f.shape[:-2] + (4, f.shape[-1]), f.dtype)
    return jnp.concatenate([filler, top4, f, bot4, filler], axis=-2)


def _stitch(top, left, interior, right, bot):
    """Reassemble (1, lx) + (h, 1) + (h, w) + (h, 1) + (1, lx) edge strips
    into the full (ly, lx) block (leading dims broadcast)."""
    mid = jnp.concatenate([left, interior, right], axis=-1)
    return jnp.concatenate([top, mid, bot], axis=-2)


def sharded_swe_step(
    grid: GridSpec, params: PhysicsParams, mesh: Mesh, *, dt: float,
    method: str = "rk4", n_steps: int = 1, overlap: bool = True,
    donate: bool = False,
):
    """Build a jitted multi-chip SWE step: shard_map over the ('y','x')
    mesh, halo exchange per tendency evaluation (4x/step for RK4 — the
    multi-stage exchange pattern SURVEY §7 flags as the hard part).

    overlap=True (default) computes the interior stencil FROM THE UNPADDED
    LOCAL BLOCK — no data dependence on the ppermute results — so XLA can
    schedule the halo exchange entirely behind interior compute; only the
    four 1-cell edge strips wait for the halos (the BASELINE
    interior/edge-overlap requirement). Identical arithmetic per point.

    Returns step_fn(state) -> state operating on sharded WeatherState.
    """
    from njw_tpu.weather.dynamics import swe_tendencies_from_shifts
    from njw_tpu.weather.integrators import make_stepper

    py, px = mesh.devices.shape
    if grid.ny % py or grid.nx % px:
        raise ValueError(
            f"grid {grid.ny}x{grid.nx} not divisible by mesh {py}x{px}"
        )
    ly, lx = grid.ny // py, grid.nx // px
    shift = make_padded_shift_fn(1, ly, lx)
    crop = interior_crop(1, ly, lx)
    from njw_tpu.weather.dynamics import scalar_bc
    reflective = grid.bc == "reflective"
    bc = scalar_bc(grid.bc)
    su_x = -1.0 if reflective else 1.0   # u ghost flips at global x walls
    sv_y = -1.0 if reflective else 1.0   # v ghost flips at global y walls
    beta = params.beta
    use_beta = not (isinstance(beta, (int, float)) and beta == 0.0)
    if ly < 4 or lx < 4:
        overlap = False  # degenerate blocks: no interior to overlap

    def local_params():
        """Per-shard physics params; beta-plane f becomes a (ly, 1) field
        sliced by the shard's global row offset (matches the whole-domain
        dynamics.coriolis_field: f0 + beta*(y/(ny-1) - 1/2))."""
        if not use_beta:
            return params
        iy = lax.axis_index("y")
        rows = jnp.float32(iy * ly) + jnp.arange(ly, dtype=jnp.float32)
        y_norm = rows[:, None] / max(grid.ny - 1, 1)
        return params.replace(
            coriolis_f=params.coriolis_f + beta * (y_norm - 0.5))

    def _region_params(p, rows):
        f = p.coriolis_f
        if isinstance(f, jnp.ndarray) and f.ndim == 2:
            return p.replace(coriolis_f=f[rows, :])
        return p

    bcv = grid.bc if reflective else bc   # velocity pad rule

    def local_tendency_padded(s: WeatherState) -> WeatherState:
        up = halo_pad_2d(s.u, 1, bc=bcv, wall_sign_x=su_x)
        vp = halo_pad_2d(s.v, 1, bc=bcv, wall_sign_y=sv_y)
        hp = halo_pad_2d(s.h, 1, bc=bc)
        du, dv, dh = swe_tendencies_from_shifts(
            up, vp, hp, shift, grid, local_params(), interior=crop
        )
        return WeatherState(u=du, v=dv, h=dh)

    def local_tendency_overlap(s: WeatherState) -> WeatherState:
        p = local_params()
        # halo exchange (async collectives) issued first ...
        up = halo_pad_2d(s.u, 1, bc=bcv, wall_sign_x=su_x)
        vp = halo_pad_2d(s.v, 1, bc=bcv, wall_sign_y=sv_y)
        hp = halo_pad_2d(s.h, 1, bc=bc)
        # ... interior depends ONLY on the local block: computes while
        # the edge strips are in flight
        sh_i = make_padded_shift_fn(1, ly - 2, lx - 2)
        cr_i = interior_crop(1, ly - 2, lx - 2)
        di = swe_tendencies_from_shifts(
            s.u, s.v, s.h, sh_i, grid,
            _region_params(p, slice(1, ly - 1)), interior=cr_i)

        def strip(rows, cols, h, w, prows):
            sl = lambda a: a[..., rows, cols]
            sh = make_padded_shift_fn(1, h, w)
            cr = interior_crop(1, h, w)
            return swe_tendencies_from_shifts(
                sl(up), sl(vp), sl(hp), sh, grid,
                _region_params(p, prows), interior=cr)

        top = strip(slice(0, 3), slice(None), 1, lx, slice(0, 1))
        bot = strip(slice(ly - 1, ly + 2), slice(None), 1, lx,
                    slice(ly - 1, ly))
        left = strip(slice(1, ly + 1), slice(0, 3), ly - 2, 1,
                     slice(1, ly - 1))
        right = strip(slice(1, ly + 1), slice(lx - 1, lx + 2), ly - 2, 1,
                      slice(1, ly - 1))
        out = tuple(
            _stitch(top[i], left[i], di[i], right[i], bot[i])
            for i in range(3))
        return WeatherState(u=out[0], v=out[1], h=out[2])

    local_tendency = local_tendency_overlap if overlap \
        else local_tendency_padded

    stepper = make_stepper(method, local_tendency)
    dt_f = jnp.float32(dt)

    def local_steps(state: WeatherState) -> WeatherState:
        carry = stepper.init(state)

        def body(cs, _):
            c, s = cs
            c, s = stepper.step(c, s, dt_f)
            return (c, s), None

        (carry, state), _ = lax.scan(body, (carry, state), None,
                                     length=n_steps)
        return state

    spec = WeatherState(u=P("y", "x"), v=P("y", "x"), h=P("y", "x"))
    step_fn = jax.shard_map(
        local_steps, mesh=mesh, in_specs=(spec,), out_specs=spec,
        check_vma=False,
    )
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def sharded_pe_step(
    grid: GridSpec, params: PhysicsParams, mesh: Mesh, *, dt: float,
    method: str = "rk4", n_steps: int = 1, overlap: bool = True,
    donate: bool = False,
):
    """Multi-chip primitive-equations step (BASELINE config 4/5): the
    level dimension stays local (vertical integrals are cheap column
    ops); the horizontal grid is 2-D decomposed with a fused multi-field
    halo exchange — all five prognostic fields (u, v, T, q x levels + ps)
    exchange per RK stage. overlap=True computes the interior from the
    unpadded local block so the exchange hides behind it (see
    sharded_swe_step).
    """
    from njw_tpu.weather.integrators import make_stepper
    from njw_tpu.weather.primitive import PEState, pe_tendencies_from_shifts

    py, px = mesh.devices.shape
    if grid.ny % py or grid.nx % px:
        raise ValueError(
            f"grid {grid.ny}x{grid.nx} not divisible by mesh {py}x{px}"
        )
    ly, lx = grid.ny // py, grid.nx // px
    shift = make_padded_shift_fn(1, ly, lx)
    crop = interior_crop(1, ly, lx)
    from njw_tpu.weather.dynamics import scalar_bc
    reflective = grid.bc == "reflective"
    bc = scalar_bc(grid.bc)
    bcv = grid.bc if reflective else bc
    su_x = -1.0 if reflective else 1.0   # u ghost flips at global x walls
    sv_y = -1.0 if reflective else 1.0   # v ghost flips at global y walls
    if ly < 4 or lx < 4:
        overlap = False

    def _pad_state(s: PEState) -> PEState:
        return PEState(
            u=halo_pad_2d(s.u, 1, bc=bcv, wall_sign_x=su_x),
            v=halo_pad_2d(s.v, 1, bc=bcv, wall_sign_y=sv_y),
            T=halo_pad_2d(s.T, 1, bc=bc), q=halo_pad_2d(s.q, 1, bc=bc),
            ps=halo_pad_2d(s.ps, 1, bc=bc),
        )

    def local_tendency_padded(s: PEState) -> PEState:
        return pe_tendencies_from_shifts(_pad_state(s), shift, grid,
                                         params, interior=crop)

    def local_tendency_overlap(s: PEState) -> PEState:
        padded = _pad_state(s)
        # interior from the unpadded block — no ppermute dependence
        sh_i = make_padded_shift_fn(1, ly - 2, lx - 2)
        cr_i = interior_crop(1, ly - 2, lx - 2)
        di = pe_tendencies_from_shifts(s, sh_i, grid, params,
                                       interior=cr_i)

        def strip(rows, cols, h, w):
            sl = lambda a: a[..., rows, cols]
            sub = PEState(u=sl(padded.u), v=sl(padded.v), T=sl(padded.T),
                          q=sl(padded.q), ps=sl(padded.ps))
            return pe_tendencies_from_shifts(
                sub, make_padded_shift_fn(1, h, w), grid, params,
                interior=interior_crop(1, h, w))

        top = strip(slice(0, 3), slice(None), 1, lx)
        bot = strip(slice(ly - 1, ly + 2), slice(None), 1, lx)
        left = strip(slice(1, ly + 1), slice(0, 3), ly - 2, 1)
        right = strip(slice(1, ly + 1), slice(lx - 1, lx + 2), ly - 2, 1)
        return PEState(*(
            _stitch(getattr(top, n), getattr(left, n), getattr(di, n),
                    getattr(right, n), getattr(bot, n))
            for n in ("u", "v", "T", "q", "ps")))

    local_tendency = local_tendency_overlap if overlap \
        else local_tendency_padded

    stepper = make_stepper(method, local_tendency)
    dt_f = jnp.float32(dt)

    def local_steps(state: PEState) -> PEState:
        carry = stepper.init(state)

        def body(cs, _):
            c, s = cs
            c, s = stepper.step(c, s, dt_f)
            return (c, s), None

        (carry, state), _ = lax.scan(body, (carry, state), None,
                                     length=n_steps)
        return state

    p3 = P(None, "y", "x")
    spec = PEState(u=p3, v=p3, T=p3, q=p3, ps=P("y", "x"))
    step_fn = jax.shard_map(
        local_steps, mesh=mesh, in_specs=(spec,), out_specs=spec,
        check_vma=False,
    )
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


# ---------------------------------------------------------------------------
# Sharded barotropic step: 1-D row decomposition + distributed Poisson
# (BASELINE config 3: barotropic 1024^2 with distributed spectral solve).
# ---------------------------------------------------------------------------

def _halo_pad_y(f: jnp.ndarray, bc: str = "periodic") -> jnp.ndarray:
    """Pad only the row axis with 1-cell neighbor halos (x stays whole)."""
    top = _ring_shift(f[..., -1:, :], "y", +1)
    bot = _ring_shift(f[..., :1, :], "y", -1)
    if bc == "clamped":
        iy = lax.axis_index("y")
        ny = lax.axis_size("y")
        top = jnp.where(iy == 0, f[..., :1, :], top)
        bot = jnp.where(iy == ny - 1, f[..., -1:, :], bot)
    return jnp.concatenate([top, f, bot], axis=-2)


def _arakawa_padded(p: jnp.ndarray, z: jnp.ndarray, dx: float, dy: float):
    """Arakawa Jacobian on y-padded (ly+2, nx) blocks; x wraps locally.
    Same arithmetic as weather.barotropic.arakawa_jacobian."""
    ly = p.shape[-2] - 2

    def sh(f, dx_, dy_):
        out = f
        if dx_:
            out = jnp.roll(out, -dx_, axis=-1)
        return out[..., 1 + dy_: 1 + dy_ + ly, :]

    pE, pW = sh(p, 1, 0), sh(p, -1, 0)
    pN, pS = sh(p, 0, 1), sh(p, 0, -1)
    pNE, pNW = sh(p, 1, 1), sh(p, -1, 1)
    pSE, pSW = sh(p, 1, -1), sh(p, -1, -1)
    zE, zW = sh(z, 1, 0), sh(z, -1, 0)
    zN, zS = sh(z, 0, 1), sh(z, 0, -1)
    zNE, zNW = sh(z, 1, 1), sh(z, -1, 1)
    zSE, zSW = sh(z, 1, -1), sh(z, -1, -1)
    pc = sh(p, 0, 0)
    zc = sh(z, 0, 0)

    j1 = (pE - pW) * (zN - zS) - (pN - pS) * (zE - zW)
    j2 = (pE * (zNE - zSE) - pW * (zNW - zSW)
          - pN * (zNE - zNW) + pS * (zSE - zSW))
    j3 = (zN * (pNE - pNW) - zS * (pSE - pSW)
          - zE * (pNE - pSE) + zW * (pNW - pSW))
    del pc, zc
    return (j1 + j2 + j3) / (12.0 * dx * dy)


def sharded_barotropic_step(
    grid: GridSpec, params: PhysicsParams, mesh: Mesh, *, dt: float,
    method: str = "rk4", n_steps: int = 1, donate: bool = False,
):
    """Multi-chip barotropic vorticity step over a 1-D ('y',) row
    decomposition: per-stage distributed transpose-FFT Poisson inversion +
    y halo exchange for the Arakawa Jacobian.

    A 2-axis ('y','x') mesh with px > 1 dispatches to the 2-D
    decomposition (pencil transpose FFT + 2-D halo exchange,
    sharded_barotropic_step_2d).
    """
    from njw_tpu.parallel.fft import distributed_poisson_solve
    from njw_tpu.weather.barotropic import BarotropicState
    from njw_tpu.weather.integrators import make_stepper

    if grid.bc != "periodic":
        raise NotImplementedError("barotropic requires periodic BC")
    if mesh.devices.ndim == 2 and mesh.devices.shape[1] > 1:
        if not {"y", "x"} <= set(mesh.axis_names):
            raise ValueError(
                "2-D barotropic decomposition needs a mesh with axes "
                f"('y', 'x'); got {mesh.axis_names}")
        return sharded_barotropic_step_2d(
            grid, params, mesh, dt=dt, method=method, n_steps=n_steps)
    n_dev = mesh.devices.size
    if grid.ny % n_dev or grid.nx % n_dev:
        raise ValueError(
            f"grid {grid.ny}x{grid.nx} must divide the {n_dev}-device mesh "
            "in BOTH axes (the transpose FFT re-shards x)")
    beta = params.beta
    nu = params.viscosity

    def local_tendency(s: BarotropicState) -> BarotropicState:
        zeta = s.zeta
        psi = distributed_poisson_solve(zeta, grid.dx, grid.dy, "y")
        pp = _halo_pad_y(psi)
        zp = _halo_pad_y(zeta)
        dz = -_arakawa_padded(pp, zp, grid.dx, grid.dy)
        if not (isinstance(beta, (int, float)) and beta == 0.0):
            v = (jnp.roll(psi, -1, axis=-1)
                 - jnp.roll(psi, 1, axis=-1)) * (0.5 / grid.dx)
            dz = dz - beta * v
        if not (isinstance(nu, (int, float)) and nu == 0.0):
            lap_x = (jnp.roll(zeta, -1, -1) - 2 * zeta
                     + jnp.roll(zeta, 1, -1)) / (grid.dx * grid.dx)
            lap_y = (zp[..., 2:, :] - 2 * zeta
                     + zp[..., :-2, :]) / (grid.dy * grid.dy)
            dz = dz + nu * (lap_x + lap_y)
        return BarotropicState(zeta=dz)

    stepper = make_stepper(method, local_tendency)
    dt_f = jnp.float32(dt)

    def local_steps(state):
        carry = stepper.init(state)

        def body(cs, _):
            c, s = cs
            c, s = stepper.step(c, s, dt_f)
            return (c, s), None

        (carry, state), _ = lax.scan(body, (carry, state), None,
                                     length=n_steps)
        return state

    from njw_tpu.weather.barotropic import BarotropicState as BS

    spec = BS(zeta=P("y", None))
    step_fn = jax.shard_map(local_steps, mesh=mesh, in_specs=(spec,),
                            out_specs=spec, check_vma=False)
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def _arakawa_padded_2d(p: jnp.ndarray, z: jnp.ndarray, dx: float,
                       dy: float):
    """Arakawa Jacobian on fully halo-padded (ly+2, lx+2) blocks (both
    axes exchanged). Same arithmetic as weather.barotropic
    .arakawa_jacobian; pure slicing, no rolls."""
    ly = p.shape[-2] - 2
    lx = p.shape[-1] - 2

    def sh(f, dx_, dy_):
        return f[..., 1 + dy_: 1 + dy_ + ly, 1 + dx_: 1 + dx_ + lx]

    pE, pW = sh(p, 1, 0), sh(p, -1, 0)
    pN, pS = sh(p, 0, 1), sh(p, 0, -1)
    pNE, pNW = sh(p, 1, 1), sh(p, -1, 1)
    pSE, pSW = sh(p, 1, -1), sh(p, -1, -1)
    zE, zW = sh(z, 1, 0), sh(z, -1, 0)
    zN, zS = sh(z, 0, 1), sh(z, 0, -1)
    zNE, zNW = sh(z, 1, 1), sh(z, -1, 1)
    zSE, zSW = sh(z, 1, -1), sh(z, -1, -1)

    j1 = (pE - pW) * (zN - zS) - (pN - pS) * (zE - zW)
    j2 = (pE * (zNE - zSE) - pW * (zNW - zSW)
          - pN * (zNE - zNW) + pS * (zSE - zSW))
    j3 = (zN * (pNE - pNW) - zS * (pSE - pSW)
          - zE * (pNE - pSE) + zW * (pNW - pSW))
    return (j1 + j2 + j3) / (12.0 * dx * dy)


def sharded_barotropic_step_2d(
    grid: GridSpec, params: PhysicsParams, mesh: Mesh, *, dt: float,
    method: str = "rk4", n_steps: int = 1, donate: bool = False,
):
    """Multi-chip barotropic vorticity step over a 2-D ('y','x') mesh:
    per-stage PENCIL transpose-FFT Poisson inversion (parallel.fft
    ._pencilize + the combined-axis 1-D core) + 2-D halo exchange for the
    Arakawa Jacobian. The reference has no distributed solver of any kind
    (SURVEY §5.8); this is the config-3 path at pod scale where a 1-D ring
    would run out of rows.
    """
    from njw_tpu.parallel.fft import distributed_poisson_solve_2d
    from njw_tpu.weather.barotropic import BarotropicState
    from njw_tpu.weather.integrators import make_stepper

    if grid.bc != "periodic":
        raise NotImplementedError("barotropic requires periodic BC")
    py, px = mesh.shape["y"], mesh.shape["x"]
    n_dev = py * px
    if grid.ny % py or grid.nx % px:
        raise ValueError(f"grid {grid.ny}x{grid.nx} must tile the "
                         f"({py},{px}) mesh")
    if (grid.ny // py) % px or grid.ny % n_dev or grid.nx % n_dev:
        raise ValueError(
            f"grid {grid.ny}x{grid.nx} must divide the {n_dev}-device mesh "
            "in BOTH axes (the pencil transpose FFT re-shards x)")
    beta = params.beta
    nu = params.viscosity

    def local_tendency(s: BarotropicState) -> BarotropicState:
        zeta = s.zeta
        psi = distributed_poisson_solve_2d(zeta, grid.dx, grid.dy, "y", "x")
        pp = halo_pad_2d(psi, 1)
        zp = halo_pad_2d(zeta, 1)
        dz = -_arakawa_padded_2d(pp, zp, grid.dx, grid.dy)
        if not (isinstance(beta, (int, float)) and beta == 0.0):
            v = (pp[..., 1:-1, 2:] - pp[..., 1:-1, :-2]) * (0.5 / grid.dx)
            dz = dz - beta * v
        if not (isinstance(nu, (int, float)) and nu == 0.0):
            lap_x = (zp[..., 1:-1, 2:] - 2 * zeta
                     + zp[..., 1:-1, :-2]) / (grid.dx * grid.dx)
            lap_y = (zp[..., 2:, 1:-1] - 2 * zeta
                     + zp[..., :-2, 1:-1]) / (grid.dy * grid.dy)
            dz = dz + nu * (lap_x + lap_y)
        return BarotropicState(zeta=dz)

    stepper = make_stepper(method, local_tendency)
    dt_f = jnp.float32(dt)

    def local_steps(state):
        carry = stepper.init(state)

        def body(cs, _):
            c, s = cs
            c, s = stepper.step(c, s, dt_f)
            return (c, s), None

        (carry, state), _ = lax.scan(body, (carry, state), None,
                                     length=n_steps)
        return state

    spec = BarotropicState(zeta=P("y", "x"))
    step_fn = jax.shard_map(local_steps, mesh=mesh, in_specs=(spec,),
                            out_specs=spec, check_vma=False)
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def sharded_pe_step_pallas(
    grid: GridSpec, params: PhysicsParams, mesh: Mesh, *, dt: float,
    n_steps: int = 1, interpret: bool = False, donate: bool = False,
):
    """Multi-chip primitive equations with the FUSED PE STAGE KERNEL per
    shard (the BASELINE config-5 fast path): 1-D row decomposition; each
    RK4 stage exchanges ONE halo row per field over the 'y' ring (padded
    to an 8-row slab for sublane tiling — only the true row is read by
    the kernel), then runs the fused tendency+axpy stage kernel on the
    padded block. 4 exchanges + 4 kernel passes per step.
    """
    import numbers

    from njw_tpu.ops.pe_stencil import pe_stage_pallas_local
    from njw_tpu.weather.primitive import PEState

    if grid.bc != "periodic":
        raise NotImplementedError("pallas sharded PE requires periodic BC")
    if not isinstance(params.coriolis_f, numbers.Number):
        raise NotImplementedError("constant Coriolis f only")
    if mesh.devices.ndim == 2 and mesh.devices.shape[1] > 1:
        return sharded_pe_step_pallas_2d(
            grid, params, mesh, dt=dt, n_steps=n_steps, interpret=interpret)
    n_dev = int(mesh.devices.size)
    if grid.ny % n_dev:
        raise ValueError(f"ny={grid.ny} not divisible by {n_dev} devices")
    ly = grid.ny // n_dev
    if ly % 8 or grid.nx % 128:
        raise ValueError("per-shard rows must be a multiple of 8 and "
                         "nx a multiple of 128")
    L = grid.levels
    dt = float(dt)
    f = float(params.coriolis_f)

    def pad8(a):
        """Exchange ONE halo row each way; embed in 8-row slabs (rows
        0-6 / 9-15 of the pads are zero filler the kernel never reads)."""
        top_row = _ring_shift(a[..., -1:, :], "y", +1)
        bot_row = _ring_shift(a[..., :1, :], "y", -1)
        filler = jnp.zeros(a.shape[:-2] + (7, a.shape[-1]), a.dtype)
        return jnp.concatenate(
            [filler, top_row, a, bot_row, filler], axis=-2)

    def stage(cur: PEState, base: PEState, c_dt: float) -> PEState:
        return pe_stage_pallas_local(
            pad8(cur.u), pad8(cur.v), pad8(cur.T), pad8(cur.q),
            pad8(cur.ps), base, ly=ly, nx=grid.nx, L=L, c_dt=c_dt,
            coriolis_f=f, dx=float(grid.dx), dy=float(grid.dy),
            interpret=interpret,
        )

    def one_step(s: PEState) -> PEState:
        s1 = stage(s, s, 0.5 * dt)
        s2 = stage(s1, s, 0.5 * dt)
        s3 = stage(s2, s, dt)
        acc = jax.tree.map(
            lambda a, b, c, d: (-a + b + 2.0 * c + d) * (1.0 / 3.0),
            s, s1, s2, s3)
        return stage(s3, acc, dt / 6.0)

    def local_steps(state: PEState) -> PEState:
        def body(s, _):
            return one_step(s), None

        state, _ = lax.scan(body, state, None, length=n_steps)
        return state

    p3 = P(None, "y", None)
    spec = PEState(u=p3, v=p3, T=p3, q=p3, ps=P("y", None))
    step_fn = jax.shard_map(local_steps, mesh=mesh, in_specs=(spec,),
                            out_specs=spec, check_vma=False)
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def sharded_pe_step_pallas_fused(
    grid: GridSpec, params: PhysicsParams, mesh: Mesh, *, dt: float,
    n_steps: int = 1, interpret: bool = False, donate: bool = False,
):
    """Multi-chip PE with the WHOLE-RK4 fused kernel per shard (r4):
    ONE 4-row halo exchange + ONE kernel pass per step — vs the stage
    path's four of each. Same volume over ICI, 4x fewer collective
    latencies; per-chip, the fused kernel's single HBM round-trip
    (BENCH_NOTES r4: config 5 at 57.6 ms/step single-chip).
    1-D row decomposition, x whole per shard.
    """
    import numbers

    from njw_tpu.weather.primitive import PEState

    if grid.bc != "periodic":
        raise NotImplementedError("pallas sharded PE requires periodic BC")
    if not isinstance(params.coriolis_f, numbers.Number):
        raise NotImplementedError("constant Coriolis f only")
    if mesh.devices.ndim == 2 and mesh.devices.shape[1] > 1:
        return sharded_pe_step_pallas_fused_2d(
            grid, params, mesh, dt=dt, n_steps=n_steps,
            interpret=interpret, donate=donate)
    n_dev = int(mesh.devices.size)
    if grid.ny % n_dev:
        raise ValueError(f"ny={grid.ny} not divisible by {n_dev} devices")
    ly = grid.ny // n_dev
    if ly % 8 or grid.nx % 128:
        raise ValueError("per-shard rows must be a multiple of 8 and "
                         "nx a multiple of 128")
    L = grid.levels
    dt = float(dt)
    f = float(params.coriolis_f)

    from njw_tpu.ops.pe_stencil import (
        pe_rk4_local_pick_by, pe_rk4_pallas_carry,
    )

    by = pe_rk4_local_pick_by(L, ly, grid.nx)

    # Persistent by-row-padded carry (r4, same pattern as the sharded SWE
    # path): exchange FOUR halo rows each way once per step into the
    # carry's halo band (the fused kernel reads slab rows t[-4:] / b[:4];
    # the rest of the band is never consumed), and the carry-form kernel
    # writes the next padded block directly — no per-step full-state
    # concat of the (4L+1)-plane state.
    def refresh(a):
        top = _ring_shift(a[..., by + ly - 4:by + ly, :], "y", +1)
        bot = _ring_shift(a[..., by:by + 4, :], "y", -1)
        at = (0,) * (a.ndim - 2)
        a = lax.dynamic_update_slice(a, top, at + (by - 4, 0))
        return lax.dynamic_update_slice(a, bot, at + (by + ly, 0))

    def to_carry(a):
        zpad = jnp.zeros(a.shape[:-2] + (by, a.shape[-1]), a.dtype)
        return jnp.concatenate([zpad, a, zpad], axis=-2)

    def local_steps(state: PEState) -> PEState:
        def body(c, _):
            pu, pv, pT, pq, pps = (refresh(p) for p in c)
            return pe_rk4_pallas_carry(
                pu, pv, pT, pq, pps, ly=ly, nx=grid.nx, L=L, by=by,
                dt=dt, coriolis_f=f, dx=float(grid.dx), dy=float(grid.dy),
                interpret=interpret), None

        carry = tuple(to_carry(a) for a in
                      (state.u, state.v, state.T, state.q, state.ps))
        (pu, pv, pT, pq, pps), _ = lax.scan(body, carry, None,
                                            length=n_steps)
        sl = lambda a: a[..., by:by + ly, :]
        return PEState(u=sl(pu), v=sl(pv), T=sl(pT), q=sl(pq), ps=sl(pps))

    p3 = P(None, "y", None)
    spec = PEState(u=p3, v=p3, T=p3, q=p3, ps=P("y", None))
    step_fn = jax.shard_map(local_steps, mesh=mesh, in_specs=(spec,),
                            out_specs=spec, check_vma=False)
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def sharded_swe_step_pallas(
    grid: GridSpec, params: PhysicsParams, mesh: Mesh, *, dt: float,
    n_steps: int = 1, interpret: bool = False, donate: bool = False,
):
    """Multi-chip SWE RK4 with the FUSED PALLAS KERNEL per shard: each
    step exchanges 8-row halos over the 'y' ring (one ppermute pair per
    field), then runs the whole 4-stage RK4 in one kernel pass on the
    padded block. 1-D row decomposition (x whole per shard; the kernel's
    lane rolls give periodic x for free).

    This is the production fast path for multi-chip SWE: per-chip speed of
    the fused kernel (~13G points/s on v5e) + ICI halo exchange.

    A 2-axis ('y','x') mesh with px > 1 dispatches to the 2-D
    decomposition (x halo slabs + x_halo-cropping kernel,
    sharded_swe_step_pallas_2d).
    """
    import numbers

    from njw_tpu.ops.stencil import _pick_by, swe_rk4_step_pallas_carry

    if grid.bc != "periodic":
        raise NotImplementedError("pallas sharded step requires periodic BC")
    if not isinstance(params.coriolis_f, numbers.Number):
        raise NotImplementedError("constant Coriolis f only")
    if mesh.devices.ndim == 2 and mesh.devices.shape[1] > 1:
        return sharded_swe_step_pallas_2d(
            grid, params, mesh, dt=dt, n_steps=n_steps, interpret=interpret)
    n_dev = int(mesh.devices.size)
    if grid.ny % n_dev:
        raise ValueError(f"ny={grid.ny} not divisible by {n_dev} devices")
    ly = grid.ny // n_dev
    if ly % 8:
        raise ValueError("per-shard rows must be a multiple of 8")
    nx = grid.nx

    from njw_tpu.platform.device import detect

    by = _pick_by(ly, nx, detect().vmem_bytes)

    # Persistent by-row-padded carry (r4): the padded block is the scan
    # carry; each step ppermutes only the 4 needed rows per side and
    # writes them into the halo band with static-offset updates, then the
    # carry-form kernel produces the next padded block directly. This
    # removes the per-step full-state concat copy of the old path
    # (measured 0.40 -> see BENCH_NOTES r4 sharded table).
    def refresh(P):
        top4 = _ring_shift(P[by + ly - 4:by + ly, :], "y", +1)
        bot4 = _ring_shift(P[by:by + 4, :], "y", -1)
        P = lax.dynamic_update_slice(P, top4, (by - 4, 0))
        return lax.dynamic_update_slice(P, bot4, (by + ly, 0))

    def to_carry(f):
        zpad = jnp.zeros((by,) + f.shape[1:], f.dtype)
        return jnp.concatenate([zpad, f, zpad], axis=0)

    def local_steps(state: WeatherState) -> WeatherState:
        def body(c, _):
            pu, pv, ph = (refresh(p) for p in c)
            return swe_rk4_step_pallas_carry(
                pu, pv, ph, ly=ly, nx=nx, by=by, dt=float(dt),
                gravity=float(params.gravity),
                coriolis_f=float(params.coriolis_f), dx=float(grid.dx),
                dy=float(grid.dy), interpret=interpret,
            ), None

        carry = (to_carry(state.u), to_carry(state.v), to_carry(state.h))
        (pu, pv, ph), _ = lax.scan(body, carry, None, length=n_steps)
        return WeatherState(u=pu[by:by + ly], v=pv[by:by + ly],
                            h=ph[by:by + ly])

    spec = WeatherState(u=P("y", None), v=P("y", None), h=P("y", None))
    step_fn = jax.shard_map(local_steps, mesh=mesh, in_specs=(spec,),
                            out_specs=spec, check_vma=False)
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def sharded_swe_step_pallas_2d(
    grid: GridSpec, params: PhysicsParams, mesh: Mesh, *, dt: float,
    n_steps: int = 1, interpret: bool = False, donate: bool = False,
):
    """Multi-chip SWE RK4 with the fused Pallas kernel over a 2-D
    ('y','x') mesh (BASELINE config-5 decomposition): per step, each
    shard ppermutes 128-lane x halo slabs, then 8-row y slabs of the
    x-padded block (corners ride along), and runs the whole 4-stage RK4
    in one kernel pass with x_halo=128 cropping."""
    import numbers

    from njw_tpu.ops.stencil import swe_rk4_step_pallas_local2d

    if grid.bc != "periodic":
        raise NotImplementedError("pallas sharded step requires periodic BC")
    if not isinstance(params.coriolis_f, numbers.Number):
        raise NotImplementedError("constant Coriolis f only")
    py, px = mesh.devices.shape
    if grid.ny % py or grid.nx % px:
        raise ValueError(
            f"grid {grid.ny}x{grid.nx} not divisible by mesh {py}x{px}")
    ly, lx = grid.ny // py, grid.nx // px
    if ly % 8 or lx % 128:
        raise ValueError("per-shard block must be a multiple of (8, 128)")

    def pad_x(f):
        """128-lane x slabs carrying only the FOUR lanes the 4-stage
        kernel consumes, at the interior-adjacent edge (zero filler the
        kernel's validity shrink never lets reach a kept output) —
        1/32 the ICI payload of full-slab exchange.

        PRECONDITION (ADVICE r4): ZERO filler is safe only because the
        SWE tendency has no log/divide — garbage lanes stay finite and
        are cropped. The PE paths need ONES filler (ps feeds log());
        any new kernel term with a denominator or log must switch this
        to ones like sharded_pe_step_pallas_fused_2d.pad_2d4."""
        left4 = _ring_shift(f[:, -4:], "x", +1)
        right4 = _ring_shift(f[:, :4], "x", -1)
        fx = jnp.zeros(f.shape[:-1] + (124,), f.dtype)
        return jnp.concatenate([fx, left4, f, right4, fx], axis=1)

    pad_y = _pad4_filler

    def one_step(s: WeatherState) -> WeatherState:
        up, vp, hp = (pad_y(pad_x(f)) for f in (s.u, s.v, s.h))
        u, v, h = swe_rk4_step_pallas_local2d(
            up, vp, hp, ly=ly, lx=lx, dt=float(dt),
            gravity=float(params.gravity),
            coriolis_f=float(params.coriolis_f), dx=float(grid.dx),
            dy=float(grid.dy), interpret=interpret,
        )
        return WeatherState(u=u, v=v, h=h)

    def local_steps(state: WeatherState) -> WeatherState:
        def body(s, _):
            return one_step(s), None

        state, _ = lax.scan(body, state, None, length=n_steps)
        return state

    spec = WeatherState(u=P("y", "x"), v=P("y", "x"), h=P("y", "x"))
    step_fn = jax.shard_map(local_steps, mesh=mesh, in_specs=(spec,),
                            out_specs=spec, check_vma=False)
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def sharded_pe_step_pallas_fused_2d(
    grid: GridSpec, params: PhysicsParams, mesh: Mesh, *, dt: float,
    n_steps: int = 1, interpret: bool = False, donate: bool = False,
    carry: bool = False,
):
    """Multi-chip PE with the WHOLE-RK4 fused kernel over a ('y','x')
    mesh (the BASELINE config-5 decomposition, r4): ONE exchange + ONE
    kernel pass per step vs the stage path's four of each.

    carry=False (default, MEASURED r5): the concat form — per step,
    ppermute 128-lane x slabs then 8-row y slabs and rebuild the
    (L, ly+16, lx+256) padded fields for pe_rk4_pallas_local2d.
    carry=True selects the persistent-2-D-carry variant
    (pe_rk4_pallas_carry2d): no per-step concat, but its c/t/b blocks
    are the full carry width W = lx+256 — the overlapping W-wide DMA
    streams cost MORE than the concat they remove (same-session
    1-device-proxy A/B at 1024x{256,512}x20: carry 6.05/7.84 ms/step
    vs concat 3.35/5.77, bit-identical outputs; BENCH_NOTES r5). The
    1-D carry wins because its blocks stay interior-width; the 2-D one
    pays +50% lanes on every block. Kept as a tested variant.

    Falls back to the 4-stage path (sharded_pe_step_pallas_2d) when the
    shard width's full-width strips exceed VMEM.
    """
    import numbers

    from njw_tpu.ops.pe_stencil import (
        LANE, pe_rk4_pallas_carry2d, pe_rk4_pallas_local2d,
        pe_rk4_pick_by_2d,
    )
    from njw_tpu.weather.primitive import PEState

    if grid.bc != "periodic":
        raise NotImplementedError("pallas sharded PE requires periodic BC")
    if not isinstance(params.coriolis_f, numbers.Number):
        raise NotImplementedError("constant Coriolis f only")
    py, px = mesh.devices.shape
    if grid.ny % py or grid.nx % px:
        raise ValueError(
            f"grid {grid.ny}x{grid.nx} not divisible by mesh {py}x{px}")
    ly, lx = grid.ny // py, grid.nx // px
    if ly % 8 or lx % 128:
        raise ValueError("per-shard block must be a multiple of (8, 128)")
    L = grid.levels
    by2d = pe_rk4_pick_by_2d(L, ly, lx)
    if by2d is None or ly % by2d:  # same pick the kernel uses
        return sharded_pe_step_pallas_2d(
            grid, params, mesh, dt=dt, n_steps=n_steps,
            interpret=interpret, donate=donate)
    dt = float(dt)
    f = float(params.coriolis_f)

    if carry:
        # the carry kernel's W-wide I/O blocks need a tighter by than
        # local2d's (calibrated r5: by=32 rejected, 16 compiles at
        # L=20, lx=512) — if no strip fits the carry model, fall back
        # to the concat form below, which still fits where by2d did
        by = pe_rk4_pick_by_2d(L, ly, lx, carry2d=True)
        carry = by is not None and ly % by == 0

    if carry:

        def refresh(a):
            """x bands (interior rows) then full-width y slabs — the y
            slabs carry the x-refreshed corner lanes."""
            nd = a.ndim
            at = (0,) * (nd - 2)
            core = a[..., by:by + ly, LANE:LANE + lx]
            left4 = _ring_shift(core[..., :, -4:], "x", +1)
            right4 = _ring_shift(core[..., :, :4], "x", -1)
            a = lax.dynamic_update_slice(a, left4, at + (by, LANE - 4))
            a = lax.dynamic_update_slice(a, right4, at + (by, LANE + lx))
            top4 = _ring_shift(a[..., by + ly - 4:by + ly, :], "y", +1)
            bot4 = _ring_shift(a[..., by:by + 4, :], "y", -1)
            a = lax.dynamic_update_slice(a, top4, at + (by - 4, 0))
            return lax.dynamic_update_slice(a, bot4, at + (by + ly, 0))

        def to_carry(a):
            """ONES filler everywhere (the ps halo cols feed log)."""
            nd = a.ndim
            one = lambda sh: jnp.ones(sh, a.dtype)
            a = jnp.concatenate(
                [one(a.shape[:-1] + (LANE,)), a,
                 one(a.shape[:-1] + (LANE,))], axis=-1)
            row = a.shape[:-2] + (by,) + a.shape[-1:]
            return jnp.concatenate([one(row), a, one(row)], axis=-2)

        def local_steps(state: PEState) -> PEState:
            def body(c, _):
                pu, pv, pT, pq, pps = (refresh(p) for p in c)
                return pe_rk4_pallas_carry2d(
                    pu, pv, pT, pq, pps, ly=ly, lx=lx, L=L, by=by,
                    dt=dt, coriolis_f=f, dx=float(grid.dx),
                    dy=float(grid.dy), interpret=interpret), None

            carry0 = tuple(to_carry(a) for a in
                           (state.u, state.v, state.T, state.q, state.ps))
            (pu, pv, pT, pq, pps), _ = lax.scan(body, carry0, None,
                                                length=n_steps)
            sl = lambda a: a[..., by:by + ly, LANE:LANE + lx]
            return PEState(u=sl(pu), v=sl(pv), T=sl(pT), q=sl(pq),
                           ps=sl(pps))

        p3 = P(None, "y", "x")
        spec = PEState(u=p3, v=p3, T=p3, q=p3, ps=P("y", "x"))
        step_fn = jax.shard_map(local_steps, mesh=mesh, in_specs=(spec,),
                                out_specs=spec, check_vma=False)
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    def pad_2d4(a):
        """x: 128-lane slabs with the 4 true lanes at the
        interior-adjacent edge; y: 8-row slabs of the x-padded block with
        the 4 true rows adjacent to the interior. Filler is ones (the
        kernel's ps pads feed log(); never consumed by kept outputs)."""
        left4 = _ring_shift(a[..., :, -4:], "x", +1)
        right4 = _ring_shift(a[..., :, :4], "x", -1)
        fx = jnp.ones(a.shape[:-1] + (124,), a.dtype)
        ax = jnp.concatenate([fx, left4, a, right4, fx], axis=-1)
        top4 = _ring_shift(ax[..., -4:, :], "y", +1)
        bot4 = _ring_shift(ax[..., :4, :], "y", -1)
        fy = jnp.ones(ax.shape[:-2] + (4, ax.shape[-1]), ax.dtype)
        return jnp.concatenate([fy, top4, ax, bot4, fy], axis=-2)

    def one_step(s: PEState) -> PEState:
        return pe_rk4_pallas_local2d(
            pad_2d4(s.u), pad_2d4(s.v), pad_2d4(s.T), pad_2d4(s.q),
            pad_2d4(s.ps), ly=ly, lx=lx, L=L, dt=dt, coriolis_f=f,
            dx=float(grid.dx), dy=float(grid.dy), interpret=interpret)

    def local_steps(state: PEState) -> PEState:
        def body(s, _):
            return one_step(s), None

        state, _ = lax.scan(body, state, None, length=n_steps)
        return state

    p3 = P(None, "y", "x")
    spec = PEState(u=p3, v=p3, T=p3, q=p3, ps=P("y", "x"))
    step_fn = jax.shard_map(local_steps, mesh=mesh, in_specs=(spec,),
                            out_specs=spec, check_vma=False)
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def sharded_pe_step_pallas_2d(
    grid: GridSpec, params: PhysicsParams, mesh: Mesh, *, dt: float,
    n_steps: int = 1, interpret: bool = False, donate: bool = False,
):
    """Multi-chip PE with the fused stage kernel over a ('y','x') mesh
    (the BASELINE config-5 decomposition): per RK stage each shard
    ppermutes 128-lane x halo slabs, then one y halo row of the x-padded
    block (embedded in 8-row filler slabs), and runs the stage kernel on
    the (L, ly+16, lx+256) padded fields."""
    import numbers

    from njw_tpu.ops.pe_stencil import pe_stage_pallas_local2d
    from njw_tpu.weather.primitive import PEState

    if grid.bc != "periodic":
        raise NotImplementedError("pallas sharded PE requires periodic BC")
    if not isinstance(params.coriolis_f, numbers.Number):
        raise NotImplementedError("constant Coriolis f only")
    py, px = mesh.devices.shape
    if grid.ny % py or grid.nx % px:
        raise ValueError(
            f"grid {grid.ny}x{grid.nx} not divisible by mesh {py}x{px}")
    ly, lx = grid.ny // py, grid.nx // px
    if ly % 8 or lx % 128:
        raise ValueError("per-shard block must be a multiple of (8, 128)")
    L = grid.levels
    dt = float(dt)
    f = float(params.coriolis_f)

    def pad_2d(a):
        """x: 128-lane slabs carrying ONE true lane at the
        interior-adjacent edge (1/128 the ICI payload; ones filler — the
        whole slab enters the stage frame and ps feeds log(), but the
        1-lane validity shrink keeps filler out of kept outputs);
        y: ONE true row each way inside 8-row filler slabs (kernel reads
        only slab rows 7 / 0, so the y filler never enters the frame)."""
        left1 = _ring_shift(a[..., :, -1:], "x", +1)
        right1 = _ring_shift(a[..., :, :1], "x", -1)
        fx = jnp.ones(a.shape[:-1] + (127,), a.dtype)
        ax = jnp.concatenate([fx, left1, a, right1, fx], axis=-1)
        top_row = _ring_shift(ax[..., -1:, :], "y", +1)
        bot_row = _ring_shift(ax[..., :1, :], "y", -1)
        filler = jnp.zeros(ax.shape[:-2] + (7, ax.shape[-1]), ax.dtype)
        return jnp.concatenate(
            [filler, top_row, ax, bot_row, filler], axis=-2)

    def stage(cur: PEState, base: PEState, c_dt: float) -> PEState:
        return pe_stage_pallas_local2d(
            pad_2d(cur.u), pad_2d(cur.v), pad_2d(cur.T), pad_2d(cur.q),
            pad_2d(cur.ps), base, ly=ly, lx=lx, L=L, c_dt=c_dt,
            coriolis_f=f, dx=float(grid.dx), dy=float(grid.dy),
            interpret=interpret,
        )

    def one_step(s: PEState) -> PEState:
        s1 = stage(s, s, 0.5 * dt)
        s2 = stage(s1, s, 0.5 * dt)
        s3 = stage(s2, s, dt)
        acc = jax.tree.map(
            lambda a, b, c, d: (-a + b + 2.0 * c + d) * (1.0 / 3.0),
            s, s1, s2, s3)
        return stage(s3, acc, dt / 6.0)

    def local_steps(state: PEState) -> PEState:
        def body(s, _):
            return one_step(s), None

        state, _ = lax.scan(body, state, None, length=n_steps)
        return state

    p3 = P(None, "y", "x")
    spec = PEState(u=p3, v=p3, T=p3, q=p3, ps=P("y", "x"))
    step_fn = jax.shard_map(local_steps, mesh=mesh, in_specs=(spec,),
                            out_specs=spec, check_vma=False)
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
