"""TPU probe: sharded PE whole-RK4 — per-step concat vs persistent carry.

1-device mesh at 1024x2048x20 (largest 1-D-path shape). 'old' rebuilds
the 8-row-padded state with a full concat per field per step (the r4
original); 'carry' is the persistent by-row-padded carry now used by
sharded_pe_step_pallas_fused. Scan-length differential, hard D2H sync.

Prints one JSON line per measurement.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# full-shard-width (1-D) fused path: largest shape whose full-width
# strips fit VMEM at L=20 (config-5 proper rides the 2-D decomposition)
NX = 1024
NY = 2048
L = 20
N = 10


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass

    from njw_tpu.parallel.halo import (
        _ring_shift, sharded_pe_step_pallas_fused, sharded_state,
    )
    from njw_tpu.ops.pe_stencil import pe_rk4_pallas_local
    from njw_tpu.weather.grid import GridSpec, PhysicsParams
    from njw_tpu.weather.primitive import PEState, pe_initial_state

    grid = GridSpec(nx=NX, ny=NY, levels=L, dx=1e5, dy=1e5)
    params = PhysicsParams(coriolis_f=1e-4)
    mesh = Mesh(np.array(jax.devices()[:1]), ("y",))
    ly = NY

    def old_style(n_steps):
        def pad8(a):
            top = _ring_shift(a[..., -4:, :], "y", +1)
            bot = _ring_shift(a[..., :4, :], "y", -1)
            filler = jnp.zeros(a.shape[:-2] + (4, a.shape[-1]), a.dtype)
            return jnp.concatenate([filler, top, a, bot, filler], axis=-2)

        def local_steps(s):
            def body(s, _):
                out = pe_rk4_pallas_local(
                    pad8(s.u), pad8(s.v), pad8(s.T), pad8(s.q), pad8(s.ps),
                    ly=ly, nx=NX, L=L, dt=20.0, coriolis_f=1e-4,
                    dx=1e5, dy=1e5)
                return out, None

            s, _ = lax.scan(body, s, None, length=n_steps)
            return s

        p3 = P(None, "y", None)
        spec = PEState(u=p3, v=p3, T=p3, q=p3, ps=P("y", None))
        return jax.jit(jax.shard_map(local_steps, mesh=mesh,
                                     in_specs=(spec,), out_specs=spec,
                                     check_vma=False))

    def diff(make_step, label):
        s0 = pe_initial_state(grid, u_jet=10.0, perturb=0.5)
        st = sharded_state(s0, mesh)
        r1, r2 = make_step(N), make_step(2 * N)

        def once(fn, st):
            t0 = time.perf_counter()
            st = fn(st)
            _ = np.asarray(st.ps[:4, :4])
            return time.perf_counter() - t0, st

        _, st = once(r1, st)
        _, st = once(r2, st)
        t1, st = once(r1, st)
        t2, st = once(r2, st)
        assert bool(np.isfinite(np.asarray(st.ps)).all())
        print(json.dumps({"probe": label,
                          "ms_per_step": round((t2 - t1) / N * 1e3, 3)}),
              flush=True)

    diff(lambda n: sharded_pe_step_pallas_fused(
        grid, params, mesh, dt=20.0, n_steps=n), "PE sharded CARRY (new)")
    diff(old_style, "PE sharded concat (old)")


if __name__ == "__main__":
    main()
