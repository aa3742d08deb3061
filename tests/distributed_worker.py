"""Worker for the multi-process jax.distributed test (SURVEY §7 hard
part 6: multi-process CPU jax.distributed as the trustworthy multi-host
proxy). Launched by test_distributed.py as N processes; each hosts 4
virtual CPU devices, they form one 8-device global mesh, run the sharded
SWE step, and every process checks its addressable shards against a
locally computed whole-domain reference.

Usage: python distributed_worker.py <coordinator> <num_procs> <proc_id>
Exits 0 on success; prints DISTRIBUTED_OK.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coordinator, num_procs, proc_id = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_procs,
                               process_id=proc_id)
    assert jax.process_count() == num_procs
    n_dev = len(jax.devices())
    assert n_dev == 4 * num_procs, f"expected {4*num_procs}, got {n_dev}"

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from njw_tpu.parallel.halo import sharded_swe_step
    from njw_tpu.weather.grid import GridSpec, PhysicsParams, WeatherState
    from njw_tpu.weather.ics import make_initial_state
    from njw_tpu.weather.integrators import make_stepper
    from njw_tpu.weather.dynamics import make_tendency_fn

    grid = GridSpec(nx=32, ny=64)
    params = PhysicsParams(coriolis_f=1e-4)
    mesh = Mesh(np.array(jax.devices()).reshape(4 * num_procs // 2, 2),
                ("y", "x"))

    s0 = make_initial_state("vortex", grid, strength=2.0)
    s0_np = {k: np.asarray(getattr(s0, k)) for k in ("u", "v", "h")}

    def put(a):
        sh = NamedSharding(mesh, P("y", "x"))
        return jax.make_array_from_callback(a.shape, sh,
                                            lambda idx: a[idx])

    state = WeatherState(u=put(s0_np["u"]), v=put(s0_np["v"]),
                         h=put(s0_np["h"]))
    step = sharded_swe_step(grid, params, mesh, dt=0.01, method="rk4",
                            n_steps=10)
    out = step(state)
    jax.block_until_ready(out)

    # whole-domain reference computed independently on this process
    stepper = make_stepper("rk4", make_tendency_fn("shallow_water", grid,
                                                   params))
    ref = WeatherState(u=s0.u, v=s0.v, h=s0.h)
    carry = stepper.init(ref)
    import jax.numpy as jnp

    for _ in range(10):
        carry, ref = stepper.step(carry, ref, jnp.float32(0.01))
    ref_h = np.asarray(ref.h)
    ref_u = np.asarray(ref.u)

    # every process validates ITS OWN addressable shards
    for shard in out.h.addressable_shards:
        np.testing.assert_allclose(np.asarray(shard.data),
                                   ref_h[shard.index], rtol=1e-5,
                                   atol=1e-5)
    for shard in out.u.addressable_shards:
        np.testing.assert_allclose(np.asarray(shard.data),
                                   ref_u[shard.index], rtol=1e-5,
                                   atol=1e-5)
    print(f"DISTRIBUTED_OK proc={proc_id}", flush=True)


if __name__ == "__main__":
    main()
