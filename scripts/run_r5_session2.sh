#!/bin/bash
# r5 session-2 sequential TPU queue (jobs serialize on the tunnel).
# Priority: carry2d lowering probes (unlocks the ROADMAP 2-D carry item),
# headline reconciliation, capability-core rows, icosa, spherical fold.
cd /root/repo
echo "=== sanity ==="
timeout 300 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((256, 256))
print('devices', jax.devices())
print('sum', float(jnp.sum(x)))
" 2>&1 | grep -v WARNING
echo "=== carry2d probe: offset64 ==="
timeout 2400 python scripts/probe_carry2d_lowering.py --variant offset64 2>&1 | grep -v WARNING
echo "=== carry2d probe: xpad128 ==="
timeout 2400 python scripts/probe_carry2d_lowering.py --variant xpad128 2>&1 | grep -v WARNING
echo "=== carry2d probe: off64_out128 ==="
timeout 2400 python scripts/probe_carry2d_lowering.py --variant off64_out128 2>&1 | grep -v WARNING
echo "=== reconcile_swe ==="
timeout 3000 python scripts/reconcile_swe.py 2>&1 | grep -v WARNING
echo "=== staggered ==="
timeout 2400 python scripts/measure_capability_cores.py --which staggered 2>&1 | grep -v WARNING
echo "=== nested ==="
timeout 2400 python scripts/measure_capability_cores.py --which nested 2>&1 | grep -v WARNING
echo "=== si_swe ==="
timeout 2400 python scripts/measure_capability_cores.py --which si_swe 2>&1 | grep -v WARNING
echo "=== si_sph ==="
timeout 2400 python scripts/measure_capability_cores.py --which si_sph 2>&1 | grep -v WARNING
echo "=== si_pe ==="
timeout 3000 python scripts/measure_capability_cores.py --which si_pe 2>&1 | grep -v WARNING
echo "=== icosa ==="
timeout 3000 python scripts/measure_icosa.py 2>&1 | grep -v WARNING
echo "=== spherical fold A/B ==="
timeout 3000 python scripts/measure_spherical.py --cases "512:f32:0,512:f32:1,256:f32:0,256:f32:1" 2>&1 | grep -v WARNING
echo "=== QUEUE DONE ==="
