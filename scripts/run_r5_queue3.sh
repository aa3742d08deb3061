#!/bin/bash
# r5 queue 3: carry2d lowering isolation + re-runs with fixed configs.
cd /root/repo
for v in control1d x128_full off64_store x128_store offset64; do
  echo "=== carry2d probe: $v ==="
  timeout 2400 python scripts/probe_carry2d_lowering.py --variant $v 2>&1 | grep -v WARNING
done
echo "=== si_swe (jet IC) ==="
timeout 2400 python scripts/measure_capability_cores.py --which si_swe 2>&1 | grep -v WARNING
echo "=== si_sph (o2 dt=480) ==="
timeout 2400 python scripts/measure_capability_cores.py --which si_sph 2>&1 | grep -v WARNING
echo "=== spherical fold A/B (median timing) ==="
timeout 3000 python scripts/measure_spherical.py --cases "512:f32:0,512:f32:1,256:f32:0,256:f32:1" 2>&1 | grep -v WARNING
echo "=== QUEUE3 DONE ==="
