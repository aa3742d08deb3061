#!/bin/bash
# Sequential r5 TPU measurement queue (jobs serialize on the tunnel).
cd /root/repo
echo "=== reconcile_swe ===" 
timeout 3000 python scripts/reconcile_swe.py 2>&1 | grep -v WARNING
echo "=== spherical fold A/B ==="
timeout 3000 python scripts/measure_spherical.py --cases "512:f32:0,512:f32:1,256:f32:0,256:f32:1" 2>&1 | grep -v WARNING
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
echo "=== QUEUE DONE ==="
