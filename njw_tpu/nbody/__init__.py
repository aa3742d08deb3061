"""TPU-native N-body simulation.

Capability parity with the reference's dual Python/C++/CUDA n-body workload
(ref: src/nbody_sim/ — Particle/ParticleSystem O(N^2) direct summation,
4 integrators, 3 system factories, save/load, CLI; SURVEY §2.2), designed
MXU-first instead of translating the CUDA tile kernels:

* accelerations are expressed as two dense matmuls (pairwise dot products
  via Gram matrix + weighted mass sums), so the O(N^2) work lands on the
  128x128 systolic array rather than on a hand-tiled SIMT kernel
  (ref CUDA tiling: adaptive_kernels.cu:15-143).
* state is a device-resident pytree stepped inside lax.scan — no per-step
  host<->device copies (the reference copies positions D2H/H2D every hybrid
  step, ref: adaptive_kernels.cu:432-454).
* large N is row-blocked (lax.map over chunks) to bound the N x N
  working set.
"""
from njw_tpu.nbody.system import (
    NBodySystem, create_galaxy_model, create_random_system,
    create_solar_system, system_diagnostics,
)
from njw_tpu.nbody.forces import accelerations, potential_energy
from njw_tpu.nbody.pm import (pm_accelerations, pm_potential_energy,
                              p3m_accelerations)
from njw_tpu.nbody.simulation import NBodySimulation
