"""TPU-native molecular dynamics.

Capability parity with the reference MD workload (src/molecular-dynamics/;
SURVEY §2.3): LJ + Coulomb nonbonded forces, harmonic bonds/angles,
periodic dihedrals, Velocity-Verlet/Leapfrog/Beeman integrators,
Berendsen/Andersen/Nose-Hoover thermostats, water-box and LJ-fluid
factories, PDB loading, trajectory output.

TPU design: nonbonded forces are masked all-pairs under periodic
minimum-image convention — batched dense arithmetic on the VPU/MXU instead
of the reference's tiled CUDA kernels + neighbor list rebuild
(ref: cuda_kernels.cu:55-170, molecular_system.hpp:247 NeighborList). At
the reference's system sizes (10^3-10^4 atoms) dense all-pairs on TPU is
faster than the bookkeeping it replaces; the row-blocked path bounds memory
exactly like the n-body workload.
"""
from njw_tpu.md.system import (
    MDState, Topology, LJParams, create_lj_fluid, create_water_box,
    load_from_pdb, temperature, kinetic_energy,
)
from njw_tpu.md.forces import forces_and_energy, make_force_fn
from njw_tpu.md.ewald import make_ewald_coulomb
from njw_tpu.md.simulation import MDSimulation
