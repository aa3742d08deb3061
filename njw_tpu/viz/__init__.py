"""Visualization (matplotlib, headless-safe).

Capability parity with the reference per-workload viz modules
(weather-sim/python/visualization/visualization.py:31-405; nbody/MD/medical
visualization.py files; SURVEY §2 per-workload rows). All functions return
the matplotlib Figure and optionally save to a path; the Agg backend is
forced so everything works headless.
"""
from njw_tpu.viz.weather import (
    visualize_field, visualize_velocity, visualize_vorticity,
    visualize_height, animate_simulation, plot_performance,
)
from njw_tpu.viz.particles import (
    plot_particles_3d, plot_energy_history, plot_trajectory,
    plot_temperature,
)
from njw_tpu.viz.imaging import (
    show_image, show_sinogram, compare_images, create_medical_colormap,
    plot_overlay, plot_slice, plot_orthogonal_slices,
    create_volume_animation, plot_histogram, plot_surface_3d,
    plot_difference, plot_image, plot_images, plot_comparison,
    plot_ct_projection,
)
