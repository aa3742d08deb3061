"""Compute kernels: Pallas TPU kernels + spectral/XLA building blocks.

This package is the TPU-native replacement for the reference's per-workload
CUDA kernel directories (ref: src/*/cpp/src/kernels/*.cu). One Pallas
implementation per op with tunable block parameters replaces the reference's
per-SM kernel variant zoo (ref: shallow_water_kernels.cu:751-809 dispatching
among _SM87/_SM80/_SM75/_Generic variants).
"""
