"""TPU-native medical imaging.

Capability parity with the reference medical-imaging workload
(src/medical-imaging/, ~11k LoC; SURVEY §2.4): CT reconstruction (FBP +
iterative), MRI k-space reconstruction, image filtering (convolution /
median / bilateral / non-local means), segmentation (thresholding / region
growing / watershed / level set / MRF), and registration (warping + metric
optimization) — redesigned for XLA:

* FBP ramp filtering is a batched rfft over projections; backprojection is
  a vmap over angles of bilinear gathers (replaces the 4 per-SM kernel
  variants, ref: ct_reconstruction_kernels.cu:56-545).
* separable/gaussian convolutions use lax.conv (MXU); bilateral and NLM are
  vectorized patch ops (ref: image_processing_kernels.cu:51-660).
* iterative methods (SIRT, region growing, level set, ICM) are
  lax.fori_loop/scan with static iteration counts.
* registration metrics (MSE, mutual information) are differentiated with
  jax.grad through a differentiable warp — gradient-descent registration
  instead of the reference's hand-written search loops
  (ref: registration_kernels.cu:50-700).

Convenience API mirrors ref python/medical_imaging/__init__.py:21-138.
"""
from njw_tpu.medical.image import MedicalImage, load_image, save_image
from njw_tpu.medical.ct import radon, filtered_backprojection, sirt
from njw_tpu.medical.mri import (
    MRIReconstructor, grid_noncartesian, gridding_reconstruct,
    pipe_menon_dcf, reconstruct_cg, reconstruct_compressed_sensing,
    reconstruct_kspace, reconstruct_partial_fourier,
    reconstruct_primal_dual,
)
from njw_tpu.medical.filters import (
    convolve2d, gaussian_filter, median_filter, bilateral_filter,
    nlm_filter, apply_filter,
)
from njw_tpu.medical.segmentation import (
    threshold, otsu_threshold, region_growing, watershed, chan_vese,
    mrf_segment, apply_segmentation,
)
from njw_tpu.medical.registration import (
    warp_image, register_images, mutual_information, mse_metric,
)


def reconstruct_ct(projections, angles, method: str = "fbp", **kw):
    """ref: python/medical_imaging/__init__.py reconstruct_ct."""
    if method in ("fbp", "filtered_backprojection"):
        return filtered_backprojection(projections, angles, **kw)
    if method in ("sirt", "iterative"):
        return sirt(projections, angles, **kw)
    raise ValueError(f"unknown CT method {method!r}")
