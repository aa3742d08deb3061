"""Registration example (ref: medical image_registration_example role):
rigid + deformable B-spline recovery of a synthetic transform."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from njw_tpu.medical.registration import (
    register_deformable, register_images, warp_image,
)


def main():
    y, x = np.mgrid[0:96, 0:96].astype(np.float32)
    fixed = (np.sin(x / 7) * np.cos(y / 9)
             + np.exp(-((x - 48) ** 2 + (y - 40) ** 2) / 300))
    moving = np.asarray(warp_image(fixed, [4.0, -3.0, 0.08, 1.0, 1.0]))

    params, warped, hist = register_images(fixed, moving, method="rigid",
                                           n_iterations=300)
    print(f"recovered [ty tx theta]: {params[:3].round(2)} "
          f"(true ~ [-4, 3, -0.08] inverse)")
    print(f"rigid loss: {hist[0]:.4f} -> {hist[-1]:.4f}")

    ctrl, warped_d, hist_d = register_deformable(
        fixed, warped, grid_shape=(6, 6), n_iterations=150)
    print(f"deformable refinement loss: {hist_d[0]:.5f} -> {hist_d[-1]:.5f}")


if __name__ == "__main__":
    main()
