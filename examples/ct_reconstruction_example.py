#!/usr/bin/env python
"""CT reconstruction demo (ref parity: medical-imaging examples incl.
gpu_benchmark.py flow): phantom -> sinogram -> FBP + SIRT comparison."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--angles", type=int, default=180)
    p.add_argument("--output-dir", default="./output")
    args = p.parse_args()

    from njw_tpu.medical import filtered_backprojection, radon, sirt
    from njw_tpu.viz import compare_images, show_sinogram

    os.makedirs(args.output_dir, exist_ok=True)
    n = args.size
    yy, xx = np.mgrid[0:n, 0:n]
    c = (n - 1) / 2
    img = ((yy - c) ** 2 + (xx - c) ** 2 < (0.4 * n) ** 2).astype(np.float32)
    img += ((yy - c - n * 0.1) ** 2 + (xx - c) ** 2
            < (0.1 * n) ** 2).astype(np.float32)

    angles = np.linspace(0, np.pi, args.angles, endpoint=False)
    sino = radon(img, angles)
    fbp = filtered_backprojection(sino, angles)
    it = sirt(sino, angles, n_iterations=30)

    show_sinogram(np.asarray(sino),
                  path=os.path.join(args.output_dir, "sinogram.png"))
    compare_images({"phantom": img, "FBP": np.asarray(fbp),
                    "SIRT(30)": np.asarray(it)},
                   path=os.path.join(args.output_dir, "reconstruction.png"))
    for name, rec in (("fbp", np.asarray(fbp)), ("sirt", np.asarray(it))):
        cc = np.corrcoef(rec.ravel(), img.ravel())[0, 1]
        print(f"{name}: correlation with phantom = {cc:.4f}")


if __name__ == "__main__":
    main()
