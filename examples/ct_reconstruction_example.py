#!/usr/bin/env python
"""CT reconstruction study (ref parity: src/medical-imaging/python/examples/
gpu_benchmark.py:1-458 flow): phantom -> (noisy) sinogram -> FBP / SIRT
comparison across angle counts and noise levels, plus an optional
cone-beam FDK pass on a 3-D phantom.

The TPU design point: radon/backprojection are vmapped bilinear ray
sampling (one fused XLA program over all angles), SIRT is a jitted
fori_loop, FDK a vmapped 3-D backprojection — no per-angle host loop
(the reference launches one CUDA kernel per op per SM variant,
ct_reconstruction_kernels.cu:56-852).

    python examples/ct_reconstruction_example.py --size 256 \
        --angles 90 180 --noise 0.0 0.02 --sirt-iterations 30 --json
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def shepp_logan_like(n: int) -> np.ndarray:
    """Simplified Shepp-Logan-style phantom: nested ellipses with
    different attenuation (enough structure to expose streak artifacts)."""
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float32)
    c = (n - 1) / 2
    y = (yy - c) / c
    x = (xx - c) / c
    img = np.zeros((n, n), np.float32)
    # (cy, cx, ry, rx, angle_deg, value)
    ellipses = [
        (0.0, 0.0, 0.92, 0.69, 0.0, 1.0),
        (0.0, 0.0, 0.874, 0.6624, 0.0, -0.8),
        (0.0, 0.22, 0.31, 0.11, -18.0, -0.2),
        (0.0, -0.22, 0.41, 0.16, 18.0, -0.2),
        (-0.35, 0.0, 0.25, 0.21, 0.0, 0.3),
        (-0.1, 0.0, 0.046, 0.046, 0.0, 0.15),
        (0.605, -0.08, 0.046, 0.023, 0.0, 0.15),
        (0.605, 0.06, 0.023, 0.046, 0.0, 0.15),
    ]
    for cy, cx, ry, rx, ang, val in ellipses:
        th = np.deg2rad(ang)
        yr = (y - cy) * np.cos(th) + (x - cx) * np.sin(th)
        xr = -(y - cy) * np.sin(th) + (x - cx) * np.cos(th)
        img += val * ((yr / ry) ** 2 + (xr / rx) ** 2 <= 1.0)
    return np.clip(img, 0.0, None)


def psnr(rec: np.ndarray, ref: np.ndarray) -> float:
    mse = float(np.mean((rec - ref) ** 2))
    peak = float(ref.max()) or 1.0
    return 10.0 * np.log10(peak * peak / max(mse, 1e-20))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--angles", type=int, nargs="+", default=[180],
                   help="projection counts to sweep")
    p.add_argument("--noise", type=float, nargs="+", default=[0.0],
                   help="gaussian sinogram noise sigmas (fraction of max)")
    p.add_argument("--sirt-iterations", type=int, default=30)
    p.add_argument("--filter", default="ramlak",
                   choices=["ramlak", "shepp_logan", "hann"],
                   help="FBP ramp apodization")
    p.add_argument("--cone-beam", action="store_true",
                   help="also run a 3-D cone-beam FDK study")
    p.add_argument("--output-dir", default="./output")
    p.add_argument("--json", action="store_true",
                   help="emit one JSON line with all metrics")
    args = p.parse_args()

    import jax

    from njw_tpu.medical import filtered_backprojection, radon, sirt
    from njw_tpu.viz import compare_images, show_sinogram

    os.makedirs(args.output_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    img = shepp_logan_like(args.size)
    rows = []

    for n_ang in args.angles:
        angles = np.linspace(0, np.pi, n_ang, endpoint=False)
        t0 = time.perf_counter()
        sino = np.asarray(jax.block_until_ready(radon(img, angles)))
        t_fwd = time.perf_counter() - t0
        for sigma in args.noise:
            noisy = sino + sigma * sino.max() * rng.standard_normal(
                sino.shape).astype(np.float32)
            t0 = time.perf_counter()
            fbp = np.asarray(jax.block_until_ready(
                filtered_backprojection(noisy, angles,
                                        filter_kind=args.filter)))
            t_fbp = time.perf_counter() - t0
            t0 = time.perf_counter()
            it = np.asarray(jax.block_until_ready(
                sirt(noisy, angles, n_iterations=args.sirt_iterations)))
            t_sirt = time.perf_counter() - t0
            row = {
                "angles": n_ang, "noise": sigma,
                "radon_ms": round(t_fwd * 1e3, 2),
                "fbp_ms": round(t_fbp * 1e3, 2),
                "sirt_ms": round(t_sirt * 1e3, 2),
                "fbp_psnr_db": round(psnr(fbp, img), 2),
                "sirt_psnr_db": round(psnr(it, img), 2),
            }
            rows.append(row)
            if not args.json:
                print(f"angles={n_ang:4d} noise={sigma:.3f}  "
                      f"FBP {row['fbp_psnr_db']:6.2f} dB "
                      f"({row['fbp_ms']:.1f} ms)   "
                      f"SIRT({args.sirt_iterations}) "
                      f"{row['sirt_psnr_db']:6.2f} dB "
                      f"({row['sirt_ms']:.1f} ms)")
            if n_ang == args.angles[-1] and sigma == args.noise[-1]:
                show_sinogram(noisy, path=os.path.join(
                    args.output_dir, "sinogram.png"))
                compare_images(
                    {"phantom": img, "FBP": fbp,
                     f"SIRT({args.sirt_iterations})": it},
                    path=os.path.join(args.output_dir,
                                      "reconstruction.png"))

    cone = None
    if args.cone_beam:
        from njw_tpu.medical.ct import cone_beam_project, fdk_reconstruct

        nz = max(32, args.size // 4)
        zz, yy, xx = np.mgrid[0:nz, 0:nz, 0:nz].astype(np.float32)
        c = (nz - 1) / 2
        vol = (((zz - c) ** 2 + (yy - c) ** 2 + (xx - c) ** 2)
               < (0.4 * nz) ** 2).astype(np.float32)
        vol += (((zz - c) ** 2 + (yy - c - nz * 0.15) ** 2
                 + (xx - c) ** 2) < (0.1 * nz) ** 2)
        betas = np.linspace(0, 2 * np.pi, 90, endpoint=False)
        sod, sdd = 2.0 * nz, 4.0 * nz
        t0 = time.perf_counter()
        proj = jax.block_until_ready(cone_beam_project(
            vol, betas, sod=sod, sdd=sdd, det_shape=(nz, nz)))
        t_proj = time.perf_counter() - t0
        t0 = time.perf_counter()
        rec = np.asarray(jax.block_until_ready(fdk_reconstruct(
            proj, betas, sod=sod, sdd=sdd, output_size=nz)))
        t_fdk = time.perf_counter() - t0
        cone = {"nz": nz, "project_ms": round(t_proj * 1e3, 1),
                "fdk_ms": round(t_fdk * 1e3, 1),
                "fdk_psnr_db": round(psnr(rec, vol), 2)}
        if not args.json:
            print(f"cone-beam {nz}^3, 90 views: project "
                  f"{cone['project_ms']} ms, FDK {cone['fdk_ms']} ms, "
                  f"PSNR {cone['fdk_psnr_db']} dB")

    if args.json:
        print(json.dumps({"rows": rows, "cone_beam": cone}))
    else:
        print(f"figures: {args.output_dir}/sinogram.png, "
              f"{args.output_dir}/reconstruction.png")


if __name__ == "__main__":
    main()
