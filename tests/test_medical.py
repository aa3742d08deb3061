"""Medical imaging tests: CT round-trip, MRI recon, filters, segmentation,
registration (mirrors ref test surface + gpu_benchmark.py example flows)."""
import numpy as np
import pytest

import jax.numpy as jnp

from njw_tpu.medical import (
    MedicalImage, apply_filter, apply_segmentation, bilateral_filter,
    chan_vese, convolve2d, filtered_backprojection, gaussian_filter,
    grid_noncartesian, load_image, median_filter, mrf_segment,
    mse_metric, mutual_information, nlm_filter, otsu_threshold, radon,
    reconstruct_ct, reconstruct_kspace, region_growing, register_images,
    save_image, sirt, threshold, warp_image, watershed,
)


def phantom(n=64):
    """Simple disk phantom with an off-center bright insert."""
    yy, xx = np.mgrid[0:n, 0:n]
    c = (n - 1) / 2
    img = ((yy - c) ** 2 + (xx - c) ** 2 < (0.4 * n) ** 2).astype(np.float32)
    img += ((yy - c - n * 0.12) ** 2 + (xx - c + n * 0.1) ** 2
            < (0.08 * n) ** 2).astype(np.float32)
    return img


class TestCT:
    def test_radon_of_disk_is_symmetric(self):
        img = phantom()
        angles = np.linspace(0, np.pi, 8, endpoint=False)
        sino = np.asarray(radon(img, angles))
        assert sino.shape == (8, 64)
        # a centered disk projects identically at all angles
        base = ((np.mgrid[0:64, 0:64][0] - 31.5) ** 2
                + (np.mgrid[0:64, 0:64][1] - 31.5) ** 2
                < (0.4 * 64) ** 2).astype(np.float32)
        sino_d = np.asarray(radon(base, angles))
        # edge bins alias slightly; relative variation stays small
        assert np.std(sino_d, axis=0).max() / sino_d.max() < 0.05

    def test_fbp_reconstructs_phantom(self):
        img = phantom()
        angles = np.linspace(0, np.pi, 90, endpoint=False)
        sino = radon(img, angles)
        rec = np.asarray(filtered_backprojection(sino, angles))
        assert rec.shape == img.shape
        # correlation with ground truth
        cc = np.corrcoef(rec.ravel(), img.ravel())[0, 1]
        assert cc > 0.9

    @pytest.mark.parametrize("kind", ["ramlak", "shepp_logan", "cosine",
                                      "hann"])
    def test_fbp_filter_kinds(self, kind):
        img = phantom(32)
        angles = np.linspace(0, np.pi, 30, endpoint=False)
        rec = np.asarray(filtered_backprojection(radon(img, angles), angles,
                                                 filter_kind=kind))
        assert np.all(np.isfinite(rec))

    def test_sirt_improves_with_iterations(self):
        img = phantom(32)
        angles = np.linspace(0, np.pi, 45, endpoint=False)
        sino = radon(img, angles)
        r5 = np.asarray(sirt(sino, angles, n_iterations=5))
        r40 = np.asarray(sirt(sino, angles, n_iterations=40))
        e5 = ((r5 - img) ** 2).mean()
        e40 = ((r40 - img) ** 2).mean()
        assert e40 < e5

    def test_reconstruct_ct_facade(self):
        img = phantom(32)
        angles = np.linspace(0, np.pi, 30, endpoint=False)
        sino = radon(img, angles)
        assert np.asarray(reconstruct_ct(sino, angles, "fbp")).shape == (32, 32)
        assert np.asarray(
            reconstruct_ct(sino, angles, "sirt", n_iterations=3)).shape == (32, 32)
        with pytest.raises(ValueError):
            reconstruct_ct(sino, angles, "magic")


class TestMRI:
    def test_kspace_roundtrip(self):
        img = phantom(64)
        k = np.fft.fftshift(np.fft.fft2(img))
        rec = np.asarray(reconstruct_kspace(k))
        np.testing.assert_allclose(rec, img, atol=1e-3)

    def test_noncartesian_gridding(self):
        img = phantom(32).astype(np.complex64)
        k = np.fft.fftshift(np.fft.fft2(img))
        # sample all Cartesian points as "non-Cartesian" coords
        yy, xx = np.mgrid[0:32, 0:32]
        coords = np.stack([(yy.ravel() / 31 - 0.5),
                           (xx.ravel() / 31 - 0.5)], axis=1)
        rec = np.asarray(grid_noncartesian(k.ravel(), coords, 32))
        cc = np.corrcoef(rec.ravel(), phantom(32).ravel())[0, 1]
        assert cc > 0.8


class TestMRIAdvanced:
    """CG-SENSE / primal-dual / CS / partial-Fourier / KB gridding —
    the MRIReconstructor surface (ref: medical_imaging.hpp:696-787)."""

    @staticmethod
    def _kspace(n=64):
        img = phantom(n)
        k = np.fft.fftshift(np.fft.fft2(img, norm="ortho"))
        return img, k.astype(np.complex64)

    @staticmethod
    def _mask(n=64, r=2, center=6):
        m = np.zeros((n, n), np.float32)
        m[::r, :] = 1.0
        m[n // 2 - center:n // 2 + center, :] = 1.0
        return m

    def test_cg_fully_sampled_matches_fft(self):
        """With full sampling, CG converges to the plain inverse FFT."""
        from njw_tpu.medical import reconstruct_cg

        img, k = self._kspace()
        rec = np.asarray(reconstruct_cg(k, np.ones((64, 64), np.float32),
                                        num_iterations=5))
        np.testing.assert_allclose(rec, img, atol=1e-3)

    def test_cg_sense_beats_zero_filled(self):
        """2x undersampled, 4 coils with distinct sensitivities: CG-SENSE
        must beat the zero-filled recon by a clear margin."""
        from njw_tpu.medical import reconstruct_cg

        img, _ = self._kspace()
        n = 64
        yy, xx = np.mgrid[0:n, 0:n] / (n - 1)
        sens = np.stack([
            np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 0.35)
            for cy, cx in [(0, 0), (0, 1), (1, 0), (1, 1)]
        ]).astype(np.complex64)
        sens /= np.sqrt((np.abs(sens) ** 2).sum(0, keepdims=True))
        mask = self._mask(r=2)
        k = mask[None] * np.fft.fftshift(
            np.fft.fft2(sens * img[None], norm="ortho"), axes=(-2, -1))
        rec = np.asarray(reconstruct_cg(k, mask, sens, num_iterations=15))
        zf = np.abs((np.conj(sens) * np.fft.ifft2(
            np.fft.ifftshift(k, axes=(-2, -1)), norm="ortho")).sum(0))
        err_cg = np.abs(rec - img).mean()
        err_zf = np.abs(zf - img).mean()
        assert err_cg < 0.5 * err_zf

    def test_primal_dual_denoises_undersampled(self):
        from njw_tpu.medical import reconstruct_primal_dual

        img, k = self._kspace()
        mask = self._mask(r=3)
        ku = mask * k
        rec = np.asarray(reconstruct_primal_dual(ku, mask,
                                                 num_iterations=80,
                                                 tv_weight=0.02))
        zf = np.abs(np.fft.ifft2(np.fft.ifftshift(ku), norm="ortho"))
        assert np.abs(rec - img).mean() < 0.7 * np.abs(zf - img).mean()

    def test_compressed_sensing_improves_on_zero_fill(self):
        from njw_tpu.medical import reconstruct_compressed_sensing

        img, k = self._kspace()
        rng = np.random.default_rng(3)
        mask = (rng.random((64, 64)) < 0.35).astype(np.float32)
        mask[28:36, :] = 1.0
        ku = mask * k
        rec = np.asarray(reconstruct_compressed_sensing(
            ku, mask, num_iterations=40, lam=0.01))
        zf = np.abs(np.fft.ifft2(np.fft.ifftshift(ku), norm="ortho"))
        assert np.abs(rec - img).mean() < 0.8 * np.abs(zf - img).mean()

    def test_partial_fourier_homodyne(self):
        """5/8 partial Fourier of a (real, smooth-phase) phantom: homodyne
        must beat zero-filled recon of the same data."""
        from njw_tpu.medical import reconstruct_partial_fourier

        n = 64
        img = phantom(n)
        yy, xx = np.mgrid[0:n, 0:n] / (n - 1)
        phase = np.exp(1j * (0.6 * yy + 0.4 * xx))  # slowly varying
        k = np.fft.fftshift(np.fft.fft2(img * phase, norm="ortho"))
        frac = 5 / 8
        kpf = k.copy()
        kpf[int(frac * n):, :] = 0.0
        rec = np.asarray(reconstruct_partial_fourier(kpf, frac))
        zf = np.abs(np.fft.ifft2(np.fft.ifftshift(kpf), norm="ortho"))
        assert np.abs(rec - img).mean() < 0.7 * np.abs(zf - img).mean()

    def test_kb_gridding_radial_beats_bilinear(self):
        """Radial trajectory: KB gridding + Pipe-Menon DCF + deapodization
        must out-reconstruct the nearest/bilinear-bin path."""
        from njw_tpu.medical import grid_noncartesian, gridding_reconstruct

        n = 32
        img = phantom(n)
        n_spokes, n_read = 96, 64
        ang = np.pi * np.arange(n_spokes) / n_spokes
        rad = (np.arange(n_read) - n_read / 2) / n_read  # [-0.5, 0.5)
        ky = (rad[None, :] * np.sin(ang[:, None])).ravel()
        kx = (rad[None, :] * np.cos(ang[:, None])).ravel()
        coords = np.stack([ky, kx], 1).astype(np.float32)
        # sample the DFT at the radial points (exact, small n)
        y_idx, x_idx = np.mgrid[0:n, 0:n]
        phase = np.exp(-2j * np.pi * (
            coords[:, 0:1] * (y_idx.ravel() - n // 2)[None]
            + coords[:, 1:2] * (x_idx.ravel() - n // 2)[None]))
        samples = (phase @ img.ravel().astype(np.complex64)) / n
        rec_kb = np.asarray(gridding_reconstruct(samples, coords, n))
        # grid_noncartesian uses corner-phase convention: convert
        corner = samples * np.exp(-2j * np.pi * (n // 2)
                                  * (coords[:, 0] + coords[:, 1]))
        rec_bl = np.asarray(grid_noncartesian(corner, coords, n))
        cc = lambda a: np.corrcoef(a.ravel(), img.ravel())[0, 1]
        assert cc(rec_kb) > cc(rec_bl)
        assert cc(rec_kb) > 0.93

    def test_reconstructor_facade(self):
        from njw_tpu.medical import MRIReconstructor

        img, k = self._kspace()
        r = MRIReconstructor(method="fft")
        k_back = np.fft.fftshift(np.fft.fft2(img))  # backward-norm conv.
        np.testing.assert_allclose(np.asarray(r.process(k_back)), img,
                                   atol=1e-3)
        r = MRIReconstructor(method="cg_sense", num_iterations=5,
                             acceleration_factor=2)
        mask = r.undersampling_mask(64, 64)
        rec = r.process(np.asarray(mask) * k, mask)
        assert np.isfinite(np.asarray(rec)).all()
        with pytest.raises(NotImplementedError):
            MRIReconstructor(method="deep_learning").process(k)
        with pytest.raises(ValueError):
            MRIReconstructor(method="bogus").process(k)


class TestFilters:
    def test_gaussian_smooths(self):
        rng = np.random.default_rng(0)
        noisy = phantom() + 0.3 * rng.standard_normal((64, 64)).astype(np.float32)
        sm = np.asarray(gaussian_filter(noisy, 1.5))
        assert sm.std() < noisy.std()

    def test_median_removes_salt_pepper(self):
        img = phantom()
        noisy = img.copy()
        noisy[::7, ::7] = 5.0
        den = np.asarray(median_filter(noisy, 3))
        assert ((den - img) ** 2).mean() < ((noisy - img) ** 2).mean() * 0.2

    def test_bilateral_preserves_edges(self):
        img = phantom()
        rng = np.random.default_rng(1)
        noisy = img + 0.05 * rng.standard_normal((64, 64)).astype(np.float32)
        bf = np.asarray(bilateral_filter(noisy, 5, 2.0, 0.2))
        gf = np.asarray(gaussian_filter(noisy, 2.0))
        # edge-preserving: bilateral reconstructs the clean piecewise image
        # far better than an equally strong gaussian (which blurs edges)
        assert ((bf - img) ** 2).mean() < 0.2 * ((gf - img) ** 2).mean()
        assert ((bf - img) ** 2).mean() < ((noisy - img) ** 2).mean()

    def test_nlm_denoises(self):
        img = phantom(48)
        rng = np.random.default_rng(2)
        noisy = img + 0.2 * rng.standard_normal((48, 48)).astype(np.float32)
        den = np.asarray(nlm_filter(noisy, search_radius=3, h=0.3))
        assert ((den - img) ** 2).mean() < ((noisy - img) ** 2).mean() * 0.6

    def test_convolve2d_identity(self):
        img = phantom(16)
        k = np.zeros((3, 3), np.float32)
        k[1, 1] = 1.0
        np.testing.assert_allclose(np.asarray(convolve2d(img, k)), img,
                                   atol=1e-6)

    def test_apply_filter_facade(self):
        out = apply_filter(phantom(16), "gaussian", sigma=1.0)
        assert out.shape == (16, 16)
        with pytest.raises(ValueError):
            apply_filter(phantom(16), "wiener")


class TestSegmentation:
    def test_otsu_separates_bimodal(self):
        img = phantom()
        t = otsu_threshold(img + 0.01)
        assert 0.1 < t < 1.1

    def test_threshold_binary(self):
        seg = np.asarray(threshold(phantom(), 0.5))
        assert set(np.unique(seg)) <= {0.0, 1.0}

    def test_region_growing_fills_disk(self):
        img = phantom()
        seg = np.asarray(region_growing(img, (32, 32), tolerance=0.5,
                                        n_iterations=64))
        # grows to the main disk but not outside — compare with truth disk
        yy, xx = np.mgrid[0:64, 0:64]
        disk = ((yy - 31.5) ** 2 + (xx - 31.5) ** 2 < (0.4 * 64) ** 2)
        inside_frac = seg[disk].mean()
        outside_frac = seg[~disk].mean()
        assert inside_frac > 0.5 and outside_frac < 0.05

    def test_watershed_labels_two_basins(self):
        yy, xx = np.mgrid[0:32, 0:32]
        elev = np.minimum((xx - 8) ** 2 + (yy - 16) ** 2,
                          (xx - 24) ** 2 + (yy - 16) ** 2).astype(np.float32)
        markers = np.zeros((32, 32), np.int32)
        markers[16, 8] = 1
        markers[16, 24] = 2
        labels = np.asarray(watershed(elev, markers))
        assert labels[16, 4] == 1 and labels[16, 28] == 2
        assert set(np.unique(labels)) <= {0, 1, 2}

    def test_chan_vese_finds_object(self):
        img = phantom()
        seg = np.asarray(chan_vese(img, n_iterations=80))
        yy, xx = np.mgrid[0:64, 0:64]
        disk = ((yy - 31.5) ** 2 + (xx - 31.5) ** 2 < (0.35 * 64) ** 2)
        # segmentation agrees with the disk (either polarity)
        agree = max((seg[disk] > 0.5).mean(), (seg[disk] < 0.5).mean())
        assert agree > 0.9

    def test_mrf_denoises_labels(self):
        rng = np.random.default_rng(3)
        img = phantom() + 0.3 * rng.standard_normal((64, 64)).astype(np.float32)
        plain = np.asarray(threshold(img, 0.5))
        mrf = np.asarray(mrf_segment(img, 0.5, beta=0.3))
        truth = np.asarray(threshold(phantom(), 0.5))
        assert (mrf != truth).mean() < (plain != truth).mean()

    def test_apply_segmentation_facade(self):
        seg = apply_segmentation(phantom(), "otsu")
        assert seg.shape == (64, 64)


class TestRegistration:
    def test_warp_identity(self):
        img = phantom()
        out = np.asarray(warp_image(img, [0.0, 0.0, 0.0, 1.0, 1.0]))
        np.testing.assert_allclose(out, img, atol=1e-4)

    def test_warp_translation(self):
        img = phantom()
        out = np.asarray(warp_image(img, [3.0, 0.0, 0.0, 1.0, 1.0]))
        np.testing.assert_allclose(out[10:60, :], img[7:57, :], atol=1e-3)

    def test_registration_recovers_shift(self):
        fixed = phantom()
        moving = np.asarray(warp_image(fixed, [-4.0, 3.0, 0.0, 1.0, 1.0]))
        params, warped, hist = register_images(
            fixed, moving, metric="mse", n_iterations=300, learning_rate=20.0)
        assert hist[-1] < hist[0] * 0.3
        assert abs(params[0] - 4.0) < 1.0 and abs(params[1] + 3.0) < 1.0

    def test_multiresolution_adam_recovers_large_transform(self):
        """Coarse-to-fine + Adam recovers a shift+rotation that plain
        single-level GD at default lr cannot (textured image, 4 px /
        0.08 rad)."""
        y, x = np.mgrid[0:96, 0:96].astype(np.float32)
        fixed = (np.sin(x / 7) * np.cos(y / 9)
                 + np.exp(-((x - 48) ** 2 + (y - 40) ** 2) / 300))
        moving = np.asarray(warp_image(fixed, [4.0, -3.0, 0.08, 1.0, 1.0]))
        params, warped, hist = register_images(
            fixed, moving, metric="mse", n_iterations=300,
            pyramid_levels=3, optimizer="adam", learning_rate=0.5)
        assert abs(params[0] + 4.0) < 0.7
        assert abs(params[1] - 3.0) < 0.7
        assert abs(params[2] + 0.08) < 0.03
        assert hist[-1] < hist[0] * 0.2

    def test_mutual_information_peaks_when_aligned(self):
        img = phantom()
        shifted = np.asarray(warp_image(img, [5.0, 5.0, 0.0, 1.0, 1.0]))
        mi_aligned = float(mutual_information(img, img))
        mi_shifted = float(mutual_information(img, shifted))
        assert mi_aligned > mi_shifted


class TestImageIO:
    def test_npz_roundtrip(self, tmp_path):
        img = MedicalImage(jnp.asarray(phantom(16)), modality="CT")
        p = save_image(str(tmp_path / "a.npz"), img)
        back = load_image(p, modality="CT")
        np.testing.assert_allclose(np.asarray(back.data), phantom(16))
        assert back.modality == "CT"

    def test_statistics(self):
        st = MedicalImage(jnp.asarray(phantom(16))).statistics()
        assert st["max"] >= 1.0 and st["min"] == 0.0

    def test_unsupported_format(self, tmp_path):
        with pytest.raises(ValueError):
            load_image(str(tmp_path / "x.dcm"))


class TestDeformableRegistration:
    """B-spline free-form registration (ref declares deformable in
    RegistrationMethod, medical_imaging.hpp:971, kernels absent)."""

    def test_recovers_smooth_deformation(self):
        import numpy as np

        from njw_tpu.medical.registration import (
            register_deformable, warp_deformable,
        )

        # smooth synthetic image
        y, x = np.mgrid[0:64, 0:64].astype(np.float32)
        img = (np.sin(x / 6.0) * np.cos(y / 7.0)
               + 0.5 * np.exp(-((x - 32) ** 2 + (y - 30) ** 2) / 200))
        # known smooth warp via a random small control grid
        rng = np.random.default_rng(0)
        true_ctrl = rng.normal(0.0, 1.5, (2, 9, 9)).astype(np.float32)
        moving = np.asarray(warp_deformable(img, -true_ctrl))

        ctrl, warped, hist = register_deformable(
            img, moving, grid_shape=(6, 6), n_iterations=200,
            learning_rate=1.0, smooth_weight=0.001)
        mse0 = float(np.mean((moving - img) ** 2))
        mse1 = float(np.mean((warped - img) ** 2))
        assert hist[-1] < hist[0]
        assert mse1 < 0.3 * mse0  # large residual reduction

    def test_zero_control_is_identity(self):
        import numpy as np

        from njw_tpu.medical.registration import warp_deformable

        img = np.random.default_rng(1).random((32, 48)).astype(np.float32)
        out = np.asarray(warp_deformable(img, np.zeros((2, 8, 8),
                                                       np.float32)))
        np.testing.assert_allclose(out, img, atol=1e-5)


class TestConeBeamCT:
    """FDK cone-beam reconstruction (production scanner geometry; the
    reference's kernels are parallel-beam only)."""

    def _ball_phantom(self, n=32, r=6.0):
        import numpy as np

        z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
        c = (n - 1) / 2.0
        return ((z - c) ** 2 + (y - c) ** 2 + (x - c) ** 2
                < r * r).astype(np.float32)

    def test_projection_symmetry(self):
        import numpy as np

        from njw_tpu.medical.ct import cone_beam_project

        vol = self._ball_phantom()
        angles = np.linspace(0, 2 * np.pi, 8, endpoint=False)
        proj = np.asarray(cone_beam_project(
            vol, angles, sod=80.0, sdd=120.0, det_shape=(48, 48)))
        assert proj.shape == (8, 48, 48)
        # centered ball: all views identical, max at detector center
        np.testing.assert_allclose(proj[0], proj[4], atol=1e-2)
        cy, cx = np.unravel_index(proj[0].argmax(), proj[0].shape)
        assert abs(cy - 23.5) < 2 and abs(cx - 23.5) < 2

    def test_fdk_reconstructs_ball(self):
        import numpy as np

        from njw_tpu.medical.ct import cone_beam_project, fdk_reconstruct

        n = 32
        vol = self._ball_phantom(n)
        angles = np.linspace(0, 2 * np.pi, 36, endpoint=False)
        proj = cone_beam_project(vol, angles, sod=80.0, sdd=120.0,
                                 det_shape=(48, 48))
        rec = np.asarray(fdk_reconstruct(proj, angles, sod=80.0,
                                         sdd=120.0, output_size=n))
        # structural agreement: normalized correlation with the phantom
        a = (rec - rec.mean()).ravel()
        b = (vol - vol.mean()).ravel()
        corr = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert corr > 0.8
        # interior bright, exterior dark
        c = n // 2
        assert rec[c, c, c] > 3 * abs(rec[2, 2, 2])
