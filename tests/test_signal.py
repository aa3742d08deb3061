"""Signal-processing workload tests (coverage mirrors ref
python/tests/test_{filters,spectral,wavelet,tf_analysis}.py)."""
import numpy as np
import pytest

import jax.numpy as jnp

from njw_tpu.signal import (
    CWT, DWT, EMD, FFT, STFT, AdaptiveFilter, FIRFilter, IIRFilter,
    MultirateFilter, SpectralAnalyzer, WignerVille, butterworth, chebyshev1,
    compute_coherence, compute_psd, compute_spectrogram, detect_peaks,
    get_window, mel_spectrogram, mfcc,
)

FS = 1000.0


def tone(freq, n=4096, fs=FS, amp=1.0, phase=0.0):
    t = np.arange(n) / fs
    return (amp * np.sin(2 * np.pi * freq * t + phase)).astype(np.float32)


def band_power(x, lo, hi, fs=FS):
    f, p = compute_psd(x, fs=fs, nperseg=1024)
    f, p = np.asarray(f), np.asarray(p)
    sel = (f >= lo) & (f <= hi)
    return float(p[sel].sum())


class TestWindows:
    @pytest.mark.parametrize("name", ["hann", "hamming", "blackman",
                                      "bartlett", "flattop", "kaiser",
                                      "blackman_harris", "rectangular"])
    def test_shapes_and_symmetry(self, name):
        w = np.asarray(get_window(name, 65))
        assert w.shape == (65,)
        np.testing.assert_allclose(w, w[::-1], atol=1e-5)
        assert w.max() <= 1.0 + 1e-6

    def test_unknown_window_raises(self):
        with pytest.raises(ValueError):
            get_window("gauss9", 64)


class TestFFT:
    def test_roundtrip(self):
        x = np.random.default_rng(0).standard_normal(256).astype(np.float32)
        f = FFT()
        np.testing.assert_allclose(np.asarray(f.inverse(f.forward(x))).real,
                                   x, atol=1e-4)

    def test_tone_bin(self):
        x = tone(125.0, n=1024)  # bin 128 at fs=1000, n=1024
        X = np.abs(np.asarray(FFT().forward_real(x)))
        assert np.argmax(X[1:]) + 1 == 128

    def test_2d(self):
        x = np.random.default_rng(1).standard_normal((32, 32)).astype(np.float32)
        f = FFT()
        np.testing.assert_allclose(
            np.asarray(f.inverse2d(f.forward2d(x))).real, x, atol=1e-4)


class TestSpectral:
    def test_psd_peak_location(self):
        f, p = compute_psd(tone(100.0), fs=FS, nperseg=512)
        f, p = np.asarray(f), np.asarray(p)
        assert abs(f[np.argmax(p)] - 100.0) < 3.0

    def test_psd_batched(self):
        x = np.stack([tone(50.0), tone(200.0)])
        f, p = compute_psd(x, fs=FS, nperseg=512)
        p = np.asarray(p)
        assert p.shape[0] == 2
        assert abs(np.asarray(f)[p[0].argmax()] - 50.0) < 3.0
        assert abs(np.asarray(f)[p[1].argmax()] - 200.0) < 3.0

    def test_coherence_identical_vs_noise(self):
        rng = np.random.default_rng(2)
        x = tone(80.0) + 0.1 * rng.standard_normal(4096).astype(np.float32)
        f, coh = compute_coherence(x, x, fs=FS, nperseg=512)
        assert float(np.asarray(coh).mean()) > 0.99
        y = rng.standard_normal(4096).astype(np.float32)
        f, coh2 = compute_coherence(x, y, fs=FS, nperseg=512)
        assert float(np.asarray(coh2).mean()) < 0.5

    def test_spectrogram_chirp_ridge_moves(self):
        n = 8192
        t = np.arange(n) / FS
        x = np.sin(2 * np.pi * (50 + 30 * t) * t).astype(np.float32)
        f, tt, S = compute_spectrogram(x, fs=FS, nperseg=256)
        S = np.asarray(S)
        ridge = np.asarray(f)[S.argmax(axis=0)]
        assert ridge[-1] > ridge[0] + 20.0  # frequency rises

    def test_detect_peaks_two_tones(self):
        x = tone(100.0) + 0.5 * tone(333.0)
        f, p = compute_psd(x, fs=FS, nperseg=1024)
        idx, _ = detect_peaks(np.asarray(p), threshold_db=-30.0,
                              min_distance=5)
        freqs = np.asarray(f)[idx]
        assert any(abs(freqs - 100.0) < 3) and any(abs(freqs - 333.0) < 3)

    def test_analyzer_facade(self):
        sa = SpectralAnalyzer(fs=FS, nperseg=512)
        pf, pv = sa.find_peaks(tone(100.0))
        assert any(abs(pf - 100.0) < 3)


class TestFIR:
    def test_lowpass_separates_tones(self):
        x = tone(50.0) + tone(400.0)
        filt = FIRFilter(num_taps=101, cutoff=0.3, filter_type="lowpass")
        y = np.asarray(filt.apply(x))
        assert band_power(y, 40, 60) > 100 * band_power(y, 390, 410)

    def test_highpass(self):
        x = tone(50.0) + tone(400.0)
        filt = FIRFilter(num_taps=101, cutoff=0.5, filter_type="highpass")
        y = np.asarray(filt.apply(x))
        assert band_power(y, 390, 410) > 100 * band_power(y, 40, 60)

    def test_bandpass(self):
        x = tone(50.0) + tone(200.0) + tone(400.0)
        filt = FIRFilter(num_taps=201, cutoff=(0.3, 0.5),
                         filter_type="bandpass")
        y = np.asarray(filt.apply(x))
        assert band_power(y, 190, 210) > 30 * band_power(y, 40, 60)
        assert band_power(y, 190, 210) > 30 * band_power(y, 390, 410)

    def test_batched_matches_single(self):
        x = np.stack([tone(50.0), tone(120.0)])
        filt = FIRFilter(num_taps=51, cutoff=0.3)
        yb = np.asarray(filt.apply(x))
        y0 = np.asarray(filt.apply(x[0]))
        np.testing.assert_allclose(yb[0], y0, atol=1e-5)

    def test_causal_matches_numpy_reference(self):
        rng = np.random.default_rng(3)
        x = rng.standard_normal(256).astype(np.float32)
        taps = rng.standard_normal(15).astype(np.float32)
        y = np.asarray(FIRFilter(taps).apply(x))
        ref = np.convolve(x, taps)[:256]
        np.testing.assert_allclose(y, ref, atol=1e-4)

    @pytest.mark.parametrize("shape", [(3, 1000), (9, 4096), (2, 300)])
    def test_batch_pallas_kernel_matches_oracle(self, shape):
        """Fused batch-FIR Pallas kernel (interpret mode) vs the NumPy
        oracle — covers partial final blocks in both grid axes."""
        from njw_tpu.signal.fir_pallas import fir_batch_pallas

        rng = np.random.default_rng(7)
        x = rng.standard_normal(shape).astype(np.float32)
        taps = rng.standard_normal(101).astype(np.float32) * 0.1
        y = np.asarray(fir_batch_pallas(x, taps, block_rows=8,
                                        block_frames=4, interpret=True))
        ref = np.stack([np.convolve(r, taps)[:shape[1]] for r in x])
        np.testing.assert_allclose(y, ref, atol=2e-4)

    @pytest.mark.parametrize("shape", [(4, 800), (5, 1280)])
    def test_flat_pallas_kernel_matches_oracle(self, shape):
        """Flat-stream kernel (free bitcast framing + per-row head patch)
        vs the NumPy oracle; covers rows NOT aligned to 128 samples."""
        from njw_tpu.signal.fir_pallas import fir_batch_pallas_flat

        rng = np.random.default_rng(17)
        x = rng.standard_normal(shape).astype(np.float32)
        taps = rng.standard_normal(101).astype(np.float32) * 0.1
        y = np.asarray(fir_batch_pallas_flat(x, taps, block_frames=8,
                                             interpret=True))
        ref = np.stack([np.convolve(r, taps)[:shape[1]] for r in x])
        np.testing.assert_allclose(y, ref, atol=2e-4)

    @pytest.mark.parametrize("shape", [(3, 1000), (9, 4096), (2, 300)])
    def test_lanes_pallas_kernel_matches_oracle(self, shape):
        """Time-on-lanes kernel (no relayout) vs the NumPy oracle —
        covers partial final blocks in both grid axes."""
        from njw_tpu.signal.fir_pallas import fir_batch_pallas_lanes

        rng = np.random.default_rng(7)
        x = rng.standard_normal(shape).astype(np.float32)
        taps = rng.standard_normal(101).astype(np.float32) * 0.1
        y = np.asarray(fir_batch_pallas_lanes(x, taps, block_rows=8,
                                              block_frames=4,
                                              interpret=True))
        ref = np.stack([np.convolve(r, taps)[:shape[1]] for r in x])
        np.testing.assert_allclose(y, ref, atol=2e-4)

    @pytest.mark.parametrize("shape", [(3, 1000), (2, 300)])
    def test_bf16_lanes_kernel_matches_oracle(self, shape):
        """Opt-in half-precision kernel (bf16 in/out, f32 accumulate) vs
        the NumPy oracle within the bf16 quantization band — the
        equal-precision contract of the reference's tensor-core path
        (ref: high_perf_gpu_support.cu:103-144)."""
        from njw_tpu.signal.fir_pallas import fir_batch_pallas_bf16

        rng = np.random.default_rng(7)
        x = rng.standard_normal(shape).astype(np.float32)
        taps = rng.standard_normal(101).astype(np.float32) * 0.1
        y = np.asarray(fir_batch_pallas_bf16(
            x, taps, block_rows=8, block_frames=4, interpret=True),
            np.float32)
        assert y.dtype == np.float32  # cast back for comparison
        ref = np.stack([np.convolve(r, taps)[:shape[1]] for r in x])
        scale = np.abs(ref).max()
        assert np.abs(y - ref).max() / scale < 1.5e-2
        # taps_passes=1 is strictly coarser but same order
        y1 = np.asarray(fir_batch_pallas_bf16(
            x, taps, block_rows=8, block_frames=4, taps_passes=1,
            interpret=True), np.float32)
        assert np.abs(y1 - ref).max() / scale < 3e-2

    def test_batch_pallas_single_pass_accuracy(self):
        """passes=1 (pure bf16) stays within the documented ~2e-3 band."""
        from njw_tpu.signal.fir_pallas import fir_batch_pallas

        rng = np.random.default_rng(9)
        x = rng.standard_normal((2, 2048)).astype(np.float32)
        taps = (np.hanning(64) / np.hanning(64).sum()).astype(np.float32)
        y = np.asarray(fir_batch_pallas(x, taps, block_rows=8,
                                        block_frames=8, passes=1,
                                        interpret=True))
        ref = np.stack([np.convolve(r, taps)[:2048] for r in x])
        err = np.abs(y - ref).max() / max(np.abs(ref).max(), 1e-9)
        assert err < 5e-3


class TestIIR:
    def test_butterworth_lowpass(self):
        x = tone(30.0) + tone(400.0)
        filt = IIRFilter(design="butterworth", order=4, cutoff=0.2)
        y = np.asarray(filt.apply(x))
        assert band_power(y, 20, 40) > 100 * band_power(y, 390, 410)

    def test_butterworth_highpass(self):
        x = tone(30.0) + tone(400.0)
        filt = IIRFilter(design="butterworth", order=4, cutoff=0.5,
                         btype="highpass")
        y = np.asarray(filt.apply(x))
        assert band_power(y, 390, 410) > 50 * band_power(y, 20, 40)

    def test_chebyshev_lowpass(self):
        x = tone(30.0) + tone(400.0)
        filt = IIRFilter(design="chebyshev1", order=4, cutoff=0.2,
                         ripple_db=1.0)
        y = np.asarray(filt.apply(x))
        assert band_power(y, 20, 40) > 100 * band_power(y, 390, 410)

    def test_bessel_runs(self):
        filt = IIRFilter(design="bessel", order=4, cutoff=0.3)
        y = np.asarray(filt.apply(tone(30.0)))
        assert np.all(np.isfinite(y))

    def test_dc_gain_unity_lowpass(self):
        filt = IIRFilter(design="butterworth", order=4, cutoff=0.25)
        w, H = filt.frequency_response()
        assert abs(abs(H[0]) - 1.0) < 0.05

    def test_sos_apply_matches_reference_biquad(self):
        rng = np.random.default_rng(4)
        x = rng.standard_normal(128).astype(np.float32)
        sos = np.array([[0.2, 0.3, 0.1, 1.0, -0.5, 0.2]], np.float32)
        y = np.asarray(IIRFilter(sos).apply(x))
        # direct difference-equation reference
        ref = np.zeros(128)
        for i in range(128):
            ref[i] = (0.2 * x[i] + 0.3 * (x[i - 1] if i > 0 else 0)
                      + 0.1 * (x[i - 2] if i > 1 else 0)
                      + 0.5 * (ref[i - 1] if i > 0 else 0)
                      - 0.2 * (ref[i - 2] if i > 1 else 0))
        np.testing.assert_allclose(y, ref, atol=1e-4)


    def test_parallel_sos_matches_scan(self):
        """Doubling-scan IIR == sequential scan (same filter, reordered
        float sums) for a full 8th-order butterworth."""
        from njw_tpu.signal.filters import sos_apply

        rng = np.random.default_rng(7)
        x = rng.standard_normal(5000).astype(np.float32)
        filt = IIRFilter(design="butterworth", order=8, cutoff=0.2)
        y_par = np.asarray(sos_apply(x, filt.sos, method="parallel"))
        y_seq = np.asarray(sos_apply(x, filt.sos, method="scan"))
        np.testing.assert_allclose(y_par, y_seq, rtol=1e-4, atol=1e-4)

    def test_parallel_sos_batched(self):
        from njw_tpu.signal.filters import sos_apply

        rng = np.random.default_rng(8)
        x = rng.standard_normal((3, 4096)).astype(np.float32)
        sos = np.asarray(IIRFilter(design="butterworth", order=4,
                                   cutoff=0.3).sos)
        y = np.asarray(sos_apply(x, sos, method="parallel"))
        for i in range(3):
            np.testing.assert_allclose(
                y[i], np.asarray(sos_apply(x[i], sos, method="scan")),
                rtol=1e-4, atol=1e-4)


class TestMedianFilter:
    def test_matches_numpy(self):
        from njw_tpu.signal.filters import median_filter

        rng = np.random.default_rng(9)
        x = rng.standard_normal(257).astype(np.float32)
        y = np.asarray(median_filter(x, 11))
        xp = np.pad(x, 5, mode="edge")
        ref = np.array([np.median(xp[i:i + 11]) for i in range(257)])
        np.testing.assert_allclose(y, ref, atol=1e-6)

    def test_removes_impulse_noise(self):
        from njw_tpu.signal.filters import median_filter

        x = np.zeros(100, np.float32)
        x[50] = 100.0  # lone spike
        y = np.asarray(median_filter(x, 5))
        assert abs(y[50]) < 1e-6


class TestAdaptive:
    @pytest.mark.parametrize("method", ["lms", "nlms", "rls"])
    def test_system_identification(self, method):
        """Adaptive filter must identify an unknown FIR system
        (ref adaptive-filter use case, digital_filtering.h:335)."""
        rng = np.random.default_rng(5)
        x = rng.standard_normal(4000).astype(np.float32)
        h_true = np.array([0.5, -0.3, 0.2, 0.1], np.float32)
        d = np.convolve(x, h_true)[:4000].astype(np.float32)
        mu = 0.05 if method == "lms" else 0.5
        af = AdaptiveFilter(num_taps=4, method=method, mu=mu)
        y, e, w = af.apply(x, d)
        # converged: tail error far below signal power
        tail = np.asarray(e)[-500:]
        assert float((tail ** 2).mean()) < 1e-2
        np.testing.assert_allclose(np.asarray(w), h_true, atol=0.05)

    @pytest.mark.parametrize("method", ["lms", "nlms"])
    def test_parallel_engine_matches_sequential_scan(self, method):
        """The compact-WY parallel LMS is the SAME per-sample recurrence
        (ref semantics, filter_kernels.cu:597-651) — outputs must match
        the sequential lax.scan to float tolerance."""
        rng = np.random.default_rng(11)
        n, taps = 5000, 16
        x = rng.standard_normal(n).astype(np.float32)
        h_true = rng.standard_normal(taps).astype(np.float32) * 0.3
        d = (np.convolve(x, h_true)[:n]
             + 0.01 * rng.standard_normal(n)).astype(np.float32)
        mu = 0.01 if method == "lms" else 0.4
        seq = AdaptiveFilter(num_taps=taps, method=method, mu=mu,
                             engine="scan")
        par = AdaptiveFilter(num_taps=taps, method=method, mu=mu,
                             engine="parallel", chunk=64)
        ys, es, ws = (np.asarray(a) for a in seq.apply(x, d))
        yp, ep, wp = (np.asarray(a) for a in par.apply(x, d))
        scale = float(np.abs(ys).max())
        np.testing.assert_allclose(yp, ys, atol=2e-4 * scale)
        np.testing.assert_allclose(ep, es, atol=2e-4 * scale)
        np.testing.assert_allclose(wp, ws, atol=5e-4)

    def test_parallel_engine_ragged_and_64taps(self):
        """Ragged n (not a multiple of chunk) + the benchmark shape's
        64-tap config; zero-padded tail rows must be exact no-ops."""
        rng = np.random.default_rng(3)
        n, taps = 1337, 64
        x = rng.standard_normal(n).astype(np.float32)
        d = rng.standard_normal(n).astype(np.float32)
        seq = AdaptiveFilter(num_taps=taps, method="lms", mu=0.005,
                             engine="scan")
        par = AdaptiveFilter(num_taps=taps, method="lms", mu=0.005,
                             engine="parallel", chunk=128)
        ys, es, ws = (np.asarray(a) for a in seq.apply(x, d))
        yp, ep, wp = (np.asarray(a) for a in par.apply(x, d))
        assert yp.shape == (n,)
        scale = float(np.abs(ys).max())
        np.testing.assert_allclose(yp, ys, atol=2e-4 * scale)
        np.testing.assert_allclose(wp, ws, atol=2e-4)


class TestMultirate:
    def test_decimate_preserves_low_tone(self):
        x = tone(20.0, n=4096)
        y = np.asarray(MultirateFilter().decimate(x, 4))
        assert y.shape[-1] == 1024
        # the 20 Hz tone at fs/4=250 Hz still dominates
        f, p = compute_psd(y, fs=FS / 4, nperseg=256)
        assert abs(np.asarray(f)[np.asarray(p).argmax()] - 20.0) < 5.0

    def test_interpolate_shape_and_tone(self):
        x = tone(20.0, n=1024)
        y = np.asarray(MultirateFilter().interpolate(x, 4))
        assert y.shape[-1] == 4096
        f, p = compute_psd(y, fs=FS * 4, nperseg=1024)
        assert abs(np.asarray(f)[np.asarray(p).argmax()] - 20.0) < 5.0

    def test_resample_rational(self):
        x = tone(20.0, n=1000)
        y = np.asarray(MultirateFilter().resample(x, 3, 2))
        assert y.shape[-1] == 1500


class TestSTFT:
    def test_roundtrip(self):
        x = tone(100.0, n=2048) + 0.3 * tone(250.0, n=2048)
        st = STFT(n_fft=256, hop=64)
        y = np.asarray(st.inverse(st.forward(x), length=2048))
        # edges lose energy; compare the interior
        np.testing.assert_allclose(y[256:-256], x[256:-256], atol=1e-3)


class TestCWT:
    def test_morlet_scale_of_tone(self):
        x = tone(50.0, n=2048)
        cwt = CWT("morlet")
        scales = np.arange(2, 40, dtype=np.float32)
        C = np.abs(np.asarray(cwt.forward(x, scales)))
        power = (C ** 2).mean(axis=1)
        best = scales[power.argmax()]
        f_est = cwt.scale_to_frequency(best, fs=FS)
        assert abs(f_est - 50.0) < 10.0


class TestDWT:
    @pytest.mark.parametrize("wavelet", ["haar", "db2", "db4"])
    def test_perfect_reconstruction(self, wavelet):
        rng = np.random.default_rng(6)
        x = rng.standard_normal(256).astype(np.float32)
        dwt = DWT(wavelet)
        coeffs = dwt.decompose(x, level=3)
        y = np.asarray(dwt.reconstruct(coeffs))[:256]
        np.testing.assert_allclose(y, x, atol=1e-3)

    def test_denoise_reduces_error(self):
        rng = np.random.default_rng(7)
        clean = tone(10.0, n=1024)
        noisy = clean + 0.5 * rng.standard_normal(1024).astype(np.float32)
        den = np.asarray(DWT("db4").denoise(noisy, level=4))
        assert ((den - clean) ** 2).mean() < ((noisy - clean) ** 2).mean() * 0.5


class TestWignerVille:
    def test_tone_concentration(self):
        x = tone(100.0, n=256)
        wv = WignerVille()
        W = np.asarray(wv.forward(x))
        freqs = wv.frequencies(W.shape[0], fs=FS)
        ridge = freqs[np.abs(W).mean(axis=1).argmax()]
        assert abs(ridge - 100.0) < 15.0


class TestEMD:
    def test_separates_two_scales(self):
        x = tone(5.0, n=1024) + 0.5 * tone(80.0, n=1024)
        imfs, residue = EMD(max_imfs=4).decompose(x)
        assert len(imfs) >= 2
        # first IMF carries the fast oscillation
        f, p = compute_psd(imfs[0].astype(np.float32), fs=FS, nperseg=512)
        assert abs(np.asarray(f)[np.asarray(p).argmax()] - 80.0) < 10


class TestMel:
    def test_shapes(self):
        x = tone(440.0, n=4096, fs=16000.0)
        M = np.asarray(mel_spectrogram(x, fs=16000.0, n_fft=512, n_mels=40))
        assert M.shape[0] == 40
        C = np.asarray(mfcc(x, fs=16000.0, n_fft=512, n_mfcc=13))
        assert C.shape[0] == 13
        assert np.all(np.isfinite(C))


class TestWPTMODWT:
    def test_wpt_perfect_reconstruction(self):
        from njw_tpu.signal import WPT

        rng = np.random.default_rng(10)
        x = rng.standard_normal(128).astype(np.float32)
        wpt = WPT("db2")
        leaves = wpt.decompose(x, level=2)
        assert len(leaves) == 4
        y = np.asarray(wpt.reconstruct(leaves))[:128]
        np.testing.assert_allclose(y, x, atol=1e-3)

    def test_wpt_energy_localizes_tone(self):
        from njw_tpu.signal import WPT

        x = tone(400.0, n=512)  # near Nyquist -> high-frequency subbands
        e = WPT("db4").energy_map(x, level=2)
        assert e[2:].sum() > e[:2].sum()

    def test_modwt_shapes_and_energy(self):
        from njw_tpu.signal import MODWT

        x = tone(50.0, n=256)
        coeffs = MODWT("db2").decompose(x, level=3)
        assert len(coeffs) == 4
        for c in coeffs:
            assert np.asarray(c).shape == (256,)
        # slow tone: energy concentrated in the final smooth
        e = MODWT("db2").energy_decomposition(x, level=3)
        assert e[-1] > 0.5 * e.sum()


class TestLeastSquaresFIR:
    def test_lowpass_response(self):
        from njw_tpu.signal import design_fir_least_squares

        h = design_fir_least_squares(
            101, bands=[(0.0, 0.2), (0.3, 1.0)], desired=[1.0, 0.0])
        H = np.abs(np.fft.rfft(h, 1024))
        f = np.linspace(0, 1, len(H))
        assert H[(f < 0.15)].min() > 0.9
        assert H[(f > 0.35)].max() < 0.1


class TestEquirippleFIR:
    def test_equiripple_beats_ls_peak_error(self):
        from njw_tpu.signal import (design_fir_equiripple,
                                    design_fir_least_squares)

        bands = [(0.0, 0.35), (0.45, 1.0)]
        desired = [1.0, 0.0]
        h_eq = design_fir_equiripple(61, bands, desired)
        h_ls = design_fir_least_squares(61, bands, desired)

        def peak_err(h):
            H = np.abs(np.fft.rfft(h, 2048))
            f = np.linspace(0, 1, len(H))
            ep = np.abs(H[(f <= 0.35)] - 1.0).max()
            es = H[(f >= 0.45)].max()
            return max(ep, es)

        assert peak_err(h_eq) < peak_err(h_ls)

    def test_equiripple_error_is_balanced(self):
        from njw_tpu.signal import design_fir_equiripple

        h = design_fir_equiripple(61, [(0.0, 0.3), (0.42, 1.0)], [1.0, 0.0])
        H = np.abs(np.fft.rfft(h, 2048))
        f = np.linspace(0, 1, len(H))
        ep = np.abs(H[(f <= 0.3)] - 1.0).max()
        es = H[(f >= 0.42)].max()
        # minimax: band errors equalize (within a tolerance factor)
        assert 0.3 < ep / es < 3.0


class TestElliptic:
    def test_prototype_equiripple(self):
        from njw_tpu.signal.elliptic import ellipap

        z, p, g = ellipap(5, 1.0, 40.0)
        w = np.linspace(0.001, 4, 4000)
        s = 1j * w
        H = np.abs(g * np.prod(s[:, None] - z[None, :], axis=1)
                   / np.prod(s[:, None] - p[None, :], axis=1))
        pb = 20 * np.log10(H[w <= 1.0])
        assert pb.min() > -1.05 and pb.max() < 0.05
        sb = 20 * np.log10(H[w >= 1.35])
        assert sb.max() < -39.5
        assert np.all(np.real(p) < 0)  # stable

    def test_digital_elliptic_separates_tones(self):
        from njw_tpu.signal import IIRFilter

        x = tone(30.0) + tone(400.0)
        filt = IIRFilter(design="elliptic", order=5, cutoff=0.2,
                         ripple_db=1.0, stopband_db=40.0)
        y = np.asarray(filt.apply(x))
        assert np.all(np.isfinite(y))
        assert band_power(y, 20, 40) > 100 * band_power(y, 390, 410)

    def test_elliptic_sharper_than_butterworth(self):
        """Same order: elliptic transition is steeper."""
        from njw_tpu.signal import IIRFilter

        e = IIRFilter(design="elliptic", order=5, cutoff=0.3,
                      stopband_db=50.0)
        b = IIRFilter(design="butterworth", order=5, cutoff=0.3)
        we, He = e.frequency_response(2048)
        wb, Hb = b.frequency_response(2048)
        sel = we >= 0.4
        assert np.abs(He[sel]).max() < np.abs(Hb[sel]).max()


class TestBlockLMS:
    def test_system_identification(self):
        """Block-LMS (the MXU-native adaptive variant) must identify an
        unknown FIR system like per-sample LMS does."""
        from njw_tpu.signal.filters import AdaptiveFilter, fir_apply

        rng = np.random.default_rng(11)
        x = rng.standard_normal(8000).astype(np.float32)
        h_true = np.array([0.5, -0.3, 0.2, 0.1], np.float32)
        d = np.asarray(fir_apply(x, h_true))
        af = AdaptiveFilter(num_taps=8, method="block_lms", mu=0.05,
                            block_size=128)
        y, e, w = af.apply(x, d)
        # converged error far below signal power
        tail = np.asarray(e)[-1000:]
        assert np.mean(tail ** 2) < 0.01 * np.mean(d ** 2)
        np.testing.assert_allclose(np.asarray(w)[:4], h_true, atol=0.05)

    def test_ragged_tail(self):
        from njw_tpu.signal.filters import AdaptiveFilter

        af = AdaptiveFilter(num_taps=4, method="block_lms", block_size=64)
        x = np.random.default_rng(0).standard_normal(200).astype(np.float32)
        y, e, w = af.apply(x, x)
        assert y.shape == (200,) and e.shape == (200,)


class TestStreamingFilters:
    """Stateful chunked filtering (ROADMAP r1; ref reset() contract,
    digital_filtering.h:140-233): chunked == one-shot."""

    def test_streaming_fir_matches_oneshot(self):
        from njw_tpu.signal.filters import (
            StreamingFIR, design_fir_lowpass, fir_apply,
        )

        rng = np.random.default_rng(20)
        x = rng.standard_normal(1000).astype(np.float32)
        taps = design_fir_lowpass(31, 0.3)
        ref = np.asarray(fir_apply(x, taps, mode="causal"))
        sf = StreamingFIR(taps)
        out = np.concatenate([np.asarray(sf.process(c))
                              for c in np.split(x, [100, 350, 720])])
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_streaming_iir_matches_oneshot(self):
        from njw_tpu.signal.filters import StreamingIIR, sos_apply

        rng = np.random.default_rng(21)
        x = rng.standard_normal(800).astype(np.float32)
        sos = np.asarray(IIRFilter(design="butterworth", order=6,
                                   cutoff=0.25).sos)
        ref = np.asarray(sos_apply(x, sos, method="scan"))
        si = StreamingIIR(sos)
        out = np.concatenate([np.asarray(si.process(c))
                              for c in np.split(x, [64, 200, 500])])
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_reset(self):
        from njw_tpu.signal.filters import StreamingIIR

        sos = np.asarray(IIRFilter(design="butterworth", order=2,
                                   cutoff=0.3).sos)
        si = StreamingIIR(sos)
        x = np.ones(50, np.float32)
        a = np.asarray(si.process(x))
        si.reset()
        b = np.asarray(si.process(x))
        np.testing.assert_array_equal(a, b)


class TestCepstrumPitch:
    """Cepstrum + cepstral pitch (ref: fft_kernels.cu:1364-1388)."""

    def test_pitch_of_harmonic_tone(self):
        from njw_tpu.signal import pitch_detect

        fs = 8000.0
        t = np.arange(4096) / fs
        f0 = 220.0
        # rich harmonic stack (cepstral pitch needs harmonics)
        x = sum(np.sin(2 * np.pi * k * f0 * t) / k for k in range(1, 6))
        f_est = float(pitch_detect(x.astype(np.float32), fs))
        assert abs(f_est - f0) / f0 < 0.03

    def test_pitch_batched(self):
        from njw_tpu.signal import pitch_detect

        fs = 8000.0
        t = np.arange(4096) / fs
        xs = np.stack([
            sum(np.sin(2 * np.pi * k * f0 * t) / k for k in range(1, 6))
            for f0 in (150.0, 330.0)
        ]).astype(np.float32)
        est = np.asarray(pitch_detect(xs, fs))
        assert abs(est[0] - 150.0) / 150.0 < 0.03
        assert abs(est[1] - 330.0) / 330.0 < 0.03

    def test_cepstrum_shapes_and_peak(self):
        from njw_tpu.signal import cepstrum

        fs = 8000.0
        t = np.arange(2048) / fs
        x = sum(np.sin(2 * np.pi * k * 200.0 * t) for k in range(1, 5))
        c = np.asarray(cepstrum(x.astype(np.float32)))
        assert c.shape == (2048,)
        q = int(np.argmax(c[20:200])) + 20   # peak near fs/200 = 40
        assert abs(q - 40) <= 2
        cp = np.asarray(cepstrum(x.astype(np.float32), kind="power"))
        assert (cp >= 0).all()
