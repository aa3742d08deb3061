"""Spectral analysis: FFT, Welch PSD, CSD, coherence, spectrogram, peak &
harmonic detection.

API parity with the reference's FFT / SpectralAnalyzer classes
(ref: spectral_analysis.h:58-254; Python ref:
python/signal_processing/spectral.py:41-778). All transforms are batched
jnp.fft (XLA FFT) — the TPU replacement for cuFFT plan caching
(ref: spectral_analysis.cpp:294-322) and the custom radix-2 kernels
(ref: fft_kernels.cu:924-992). Functions accept (n,) or (batch, n).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from njw_tpu.signal.windows import get_window


class FFT:
    """1-D/2-D FFT facade (ref: spectral_analysis.h:58; spectral.py:41)."""

    def __init__(self, normalize: bool = False):
        self.norm = "ortho" if normalize else None

    def forward(self, x):
        return jnp.fft.fft(jnp.asarray(x), norm=self.norm)

    def inverse(self, X):
        return jnp.fft.ifft(jnp.asarray(X), norm=self.norm)

    def forward_real(self, x):
        return jnp.fft.rfft(jnp.asarray(x), norm=self.norm)

    def inverse_real(self, X, n: Optional[int] = None):
        return jnp.fft.irfft(jnp.asarray(X), n=n, norm=self.norm)

    def forward2d(self, x):
        return jnp.fft.fft2(jnp.asarray(x), norm=self.norm)

    def inverse2d(self, X):
        return jnp.fft.ifft2(jnp.asarray(X), norm=self.norm)

    @staticmethod
    def magnitude(X):
        return jnp.abs(X)

    @staticmethod
    def phase(X):
        return jnp.angle(X)

    @staticmethod
    def power_db(X, floor_db: float = -200.0):
        p = jnp.abs(X) ** 2
        return jnp.maximum(10.0 * jnp.log10(jnp.maximum(p, 1e-30)), floor_db)


def _frame(x: jnp.ndarray, nperseg: int, step: int) -> jnp.ndarray:
    """(..., n) -> (..., frames, nperseg) strided windows.

    When nperseg % step == 0 (the standard 50%-overlap case) the windows
    are built from nperseg/step SLICES of a hop-chunked reshape — TPU
    window gathers are pathologically slow (~40x); the gather path is
    only the ragged fallback."""
    n = x.shape[-1]
    n_frames = 1 + (n - nperseg) // step if n >= nperseg else 0
    if n_frames > 0 and nperseg % step == 0:
        k = nperseg // step
        rows_needed = n_frames + k - 1
        xr = x[..., :rows_needed * step].reshape(
            x.shape[:-1] + (rows_needed, step))
        parts = [jax.lax.slice_in_dim(xr, i, i + n_frames, axis=-2)
                 for i in range(k)]
        return jnp.concatenate(parts, axis=-1)
    idx = (jnp.arange(n_frames)[:, None] * step
           + jnp.arange(nperseg)[None, :])
    return x[..., idx]


@partial(jax.jit, static_argnames=("nperseg", "noverlap", "window",
                                   "detrend", "fs"))
def compute_psd(x, fs: float = 1.0, nperseg: int = 256,
                noverlap: Optional[int] = None, window: str = "hann",
                detrend: bool = True):
    """Welch power spectral density (ref: SpectralAnalyzer PSD,
    spectral_analysis.h:254; spectral.py:638). Returns (freqs, psd)."""
    x = jnp.asarray(x, jnp.float32)
    if noverlap is None:
        noverlap = nperseg // 2
    step = nperseg - noverlap
    frames = _frame(x, nperseg, step)
    if detrend:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    w = get_window(window, nperseg)
    spec = jnp.fft.rfft(frames * w, axis=-1)
    scale = 1.0 / (fs * jnp.sum(w * w))
    p = (jnp.abs(spec) ** 2) * scale
    # one-sided correction (all bins except DC and Nyquist doubled)
    p = p.at[..., 1:-1].multiply(2.0) if nperseg % 2 == 0 else (
        p.at[..., 1:].multiply(2.0))
    psd = jnp.mean(p, axis=-2)
    freqs = jnp.fft.rfftfreq(nperseg, d=1.0 / fs)
    return freqs, psd


@partial(jax.jit, static_argnames=("nperseg", "noverlap", "window", "fs"))
def compute_csd(x, y, fs: float = 1.0, nperseg: int = 256,
                noverlap: Optional[int] = None, window: str = "hann"):
    """Cross spectral density (ref: spectral_analysis.h:254 CSD)."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    if noverlap is None:
        noverlap = nperseg // 2
    step = nperseg - noverlap
    w = get_window(window, nperseg)
    fx = _frame(x, nperseg, step) * w
    fy = _frame(y, nperseg, step) * w
    X = jnp.fft.rfft(fx, axis=-1)
    Y = jnp.fft.rfft(fy, axis=-1)
    scale = 1.0 / (fs * jnp.sum(w * w))
    csd = jnp.mean(jnp.conj(X) * Y, axis=-2) * scale
    # one-sided doubling, consistent with compute_psd
    csd = csd.at[..., 1:-1].multiply(2.0) if nperseg % 2 == 0 else (
        csd.at[..., 1:].multiply(2.0))
    freqs = jnp.fft.rfftfreq(nperseg, d=1.0 / fs)
    return freqs, csd


@partial(jax.jit, static_argnames=("nperseg", "noverlap", "window", "fs"))
def compute_coherence(x, y, fs: float = 1.0, nperseg: int = 256,
                      noverlap: Optional[int] = None, window: str = "hann"):
    """Magnitude-squared coherence (ref: coherence kernel,
    fft_kernels.cu:285-368)."""
    f, pxx = compute_psd(x, fs, nperseg, noverlap, window, detrend=False)
    _, pyy = compute_psd(y, fs, nperseg, noverlap, window, detrend=False)
    _, pxy = compute_csd(x, y, fs, nperseg, noverlap, window)
    coh = (jnp.abs(pxy) ** 2) / jnp.maximum(pxx * pyy, 1e-30)
    return f, coh


@partial(jax.jit, static_argnames=("nperseg", "noverlap", "window", "fs"))
def compute_spectrogram(x, fs: float = 1.0, nperseg: int = 256,
                        noverlap: Optional[int] = None,
                        window: str = "hann"):
    """(freqs, times, Sxx) power spectrogram (ref: spectrogram kernel,
    fft_kernels.cu:535-582; spectral.py:691)."""
    x = jnp.asarray(x, jnp.float32)
    if noverlap is None:
        noverlap = nperseg // 2
    step = nperseg - noverlap
    w = get_window(window, nperseg)
    frames = _frame(x, nperseg, step) * w
    spec = jnp.fft.rfft(frames, axis=-1)
    sxx = (jnp.abs(spec) ** 2) / (fs * jnp.sum(w * w))
    sxx = sxx.at[..., 1:-1].multiply(2.0)
    freqs = jnp.fft.rfftfreq(nperseg, d=1.0 / fs)
    n_frames = sxx.shape[-2]
    times = (jnp.arange(n_frames) * step + nperseg / 2) / fs
    return freqs, times, jnp.swapaxes(sxx, -1, -2)


def detect_peaks(spectrum, freqs=None, threshold_db: float = -40.0,
                 min_distance: int = 1, max_peaks: int = 16):
    """Local-maximum peak picking on a power spectrum
    (ref: peak-detection kernel, fft_kernels.cu:438-504; spectral.py:744).
    Returns (indices, values) as NumPy arrays (host-side, variable count).
    """
    p = np.asarray(spectrum, dtype=np.float64)
    pdb = 10.0 * np.log10(np.maximum(p / max(p.max(), 1e-300), 1e-30))
    cand = np.where(
        (pdb >= threshold_db)
        & (p > np.roll(p, 1)) & (p >= np.roll(p, -1))
    )[0]
    cand = cand[(cand > 0) & (cand < len(p) - 1)]
    cand = cand[np.argsort(p[cand])[::-1]]
    chosen: list[int] = []
    for idx in cand:
        if all(abs(idx - c) >= min_distance for c in chosen):
            chosen.append(int(idx))
        if len(chosen) >= max_peaks:
            break
    chosen.sort()
    idxs = np.asarray(chosen, dtype=np.int64)
    if freqs is not None:
        return idxs, np.asarray(freqs)[idxs]
    return idxs, p[idxs]


def detect_harmonics(spectrum, freqs, f0_range=(20.0, 2000.0),
                     n_harmonics: int = 5, tolerance: float = 0.03):
    """Find the fundamental whose harmonic comb collects the most power
    (ref: harmonic-detection kernel, fft_kernels.cu:487-504)."""
    p = np.asarray(spectrum, dtype=np.float64)
    freqs = np.asarray(freqs)
    idxs, _ = detect_peaks(p, threshold_db=-60.0, max_peaks=32)
    if len(idxs) == 0:
        return None
    best, best_score = None, -1.0
    for i in idxs:
        f0 = freqs[i]
        if not (f0_range[0] <= f0 <= f0_range[1]):
            continue
        score = 0.0
        for k in range(1, n_harmonics + 1):
            target = k * f0
            if target > freqs[-1]:
                break
            j = int(np.argmin(np.abs(freqs - target)))
            if abs(freqs[j] - target) <= tolerance * target + 1e-12:
                score += p[j]
        if score > best_score:
            best, best_score = f0, score
    return best


def cepstrum(x, kind: str = "real"):
    """Real or power cepstrum: IFFT(log |FFT(x)|) (ref cepstrum kernel:
    fft_kernels.cu:1364-1388). Batched over leading dims."""
    import jax.numpy as jnp

    x = jnp.asarray(x, jnp.float32)
    spec = jnp.abs(jnp.fft.rfft(x, axis=-1))
    logmag = jnp.log(jnp.maximum(spec, 1e-12))
    c = jnp.fft.irfft(logmag, n=x.shape[-1], axis=-1)
    if kind == "power":
        return c * c
    if kind != "real":
        raise ValueError("kind must be 'real' or 'power'")
    return c


def pitch_detect(x, fs: float, fmin: float = 50.0, fmax: float = 800.0):
    """Cepstral pitch estimate in Hz (ref pitch kernel:
    fft_kernels.cu:1364-1388): the quefrency of the cepstral peak within
    the [1/fmax, 1/fmin] lag band. Batched over leading dims."""
    import jax.numpy as jnp

    c = cepstrum(x)
    n = c.shape[-1]
    q_lo = max(int(fs / fmax), 1)
    q_hi = min(int(fs / fmin) + 1, n // 2)
    band = c[..., q_lo:q_hi]
    q = jnp.argmax(band, axis=-1) + q_lo
    return fs / q.astype(jnp.float32)


class SpectralAnalyzer:
    """Facade bundling the spectral ops (ref: spectral_analysis.h:254;
    spectral.py:269) with a fixed sample rate and window config."""

    def __init__(self, fs: float = 1.0, nperseg: int = 256,
                 noverlap: Optional[int] = None, window: str = "hann"):
        self.fs = fs
        self.nperseg = nperseg
        self.noverlap = nperseg // 2 if noverlap is None else noverlap
        self.window = window

    def psd(self, x):
        return compute_psd(x, self.fs, self.nperseg, self.noverlap,
                           self.window)

    def csd(self, x, y):
        return compute_csd(x, y, self.fs, self.nperseg, self.noverlap,
                           self.window)

    def coherence(self, x, y):
        return compute_coherence(x, y, self.fs, self.nperseg, self.noverlap,
                                 self.window)

    def spectrogram(self, x):
        return compute_spectrogram(x, self.fs, self.nperseg, self.noverlap,
                                   self.window)

    def find_peaks(self, x, **kw):
        f, p = self.psd(x)
        idx, _ = detect_peaks(p, **kw)
        return np.asarray(f)[idx], np.asarray(p)[idx]

    def fundamental(self, x, **kw):
        f, p = self.psd(x)
        return detect_harmonics(p, f, **kw)
