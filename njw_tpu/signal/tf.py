"""Time-frequency analysis: STFT/ISTFT, CWT, DWT, Wigner-Ville, EMD,
mel spectrogram, MFCC.

API parity with the reference's time-frequency + wavelet stacks
(ref: time_frequency.h:150+ STFT/CWT/DWT/WignerVille/EMD pImpl classes;
wavelet_transform.h; Python ref: python/signal_processing/tf_analysis.py:66-1362
and wavelet.py:47-972). Batched jnp ops throughout; EMD's sifting loop is
host-driven (it is intrinsically data-dependent — the reference's CPU path
does the same, time_frequency.cpp).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from njw_tpu.signal.spectral import _frame
from njw_tpu.signal.windows import get_window


# ---------------------------------------------------------------------------
# STFT / ISTFT (ref: time_frequency.h STFT; kernel ref: fft_kernels.cu:1261)
# ---------------------------------------------------------------------------


class STFT:
    def __init__(self, n_fft: int = 256, hop: Optional[int] = None,
                 window: str = "hann"):
        self.n_fft = n_fft
        self.hop = hop or n_fft // 4
        self.window = window

    def forward(self, x):
        """(..., n) -> (..., freqs, frames) complex."""
        x = jnp.asarray(x, jnp.float32)
        w = get_window(self.window, self.n_fft)
        frames = _frame(x, self.n_fft, self.hop) * w
        return jnp.swapaxes(jnp.fft.rfft(frames, axis=-1), -1, -2)

    def inverse(self, S, length: Optional[int] = None):
        """Overlap-add inverse with window-square normalization."""
        S = jnp.swapaxes(jnp.asarray(S), -1, -2)   # (..., frames, freqs)
        frames = jnp.fft.irfft(S, n=self.n_fft, axis=-1)
        w = get_window(self.window, self.n_fft)
        frames = frames * w
        n_frames = frames.shape[-2]
        out_len = self.n_fft + (n_frames - 1) * self.hop
        idx = (jnp.arange(n_frames)[:, None] * self.hop
               + jnp.arange(self.n_fft)[None, :]).reshape(-1)
        batch_shape = frames.shape[:-2]
        flat = frames.reshape(batch_shape + (-1,))
        y = jnp.zeros(batch_shape + (out_len,), jnp.float32)
        y = y.at[..., idx].add(flat)
        norm = jnp.zeros(out_len, jnp.float32).at[idx].add(
            jnp.tile(w * w, n_frames))
        y = y / jnp.maximum(norm, 1e-8)
        if length is not None:
            y = y[..., :length]
        return y


# ---------------------------------------------------------------------------
# CWT (ref: time_frequency.h CWT; wavelet.py:361)
# ---------------------------------------------------------------------------


def _morlet(t, w0: float = 6.0):
    return (np.pi ** -0.25) * jnp.exp(1j * w0 * t) * jnp.exp(-0.5 * t * t)


def _ricker(t, w0: float = 6.0):
    a = 1.0
    return (2 / (jnp.sqrt(3 * a) * np.pi ** 0.25)
            * (1 - (t / a) ** 2) * jnp.exp(-0.5 * (t / a) ** 2))


_CWT_WAVELETS = {"morlet": _morlet, "ricker": _ricker, "mexican_hat": _ricker}


class CWT:
    def __init__(self, wavelet: str = "morlet", w0: float = 6.0):
        if wavelet not in _CWT_WAVELETS:
            raise ValueError(f"unknown wavelet {wavelet!r}")
        self.wavelet = wavelet
        self.w0 = w0

    def forward(self, x, scales):
        """(n,) signal x (S,) scales -> (S, n) coefficients (FFT conv)."""
        x = jnp.asarray(x, jnp.float32)
        scales = jnp.asarray(scales, jnp.float32)
        n = x.shape[-1]
        nfft = int(2 ** np.ceil(np.log2(2 * n)))
        X = jnp.fft.fft(x, n=nfft)
        t = jnp.arange(-(nfft // 2), nfft // 2, dtype=jnp.float32)

        def one(scale):
            psi = _CWT_WAVELETS[self.wavelet](t / scale, self.w0)
            psi = jnp.roll(psi, nfft // 2) / jnp.sqrt(scale)
            P = jnp.fft.fft(jnp.conj(psi[::-1]))
            return jnp.fft.ifft(X * P)[..., :n]

        return jax.vmap(one)(scales)

    def scale_to_frequency(self, scales, fs: float = 1.0):
        center = self.w0 / (2 * np.pi) if self.wavelet == "morlet" else 0.25
        return center * fs / np.asarray(scales)


# ---------------------------------------------------------------------------
# DWT (ref: wavelet_transform.h; wavelet.py:47 DWT / :589 WPT / :748 MODWT)
# ---------------------------------------------------------------------------

# Orthogonal wavelet lowpass decomposition coefficients (standard published
# Daubechies values).
_DB = {
    "haar": [0.7071067811865476, 0.7071067811865476],
    "db1": [0.7071067811865476, 0.7071067811865476],
    "db2": [0.48296291314469025, 0.836516303737469,
            0.22414386804185735, -0.12940952255092145],
    "db4": [0.23037781330885523, 0.7148465705525415,
            0.6308807679295904, -0.02798376941698385,
            -0.18703481171888114, 0.030841381835986965,
            0.032883011666982945, -0.010597401784997278],
}


def _qmf(h):
    h = np.asarray(h, np.float32)
    g = h[::-1].copy()
    g[1::2] *= -1.0
    return g


class DWT:
    """Single/multi-level discrete wavelet transform, periodic extension."""

    def __init__(self, wavelet: str = "db2"):
        if wavelet not in _DB:
            raise ValueError(
                f"unknown wavelet {wavelet!r}; available: {sorted(_DB)}")
        self.name = wavelet
        self.dec_lo = np.asarray(_DB[wavelet], np.float32)
        self.dec_hi = _qmf(self.dec_lo)
        # orthogonal: reconstruction filters are time-reverses
        self.rec_lo = self.dec_lo[::-1].copy()
        self.rec_hi = self.dec_hi[::-1].copy()

    def _analyze(self, x):
        k = len(self.dec_lo)
        xp = jnp.concatenate([x, x[..., : k - 1]], axis=-1)  # periodic
        lo = fir_corr(xp, self.dec_lo)[..., ::2]
        hi = fir_corr(xp, self.dec_hi)[..., ::2]
        n2 = x.shape[-1] // 2
        return lo[..., :n2], hi[..., :n2]

    def decompose(self, x, level: int = 1):
        """Returns [cA_L, cD_L, ..., cD_1] (wavedec layout)."""
        x = jnp.asarray(x, jnp.float32)
        details = []
        approx = x
        for _ in range(level):
            approx, d = self._analyze(approx)
            details.append(d)
        return [approx] + details[::-1]

    def _synthesize(self, lo, hi):
        k = len(self.rec_lo)
        n2 = lo.shape[-1]
        up = jnp.zeros(lo.shape[:-1] + (2 * n2,), jnp.float32)
        up_lo = up.at[..., ::2].set(lo)
        up_hi = up.at[..., ::2].set(hi)
        # periodic wrap for reconstruction
        pl = jnp.concatenate([up_lo[..., -(k - 1):], up_lo], axis=-1)
        ph = jnp.concatenate([up_hi[..., -(k - 1):], up_hi], axis=-1)
        # reconstruction is the adjoint of the periodized analysis:
        # x[j] = sum_k h[(j-2k) mod n] cA[k] + g[(j-2k) mod n] cD[k]
        #      = circular_conv(up_lo, h) + circular_conv(up_hi, g);
        # fir_corr computes correlation, so pass the reversed filters.
        y = fir_corr(pl, self.rec_lo) + fir_corr(ph, self.rec_hi)
        return y[..., : 2 * n2]

    def reconstruct(self, coeffs):
        approx = coeffs[0]
        for d in coeffs[1:]:
            approx = self._synthesize(approx, d)
        return approx

    def denoise(self, x, level: int = 3, threshold: Optional[float] = None,
                mode: str = "soft"):
        """Wavelet shrinkage denoising (ref: wavelet.py:972): universal
        threshold from the finest detail's MAD unless given."""
        coeffs = self.decompose(x, level)
        d1 = np.asarray(coeffs[-1])
        if threshold is None:
            sigma = np.median(np.abs(d1)) / 0.6745
            threshold = sigma * np.sqrt(2 * np.log(max(x.shape[-1], 2)))
        out = [coeffs[0]]
        for d in coeffs[1:]:
            if mode == "soft":
                d = jnp.sign(d) * jnp.maximum(jnp.abs(d) - threshold, 0.0)
            else:
                d = jnp.where(jnp.abs(d) > threshold, d, 0.0)
            out.append(d)
        return self.reconstruct(out)[..., : x.shape[-1]]


def fir_corr(x, taps):
    """Valid-mode correlation along the last axis (helper for DWT)."""
    from njw_tpu.signal.filters import fir_apply

    x = jnp.asarray(x, jnp.float32)
    taps = np.asarray(taps, np.float32)
    k = len(taps)
    # correlation = convolution with reversed taps; take 'valid' part
    full = fir_apply(x, taps[::-1], mode="causal")
    return full[..., k - 1:]


# ---------------------------------------------------------------------------
# Wigner-Ville (ref: time_frequency.h WignerVille)
# ---------------------------------------------------------------------------


class WignerVille:
    def frequencies(self, n: int, fs: float = 1.0):
        """Frequency axis: the WVD kernel x(t+tau)x*(t-tau) oscillates at
        2*f0, so bin k maps to f = k * fs / (2 n)."""
        return np.arange(n) * fs / (2.0 * n)

    def forward(self, x):
        """Discrete pseudo-WVD: (n,) real -> (n_freq, n) distribution."""
        x = jnp.asarray(x)
        if not jnp.iscomplexobj(x):
            x = _analytic(x)
        n = x.shape[-1]
        half = n // 2
        taus = jnp.arange(-half, half)

        def at_time(t):
            # r[tau] = x[t+tau] x*[t-tau] with zero padding outside
            ip = t + taus
            im = t - taus
            valid = (ip >= 0) & (ip < n) & (im >= 0) & (im < n)
            vals = jnp.where(valid, x[jnp.clip(ip, 0, n - 1)]
                             * jnp.conj(x[jnp.clip(im, 0, n - 1)]), 0.0)
            return vals

        r = jax.vmap(at_time)(jnp.arange(n))          # (n, 2*half)
        W = jnp.fft.fft(jnp.fft.ifftshift(r, axes=-1), axis=-1)
        return jnp.real(W).T                           # (freq, time)


def _analytic(x):
    """Analytic signal via the frequency-domain Hilbert transform."""
    n = x.shape[-1]
    X = jnp.fft.fft(x)
    h = jnp.zeros(n, jnp.float32)
    h = h.at[0].set(1.0)
    if n % 2 == 0:
        h = h.at[n // 2].set(1.0)
        h = h.at[1:n // 2].set(2.0)
    else:
        h = h.at[1:(n + 1) // 2].set(2.0)
    return jnp.fft.ifft(X * h)


# ---------------------------------------------------------------------------
# EMD (ref: time_frequency.h EMD; tf_analysis.py:953)
# ---------------------------------------------------------------------------


class EMD:
    """Empirical mode decomposition with cubic-spline envelopes (host-side
    sifting; data-dependent iteration counts can't be traced)."""

    def __init__(self, max_imfs: int = 6, max_siftings: int = 50,
                 tol: float = 0.05):
        self.max_imfs = max_imfs
        self.max_siftings = max_siftings
        self.tol = tol

    @staticmethod
    def _envelope(x, idx):
        """Natural cubic spline through (idx, x[idx]) sampled everywhere."""
        t = np.arange(len(x), dtype=np.float64)
        xi, yi = t[idx], x[idx]
        if len(xi) < 2:
            return np.full_like(x, x.mean())
        if len(xi) < 4:
            return np.interp(t, xi, yi)
        return _cubic_spline(xi, yi, t)

    def decompose(self, x):
        x = np.asarray(x, np.float64)
        residue = x.copy()
        imfs = []
        for _ in range(self.max_imfs):
            h = residue.copy()
            for _ in range(self.max_siftings):
                maxima = _local_extrema(h, np.greater)
                minima = _local_extrema(h, np.less)
                if len(maxima) < 2 or len(minima) < 2:
                    break
                upper = self._envelope(h, maxima)
                lower = self._envelope(h, minima)
                mean = 0.5 * (upper + lower)
                h_new = h - mean
                if (np.sum(mean ** 2) / max(np.sum(h ** 2), 1e-30)) < self.tol:
                    h = h_new
                    break
                h = h_new
            imfs.append(h)
            residue = residue - h
            if len(_local_extrema(residue, np.greater)) < 2:
                break
        return imfs, residue


def _local_extrema(x, op):
    idx = np.where(op(x[1:-1], x[:-2]) & op(x[1:-1], x[2:]))[0] + 1
    return np.concatenate([[0], idx, [len(x) - 1]])


def _cubic_spline(xi, yi, t):
    """Natural cubic spline evaluation (tridiagonal solve, NumPy)."""
    n = len(xi)
    h = np.diff(xi)
    rhs = np.zeros(n)
    rhs[1:-1] = 3 * ((yi[2:] - yi[1:-1]) / h[1:] - (yi[1:-1] - yi[:-2]) / h[:-1])
    # tridiagonal system for second derivatives (natural BC)
    a = np.zeros(n)
    b = np.ones(n)
    c = np.zeros(n)
    a[1:-1] = h[:-1]
    b[1:-1] = 2 * (h[:-1] + h[1:])
    c[1:-1] = h[1:]
    # Thomas algorithm
    cp = np.zeros(n)
    dp = np.zeros(n)
    cp[0] = c[0] / b[0]
    dp[0] = rhs[0] / b[0]
    for i in range(1, n):
        m = b[i] - a[i] * cp[i - 1]
        cp[i] = c[i] / m
        dp[i] = (rhs[i] - a[i] * dp[i - 1]) / m
    m2 = np.zeros(n)
    m2[-1] = dp[-1]
    for i in range(n - 2, -1, -1):
        m2[i] = dp[i] - cp[i] * m2[i + 1]
    # evaluate
    j = np.clip(np.searchsorted(xi, t) - 1, 0, n - 2)
    dx = t - xi[j]
    dj = (yi[j + 1] - yi[j]) / h[j] - h[j] * (2 * m2[j] + m2[j + 1]) / 3
    return yi[j] + dj * dx + m2[j] * dx ** 2 + (
        (m2[j + 1] - m2[j]) / (3 * h[j])) * dx ** 3


# ---------------------------------------------------------------------------
# Mel / MFCC (ref: tf_analysis.py:1270-1362)
# ---------------------------------------------------------------------------


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


def mel_filterbank(n_mels: int, n_fft: int, fs: float,
                   fmin: float = 0.0, fmax: Optional[float] = None):
    fmax = fmax or fs / 2
    mels = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz = _mel_to_hz(mels)
    bins = np.floor((n_fft + 1) * hz / fs).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1), np.float32)
    for i in range(n_mels):
        l, c, r = bins[i], bins[i + 1], bins[i + 2]
        if c > l:
            fb[i, l:c] = (np.arange(l, c) - l) / (c - l)
        if r > c:
            fb[i, c:r] = (r - np.arange(c, r)) / (r - c)
    return fb


def mel_spectrogram(x, fs: float = 16000.0, n_fft: int = 512,
                    hop: Optional[int] = None, n_mels: int = 40):
    stft = STFT(n_fft=n_fft, hop=hop or n_fft // 4)
    S = jnp.abs(stft.forward(x)) ** 2            # (freqs, frames)
    fb = jnp.asarray(mel_filterbank(n_mels, n_fft, fs))
    return fb @ S


def mfcc(x, fs: float = 16000.0, n_fft: int = 512,
         hop: Optional[int] = None, n_mels: int = 40, n_mfcc: int = 13):
    M = mel_spectrogram(x, fs, n_fft, hop, n_mels)
    logM = jnp.log(jnp.maximum(M, 1e-10))
    # DCT-II orthonormal
    k = jnp.arange(n_mels, dtype=jnp.float32)
    basis = jnp.cos(jnp.pi * (k[None, :] + 0.5) *
                    jnp.arange(n_mfcc, dtype=jnp.float32)[:, None] / n_mels)
    basis = basis * jnp.sqrt(2.0 / n_mels)
    basis = basis.at[0].multiply(1.0 / jnp.sqrt(2.0))
    return basis @ logM


class WPT:
    """Wavelet packet transform: full binary tree of DWT splits
    (ref: wavelet.py:589 WPT)."""

    def __init__(self, wavelet: str = "db2"):
        self._dwt = DWT(wavelet)

    def decompose(self, x, level: int = 2):
        """Returns the list of 2^level leaf subbands (natural order)."""
        nodes = [jnp.asarray(x, jnp.float32)]
        for _ in range(level):
            nxt = []
            for node in nodes:
                lo, hi = self._dwt._analyze(node)
                nxt += [lo, hi]
            nodes = nxt
        return nodes

    def reconstruct(self, leaves):
        nodes = list(leaves)
        while len(nodes) > 1:
            nodes = [
                self._dwt._synthesize(nodes[i], nodes[i + 1])
                for i in range(0, len(nodes), 2)
            ]
        return nodes[0]

    def energy_map(self, x, level: int = 2):
        """Per-subband energies (feature extraction use case)."""
        import numpy as _np

        return _np.asarray([float(jnp.sum(b * b))
                            for b in self.decompose(x, level)])


class MODWT:
    """Maximal-overlap (undecimated) DWT (ref: wavelet.py:748): shift-
    invariant, same length at every level; filters are rescaled by
    1/sqrt(2) and upsampled by 2^(j-1) per level."""

    def __init__(self, wavelet: str = "db2"):
        base = DWT(wavelet)
        self.h = np.asarray(base.dec_lo, np.float64) / np.sqrt(2.0)
        self.g = np.asarray(base.dec_hi, np.float64) / np.sqrt(2.0)

    def _circ_filter(self, x, taps, upsample: int):
        """Circular correlation with the taps upsampled by `upsample`."""
        n = x.shape[-1]
        full = np.zeros(len(taps) * upsample - (upsample - 1), np.float32)
        full[::upsample] = taps
        k = len(full)
        xp = jnp.concatenate([x, x[..., : k - 1]], axis=-1)
        return fir_corr(xp, full)[..., :n]

    def decompose(self, x, level: int = 3):
        """[w1, w2, ..., wL, vL] — detail coefficients per level + final
        smooth, all of the input length."""
        x = jnp.asarray(x, jnp.float32)
        out = []
        v = x
        for j in range(level):
            up = 2 ** j
            w = self._circ_filter(v, self.g, up)
            v = self._circ_filter(v, self.h, up)
            out.append(w)
        out.append(v)
        return out

    def energy_decomposition(self, x, level: int = 3):
        coeffs = self.decompose(x, level)
        import numpy as _np

        return _np.asarray([float(jnp.sum(c * c)) for c in coeffs])
