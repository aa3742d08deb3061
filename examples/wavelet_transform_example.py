"""Wavelet/time-frequency example (ref: signal wavelet_transform_example
role): chirp -> DWT denoise + CWT scalogram + spectrogram."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from njw_tpu.signal import CWT, DWT, compute_spectrogram


def main():
    fs = 1000.0
    t = np.arange(4096) / fs
    clean = np.sin(2 * np.pi * (20 + 30 * t) * t).astype(np.float32)
    rng = np.random.default_rng(0)
    noisy = clean + 0.5 * rng.standard_normal(len(t)).astype(np.float32)

    dwt = DWT(wavelet="db4")
    den = np.asarray(dwt.denoise(noisy, level=4))
    print(f"input SNR : {10*np.log10(np.var(clean)/np.var(noisy-clean)):.1f} dB")
    print(f"denoised  : {10*np.log10(np.var(clean)/np.var(den-clean)):.1f} dB")

    cwt = CWT(wavelet="morlet")
    scalogram = np.abs(np.asarray(cwt.forward(
        noisy, np.geomspace(2, 64, 32).astype(np.float32))))
    print(f"scalogram shape: {scalogram.shape}")

    f, tt, S = compute_spectrogram(noisy, fs=fs, nperseg=256)
    ridge = np.asarray(f)[np.asarray(S).argmax(axis=0)]
    print(f"chirp ridge: {ridge[0]:.0f} Hz -> {ridge[-1]:.0f} Hz")


if __name__ == "__main__":
    main()
