"""TPU-native signal processing.

Capability parity with the reference's largest workload (src/signal_processing/,
~24k LoC C++/CUDA/Python; SURVEY §2.5): FFT/spectral analysis, digital
filtering (FIR/IIR/adaptive/multirate), and time-frequency analysis
(STFT/CWT/DWT/Wigner-Ville/EMD/mel/MFCC) — redesigned for XLA:

* FFTs are jnp.fft (XLA's native batched FFT) — replaces cuFFT plans
  (ref: spectral_analysis.cpp:294-322) and the hand-rolled radix-2 CUDA
  kernels (ref: fft_kernels.cu:924-992).
* FIR filtering and correlation are batched convolutions
  (lax.conv_general_dilated -> MXU) — replaces the three __launch_bounds__
  FIR kernel variants (ref: filter_kernels.cu:77-170).
* IIR recursions are log-depth doubling scans over the SOS state-space
  recurrence (sequential scans are the one shape TPUs hate) — replaces
  DF1/DF2/SOS kernels (ref: filter_kernels.cu:230-339); adaptive
  (LMS/NLMS/RLS) filters stay lax.scan (data-dependent recursion,
  ref :597-651).
* everything is batch-first: a (batch, n) array processes 1000 signals in
  one call (the reference's batched throughput benchmark,
  src/signal_processing/README.md:151).
"""
from njw_tpu.signal.windows import get_window, WINDOWS
from njw_tpu.signal.spectral import FFT, SpectralAnalyzer, compute_psd, \
    compute_spectrogram, compute_coherence, detect_peaks, detect_harmonics, \
    cepstrum, pitch_detect
from njw_tpu.signal.filters import (
    FIRFilter, IIRFilter, AdaptiveFilter, MultirateFilter,
    design_fir_lowpass, design_fir_bandpass, design_fir_highpass,
    design_fir_least_squares, design_fir_equiripple,
    butterworth, chebyshev1, fir_apply, sos_apply, median_filter,
)
from njw_tpu.signal.tf import STFT, CWT, DWT, WPT, MODWT, \
    WignerVille, EMD, mel_spectrogram, mfcc
