"""Mel spectrogram with the reference's exact numeric contract.

Parameters copied from the canonical call chain (cloning quality is
sensitive to every one of these — reference ``src/tts_pipeline_fixes.rs:12-79``
and the C++ sibling ``参考/C/tts/sparktts.cpp:179``):

  n_mels=128, n_fft=1024, hop=320, win=1024 symmetric Hann, center padding
  (n_fft/2 zeros both sides), **magnitude** spectrum (power=1.0, NOT power),
  HTK mel scale (2595·log10(1+f/700)) with Slaney area normalization
  2/(f_hi − f_lo), fmin=10 Hz, fmax=8000 Hz, linear output (no log).

The reference computes the DFT with a naive O(N²) loop; we use an rFFT —
identical math, ~3 orders of magnitude faster. Array-module polymorphic:
pass ``xp=jnp`` for an on-device XLA version, default NumPy on host (the
enrollment path is not throughput-critical).
"""

from __future__ import annotations

import functools

import numpy as np

N_MELS = 128
N_FFT = 1024
HOP_LENGTH = 320
WIN_LENGTH = 1024
SAMPLE_RATE = 16000
FMIN = 10.0
FMAX = 8000.0


def hz_to_mel(hz):
    return 2595.0 * np.log10(1.0 + np.asarray(hz, np.float64) / 700.0)


def mel_to_hz(mel):
    return 700.0 * (10.0 ** (np.asarray(mel, np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def mel_filterbank(n_mels=N_MELS, n_fft=N_FFT, sample_rate=SAMPLE_RATE,
                   fmin=FMIN, fmax=FMAX) -> np.ndarray:
    """Triangular filters on the HTK mel scale with Slaney 2/(Δf) area
    normalization, evaluated on *bin indices* exactly like the reference
    (tts_pipeline_fixes.rs:105-159). Returns [n_mels, n_fft//2+1] f32."""
    n_freqs = n_fft // 2 + 1
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    bin_pts = hz_pts * n_fft / sample_rate

    fb = np.zeros((n_mels, n_freqs), np.float64)
    k = np.arange(n_freqs, dtype=np.float64)
    for m in range(1, n_mels + 1):
        left, center, right = bin_pts[m - 1], bin_pts[m], bin_pts[m + 1]
        up = (k - left) / (center - left) if center > left else np.zeros_like(k)
        down = (right - k) / (right - center) if right > center else np.zeros_like(k)
        tri = np.where(
            (k >= left) & (k <= right),
            np.where(k <= center, up, down),
            0.0,
        )
        fb[m - 1] = tri * (2.0 / (hz_pts[m + 1] - hz_pts[m - 1]))
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=8)
def hann_window(n=WIN_LENGTH) -> np.ndarray:
    """Symmetric Hann as the reference builds it (2πi/(n−1))."""
    i = np.arange(n, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * i / (n - 1)))).astype(np.float32)


def mel_spectrogram(wav: np.ndarray, xp=np) -> np.ndarray:
    """wav [T] float32 → mel [128, n_frames] float32 (linear magnitude mel).

    n_frames for a 6-s (96000-sample) ref clip is 301, matching the
    BiCodecTokenize input contract [1, 128, 301].
    """
    wav = xp.asarray(wav, dtype=xp.float32)
    pad = N_FFT // 2
    padded = xp.concatenate([
        xp.zeros(pad, xp.float32), wav, xp.zeros(pad, xp.float32)
    ])
    n = padded.shape[0]
    n_frames = 1 if n <= N_FFT else (n - N_FFT) // HOP_LENGTH + 1

    window = xp.asarray(hann_window())
    idx = (xp.arange(n_frames)[:, None] * HOP_LENGTH
           + xp.arange(N_FFT)[None, :])
    # guard the final (possibly short) frame like the reference's
    # zero-fill-past-end behavior
    valid = idx < n
    frames = xp.where(valid, padded[xp.minimum(idx, n - 1)], 0.0) * window[None, :]

    spec = xp.abs(xp.fft.rfft(frames, axis=-1)).astype(xp.float32)  # magnitude
    fb = xp.asarray(mel_filterbank())
    return (spec @ fb.T).T.astype(xp.float32)                        # [128, F]
