"""Audio feature pipeline (reference ``mmaction/datasets/pipelines/loading.py``
AudioDecodeInit/AudioDecode/LoadAudioFeature ``:1252-1420`` and
``audio_utils``' melspectrogram; augmentations ``AudioAmplify:1975`` /
``MelSpectrogram:2011``).

The reference decodes audio with librosa; here the mel transform is a small
numpy implementation (no librosa dependency) and raw decode accepts wav via
the stdlib. Spectrograms are fixed-shape (pad/clip) for XLA.
"""

from __future__ import annotations

import wave
from typing import Optional, Tuple

import numpy as np


def load_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a PCM wav file -> (mono float32 [-1, 1], sample_rate)."""
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
        width = w.getsampwidth()
        ch = w.getnchannels()
    if width == 2:
        data = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    if ch > 1:
        data = data.reshape(-1, ch).mean(axis=1)
    return data, sr


def amplify(y: np.ndarray, rng: Optional[np.random.Generator] = None,
            ratio: float = 0.5) -> np.ndarray:
    """AudioAmplify (reference ``augmentations.py:1975``): random gain in
    [1-ratio, 1+ratio]."""
    rng = rng or np.random.default_rng()
    return (y * rng.uniform(1 - ratio, 1 + ratio)).astype(np.float32)


def _mel_filterbank(sr: int, n_fft: int, n_mels: int) -> np.ndarray:
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    mels = np.linspace(hz_to_mel(0), hz_to_mel(sr / 2), n_mels + 2)
    freqs = mel_to_hz(mels)
    bins = np.floor((n_fft + 1) * freqs / sr).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1), np.float32)
    for i in range(n_mels):
        l, c, r = bins[i], bins[i + 1], bins[i + 2]
        for j in range(l, c):
            if c > l:
                fb[i, j] = (j - l) / (c - l)
        for j in range(c, r):
            if r > c:
                fb[i, j] = (r - j) / (r - c)
    return fb


def melspectrogram(y: np.ndarray, sr: int = 16000, n_fft: int = 400,
                   hop_length: int = 160, n_mels: int = 80,
                   fixed_frames: Optional[int] = None,
                   log: bool = True) -> np.ndarray:
    """(samples,) -> (frames, n_mels) log-mel spectrogram; pads/clips to
    ``fixed_frames`` for static XLA shapes (MelSpectrogram parity)."""
    if len(y) < n_fft:
        y = np.pad(y, (0, n_fft - len(y)))
    n_frames = 1 + (len(y) - n_fft) // hop_length
    window = np.hanning(n_fft).astype(np.float32)
    idx = (np.arange(n_fft)[None, :]
           + hop_length * np.arange(n_frames)[:, None])
    frames = y[idx] * window
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2  # (frames, n_fft//2+1)
    mel = spec @ _mel_filterbank(sr, n_fft, n_mels).T  # (frames, n_mels)
    if log:
        mel = np.log(np.maximum(mel, 1e-10))
    if fixed_frames is not None:
        if mel.shape[0] >= fixed_frames:
            mel = mel[:fixed_frames]
        else:
            mel = np.pad(mel, ((0, fixed_frames - mel.shape[0]), (0, 0)))
    return mel.astype(np.float32)
