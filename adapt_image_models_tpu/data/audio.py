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


# ---------------------------------------------------------------------------
# Compiled audio sample preparation (the audio analog of
# ``data/pipeline.build_sample_processor``). Parses the mmaction-style
# pipeline config once; per-sample work is pure numpy over an explicit rng.


class AudioSampleProcessor:
    """Compile an audio pipeline config into ``(info, rng) -> (audios, label)``.

    Supported steps (reference ``pipelines/loading.py`` /
    ``augmentations.py``):
      AudioDecodeInit / LoadAudioFeature  (mode selection)
      SampleFrames                        (frame-index sampling)
      AudioDecode(fixed_length)           (wav window per clip, ``:1371``)
      AudioFeatureSelector(fixed_length)  (feature rows per clip, ``:1462``)
      AudioAmplify(ratio)                 (train gain jitter, ``:1975``)
      MelSpectrogram(...)                 (log-mel, ``:2011``)
      FormatAudioShape('NCTF')            (final layout, ``formating.py:338``)
    """

    def __init__(self, pipeline_cfg):
        from adapt_image_models_tpu.data.sampling import SampleFrames
        self.mode = "wav"
        self.pad_method = "zero"
        self.sampler = None
        self.fixed_length = 32000
        self.feat_fixed_length = 128
        self.amplify_ratio = None
        self.mel_cfg = None
        self.fmt = "NCTF"
        for step in pipeline_cfg:
            t = step["type"]
            kw = {k: v for k, v in step.items() if k != "type"}
            if t in ("AudioDecodeInit",):
                self.mode = "wav"
            elif t == "LoadAudioFeature":
                self.mode = "feature"
                # pad_method fabricates the dummy input for videos WITHOUT
                # an audio stream (reference loading.py:1332-1358)
                self.pad_method = kw.get("pad_method", "zero")
                assert self.pad_method in ("zero", "random")
            elif t == "SampleFrames":
                self.sampler = SampleFrames(**{
                    k: v for k, v in kw.items()
                    if k in ("clip_len", "frame_interval", "num_clips",
                             "temporal_jitter", "twice_sample",
                             "out_of_bound_opt", "test_mode",
                             "frame_uniform")})
            elif t == "AudioDecode":
                self.fixed_length = int(kw.get("fixed_length", 32000))
            elif t == "AudioFeatureSelector":
                self.feat_fixed_length = int(kw.get("fixed_length", 128))
            elif t == "AudioAmplify":
                self.amplify_ratio = float(kw.get("ratio", 0.5))
            elif t in ("MelSpectrogram", "MelLogSpectrogram"):
                # the reference's shipped tsn_r50 audio recipe spells the op
                # 'MelLogSpectrogram' though only MelSpectrogram is
                # registered (augmentations.py:2011) — accept both
                self.mel_cfg = kw
            elif t == "FormatAudioShape":
                self.fmt = kw.get("input_format", "NCTF")
            elif t in ("Collect", "ToTensor", "Normalize"):
                continue
            else:
                raise KeyError(f"unsupported audio pipeline step {t}")
        if self.sampler is None:
            raise ValueError("audio pipeline needs a SampleFrames step")

    def _clip_windows(self, frame_inds, total_frames, length):
        """Reference window mapping (``loading.py:1389-1404``)."""
        n_clips = self.sampler.views
        frame_inds = np.asarray(frame_inds).reshape(n_clips, -1)
        spans = []
        for clip in frame_inds:
            s = max(0, int(round((clip[0] + 1) / total_frames * length)))
            e = min(length,
                    int(round((clip[-1] + 1) / total_frames * length)))
            spans.append((s, e))
        return spans

    def __call__(self, info, rng):
        total_frames = int(info["total_frames"])
        frame_inds = self.sampler(total_frames,
                                  info.get("start_index", 0), rng=rng)
        if self.mode == "feature":
            import os as _os
            if _os.path.exists(info["audio_path"]):
                feats = np.load(info["audio_path"]).astype(np.float32)
            else:
                # no audio stream: dummy 10 s spectrogram by pad_method
                # (reference loading.py:1352-1358)
                feats = (rng.random((640, 80), dtype=np.float32)
                         if self.pad_method == "random"
                         else np.zeros((640, 80), np.float32))
            length = feats.shape[0]
            clips = []
            for s, e in self._clip_windows(frame_inds, total_frames, length):
                win = feats[s:e]
                if win.shape[0] >= self.feat_fixed_length:
                    win = win[:self.feat_fixed_length]
                else:
                    win = np.pad(win, ((0, self.feat_fixed_length
                                        - win.shape[0]), (0, 0)))
                clips.append(win)
            audios = np.stack(clips)  # (S, T, F)
        else:
            y, sr = load_wav(info["audio_path"])
            length = len(y)
            clips = []
            for s, e in self._clip_windows(frame_inds, total_frames, length):
                win = y[s:e]
                if win.shape[0] >= self.fixed_length:
                    win = win[:self.fixed_length]
                else:
                    win = np.pad(win, (0, self.fixed_length - win.shape[0]))
                if self.amplify_ratio is not None and not self.sampler.test_mode:
                    win = amplify(win, rng, self.amplify_ratio)
                mel_kw = dict(self.mel_cfg or {})
                mel_kw.setdefault("sr", sr)
                mel_kw.setdefault("fixed_frames",
                                  self.fixed_length // mel_kw.get(
                                      "hop_length", 160) + 1)
                clips.append(melspectrogram(win, **mel_kw))
            audios = np.stack(clips)  # (S, T, F)
        if self.fmt != "NCTF":
            raise NotImplementedError(f"FormatAudioShape {self.fmt}")
        return audios[:, None].astype(np.float32)  # (S, 1, T, F)
