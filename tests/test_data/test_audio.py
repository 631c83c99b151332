"""Audio pipeline + AudioRecognizer."""

import wave

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adapt_image_models_tpu.data.audio import (
    load_wav, melspectrogram, amplify,
)
from adapt_image_models_tpu.models import build_model


@pytest.fixture
def wav_file(tmp_path):
    path = str(tmp_path / "t.wav")
    sr = 16000
    t = np.arange(sr) / sr
    y = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(y.tobytes())
    return path


def test_load_wav(wav_file):
    y, sr = load_wav(wav_file)
    assert sr == 16000 and len(y) == 16000
    assert abs(float(np.abs(y).max()) - 0.5) < 0.01


def test_melspectrogram_peak(wav_file):
    y, sr = load_wav(wav_file)
    mel = melspectrogram(y, sr=sr, n_mels=80, fixed_frames=96)
    assert mel.shape == (96, 80)
    # 440 Hz tone -> energy concentrated in low mel bins
    assert mel[:5].argmax(axis=1).max() < 20


def test_amplify_deterministic():
    y = np.ones(100, np.float32)
    a = amplify(y, np.random.default_rng(0))
    b = amplify(y, np.random.default_rng(0))
    np.testing.assert_array_equal(a, b)
    assert 0.5 <= abs(a[0]) <= 1.5


def test_audio_recognizer():
    cfg = dict(
        type="AudioRecognizer",
        backbone=dict(type="ResNet", depth=18),
        cls_head=dict(type="AudioTSNHead", num_classes=5, in_channels=512,
                      dropout_ratio=0.0),
        test_cfg=dict(average_clips="prob"),
    )
    model = build_model(cfg)
    # (B, S, 1, frames, mels) spectrogram segments; ResNet wants NCHW
    x = jnp.ones((2, 3, 1, 96, 80))
    variables = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(variables, x)
    assert logits.shape == (2, 5)
