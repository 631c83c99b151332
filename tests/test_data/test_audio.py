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


@pytest.fixture(scope="module", autouse=True)
def _optimized_convs():
    """ResNet/conv execution dominates parts of this module on this host;
    optimized compiles (cached persistently) beat
    jax_disable_most_optimizations (see tests/test_models/test_cnn_backbones.py)."""
    jax.config.update("jax_disable_most_optimizations", False)
    yield
    jax.config.update("jax_disable_most_optimizations", True)



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
        backbone=dict(type="ResNet", depth=18, stage_blocks=(1, 1, 1, 1)),
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


# ---------------------------------------------------------------------------
# AudioSampleProcessor + AudioFeatureDataset / AudioVisualDataset (round 3)


def test_audio_sample_processor_wav(wav_file):
    from adapt_image_models_tpu.data.audio import AudioSampleProcessor
    proc = AudioSampleProcessor([
        dict(type="AudioDecodeInit"),
        dict(type="SampleFrames", clip_len=16, frame_interval=1,
             num_clips=2, test_mode=True),
        dict(type="AudioDecode", fixed_length=8000),
        dict(type="MelSpectrogram", n_mels=32, fixed_frames=48),
        dict(type="FormatAudioShape", input_format="NCTF"),
    ])
    out = proc(dict(audio_path=wav_file, total_frames=100),
               np.random.default_rng(0))
    assert out.shape == (2, 1, 48, 32)
    assert np.isfinite(out).all()


def test_audio_feature_dataset(tmp_path):
    from adapt_image_models_tpu.data.datasets import AudioFeatureDataset
    feat = np.random.default_rng(0).normal(size=(200, 80)).astype(np.float32)
    np.save(tmp_path / "clip.npy", feat)
    ann = tmp_path / "ann.txt"
    ann.write_text("clip 200 3\n")
    ds = AudioFeatureDataset(
        str(ann), data_prefix=str(tmp_path),
        pipeline=[
            dict(type="LoadAudioFeature"),
            dict(type="SampleFrames", clip_len=64, frame_interval=1,
                 num_clips=1, test_mode=True),
            dict(type="AudioFeatureSelector"),
            dict(type="FormatAudioShape", input_format="NCTF"),
        ])
    assert len(ds) == 1
    sample = ds.prepare_sample(0, np.random.default_rng(0))
    assert sample["imgs"].shape == (1, 1, 128, 80)
    assert sample["label"] == 3
    # the window rows must come from the stored features
    win = sample["imgs"][0, 0]
    nonzero = win[np.abs(win).sum(axis=1) > 0]
    assert len(nonzero) > 0
    for row in nonzero[:3]:
        assert (np.abs(feat - row).sum(axis=1).min() < 1e-6)


def test_audio_visual_dataset(tmp_path):
    import cv2
    from adapt_image_models_tpu.data.datasets import AudioVisualDataset
    # rawframes
    frame_dir = tmp_path / "frames" / "vid1"
    frame_dir.mkdir(parents=True)
    for i in range(1, 11):
        img = np.full((32, 48, 3), i * 10, np.uint8)
        cv2.imwrite(str(frame_dir / f"img_{i:05}.jpg"), img)
    # audio features
    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    np.save(audio_dir / "vid1.npy",
            np.random.default_rng(0).normal(size=(50, 16)).astype(np.float32))
    ann = tmp_path / "ann.txt"
    ann.write_text("vid1 10 2\n")
    ds = AudioVisualDataset(
        str(ann), data_prefix=str(tmp_path / "frames"),
        audio_prefix=str(audio_dir),
        pipeline=[
            dict(type="LoadAudioFeature"),
            dict(type="SampleFrames", clip_len=4, frame_interval=1,
                 num_clips=1, test_mode=True),
            dict(type="AudioFeatureSelector", fixed_length=8),
            dict(type="FormatAudioShape", input_format="NCTF"),
            dict(type="RawFrameDecode"),
            dict(type="Resize", scale=(32, 32), keep_ratio=False),
            dict(type="Normalize", mean=[128, 128, 128], std=[64, 64, 64]),
            dict(type="FormatShape", input_format="NCTHW"),
        ])
    assert ds.video_infos[0]["audio_path"].endswith("vid1.npy")
    sample = ds.prepare_sample(0, np.random.default_rng(1))
    assert sample["audios"].shape == (1, 1, 8, 16)
    assert sample["imgs"].shape[0] == 1  # one view
    assert sample["label"] == 2
