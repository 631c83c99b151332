"""C++ FFmpeg decoder tests (skipped unless csrc/build/libaimdecode.so exists)."""

import os

import numpy as np
import pytest

from adapt_image_models_tpu.data.cpp_decoder import is_available

pytestmark = pytest.mark.skipif(not is_available(),
                                reason="libaimdecode.so not built (csrc/build.sh)")

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("v") / "t.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30, (64, 48))
    for i in range(60):
        frame = np.full((48, 64, 3), (i * 4) % 256, np.uint8)
        w.write(frame)
    w.release()
    return path


def test_matches_opencv(video):
    from adapt_image_models_tpu.data.cpp_decoder import CppVideoReader
    from adapt_image_models_tpu.data.video_reader import OpenCVVideoReader
    rc = CppVideoReader(video)
    ro = OpenCVVideoReader(video)
    assert rc.num_frames == ro.num_frames == 60
    idx = [0, 3, 3, 17, 40, 59]
    fc = rc.get_frames(idx)
    fo = ro.get_frames(idx)
    np.testing.assert_array_equal(fc, fo)
    rc.close()
    ro.close()


def test_fused_short_side_resize(video):
    from adapt_image_models_tpu.data.cpp_decoder import CppVideoReader
    r = CppVideoReader(video, short_side=24)
    f = r.get_frames([5])
    assert f.shape == (1, 24, 32, 3)
    r.close()


def test_auto_backend_prefers_cpp(video):
    from adapt_image_models_tpu.data.video_reader import open_video
    from adapt_image_models_tpu.data.cpp_decoder import CppVideoReader
    r = open_video(video)
    assert isinstance(r, CppVideoReader)
    r.close()


def test_unsorted_duplicate_indices(video):
    from adapt_image_models_tpu.data.cpp_decoder import CppVideoReader
    r = CppVideoReader(video)
    f = r.get_frames([50, 2, 2, 30])
    for j, fi in enumerate([50, 2, 2, 30]):
        assert abs(int(np.median(f[j])) - (fi * 4) % 256) <= 2
    np.testing.assert_array_equal(f[1], f[2])
    r.close()


def test_missing_file_raises():
    from adapt_image_models_tpu.data.cpp_decoder import CppVideoReader
    with pytest.raises(FileNotFoundError):
        CppVideoReader("/nonexistent.mp4")


@pytest.fixture(scope="module")
def gradient_video(tmp_path_factory):
    """mp4v inter-coded clip with a spatial gradient (crop-sensitive)."""
    path = str(tmp_path_factory.mktemp("vc") / "g.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (160, 120))
    rng = np.random.default_rng(3)
    base = cv2.GaussianBlur(
        rng.integers(0, 255, (120, 160, 3)).astype(np.uint8), (11, 11), 5)
    for i in range(60):
        w.write(np.roll(base, i * 2, axis=1))
    w.release()
    return path


def test_fused_crop_matches_host_emulation(gradient_video):
    """aim_get_frames_crop == native decode + (chroma-aligned) crop + cv2
    resize, up to resampling-order differences (sws crops in YUV)."""
    from adapt_image_models_tpu.data.cpp_decoder import CppVideoReader
    r = CppVideoReader(gradient_video)
    idx = [2, 20, 45]
    bbox = (33, 11, 141, 103)  # odd origin: aligns down to (32, 10)
    got = r.get_frames_crop(idx, bbox, (56, 56))
    assert got.shape == (3, 56, 56, 3)
    full = CppVideoReader(gradient_video)
    frames = full.get_frames(idx)
    emu = np.stack([cv2.resize(f[10:103, 32:141], (56, 56),
                               interpolation=cv2.INTER_LINEAR)
                    for f in frames])
    diff = np.abs(got.astype(int) - emu.astype(int))
    assert diff.mean() < 3.0
    # hflip is an exact post-scale pixel reversal
    flipped = r.get_frames_crop(idx, bbox, (56, 56), hflip=True)
    np.testing.assert_array_equal(flipped, got[:, :, ::-1])
    r.close()
    full.close()


def test_fused_pipeline_rrc_and_rcc(gradient_video):
    """FusedDecordInit(fast_rrc/fast_rcc) through the compiled pipeline:
    the C++ fused path and the host fallback draw identical geometry from
    the same rng and agree up to resampling differences."""
    from adapt_image_models_tpu.data.pipeline import build_sample_processor

    train_pipe = [
        dict(type="FusedDecordInit", fast_rrc=True,
             rrc_params=(56, (0.5, 1.0)), hflip_prob=0.5),
        dict(type="SampleFrames", clip_len=4, frame_interval=2, num_clips=1),
        dict(type="DecordDecode"),
        dict(type="FormatShape", input_format="NCTHW"),
    ]
    proc = build_sample_processor(train_pipe)
    assert proc.fused_crop == dict(mode="rrc", size=56, scale=(0.5, 1.0),
                                   hflip=0.5)
    assert proc.output_size() == (56, 56)
    clips, _ = proc(gradient_video, 0, rng=np.random.default_rng(7))
    assert clips.shape == (1, 4, 56, 56, 3)

    # cpp vs host fallback: same rng -> same crop boxes (up to the <=1px
    # chroma alignment) -> near-identical pixels
    proc_cpp = build_sample_processor(train_pipe, io_backend="cpp")
    proc_ocv = build_sample_processor(train_pipe, io_backend="opencv")
    a, _ = proc_cpp(gradient_video, 0, rng=np.random.default_rng(11))
    b, _ = proc_ocv(gradient_video, 0, rng=np.random.default_rng(11))
    assert a.shape == b.shape
    assert np.abs(a.astype(int) - b.astype(int)).mean() < 8.0

    test_pipe = [
        dict(type="FusedDecordInit", fast_rcc=True, cc_params=(56,)),
        dict(type="SampleFrames", clip_len=4, frame_interval=2, num_clips=2,
             test_mode=True),
        dict(type="DecordDecode"),
        dict(type="FormatShape", input_format="NCTHW"),
    ]
    tproc = build_sample_processor(test_pipe)
    assert tproc.fused_crop["mode"] == "rcc" and tproc.test_mode
    tclips, _ = tproc(gradient_video, 0, rng=np.random.default_rng(0))
    assert tclips.shape == (2, 4, 56, 56, 3)
    # rcc is deterministic: both clips saw the same center-square crop
    t2, _ = tproc(gradient_video, 0, rng=np.random.default_rng(99))
    np.testing.assert_array_equal(tclips, t2)
