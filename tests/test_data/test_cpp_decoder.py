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
