"""Frame-exactness of the C++ decoder on an inter-frame codec.

The round-1 decoder tests only used MJPG (every frame a keyframe), which
never exercises the seek logic: any seek lands on the requested frame.
Here the fixture is MPEG-4 part 2 (the strongest inter-frame codec an
encoder exists for in this image — no libx264), whose default GOP gives
real I/P-frame structure, so keyframe seek + forward-decode must step an
exact number of frames (reference decord semantics,
``loading.py:999-1005``; SURVEY hard part 3).

Ground truth = strictly sequential full decode (no seeking at all), the
one path whose frame indexing cannot be off: OpenCV ``read()`` from frame
0, never ``set(POS_FRAMES)``.
"""

import numpy as np
import pytest

from adapt_image_models_tpu.data.cpp_decoder import is_available

pytestmark = pytest.mark.skipif(
    not is_available(), reason="libaimdecode.so not built (csrc/build.sh)")

cv2 = pytest.importorskip("cv2")

N_FRAMES = 90
SIZE = (96, 64)  # w, h


def _make_video(path: str) -> np.ndarray:
    """Encode N_FRAMES with per-frame unique smooth content (inter-coding
    friendly, so P-frames actually occur) and return the *decoded* ground
    truth by sequential full decode."""
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, SIZE)
    assert w.isOpened()
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (SIZE[1], SIZE[0], 3)).astype(np.uint8)
    base = cv2.GaussianBlur(base, (11, 11), 5)
    for i in range(N_FRAMES):
        frame = np.roll(base, i * 3, axis=1).copy()
        cv2.putText(frame, str(i), (5, 40), cv2.FONT_HERSHEY_SIMPLEX,
                    1.0, (255, 255, 255), 2)
        w.write(frame)
    w.release()

    cap = cv2.VideoCapture(path)
    truth = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        truth.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
    cap.release()
    assert len(truth) == N_FRAMES
    return np.stack(truth)


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("gop") / "gop.mp4")
    truth = _make_video(path)
    return path, truth


@pytest.mark.parametrize("indices", [
    [0, 1, 2, 3, 4, 5, 6, 7],                    # dense from start
    [11, 23, 35, 47, 59, 71, 83],                # sparse strided (seeks)
    [80, 40, 10, 70, 0, 89],                     # backward seeks
    [5, 5, 5, 64, 64, 3],                        # duplicates + backward
    [89],                                        # last frame only
    list(range(30, 60)),                         # dense mid-GOP run
])
def test_indexed_frames_match_sequential_truth(video, indices):
    from adapt_image_models_tpu.data.cpp_decoder import CppVideoReader
    path, truth = video
    r = CppVideoReader(path)
    assert r.num_frames == N_FRAMES
    got = r.get_frames(indices)
    r.close()
    np.testing.assert_array_equal(got, truth[np.asarray(indices)])


def test_fresh_reader_each_pattern_vs_reused_reader(video):
    """Seek-state leakage: a reader reused across many patterns must agree
    with a fresh reader per pattern."""
    from adapt_image_models_tpu.data.cpp_decoder import CppVideoReader
    path, truth = video
    reused = CppVideoReader(path)
    patterns = [[33, 2], [2, 33], [88, 87, 86], [0], [45, 46, 44]]
    for pat in patterns:
        fresh = CppVideoReader(path)
        a = reused.get_frames(pat)
        b = fresh.get_frames(pat)
        fresh.close()
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, truth[np.asarray(pat)])
    reused.close()


def test_motion_vector_extraction(video):
    """Native MV decode (reference PyAVDecodeMotionVector semantics):
    inter frames of a panning video carry mostly-horizontal vectors,
    key frame 0 stays zero."""
    from adapt_image_models_tpu.data.cpp_decoder import MotionVectorReader
    path, _ = video
    r = MotionVectorReader(path)
    assert r.num_frames == N_FRAMES
    mv = r.get_motion_vectors([0, 10, 11, 40])
    r.close()
    assert mv.shape == (4, 64, 96, 2) and mv.dtype == np.int8
    assert np.all(mv[0] == 0)  # key frame
    nonzero = (np.abs(mv[1:]).sum(axis=(1, 2, 3)) > 0)
    assert nonzero.any(), "no motion vectors decoded from inter frames"
    # content rolls horizontally by 3 px/frame: dominant |dx| > |dy|
    inter = mv[1:][nonzero]
    assert np.abs(inter[..., 0]).sum() > np.abs(inter[..., 1]).sum()
