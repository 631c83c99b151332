"""SampleFrames semantics tests (reference:
tests/test_data/test_pipelines/test_loadings/test_sampling.py strategy)."""

import numpy as np
import pytest

from adapt_image_models_tpu.data.sampling import (
    SampleFrames, DenseSampleFrames, sample_frames,
)


def test_train_sampling_basic():
    rng = np.random.default_rng(0)
    s = SampleFrames(clip_len=8, frame_interval=4, num_clips=1)
    inds = s(300, rng=rng)
    assert inds.shape == (8,)
    assert (np.diff(inds) == 4).all()
    assert inds.min() >= 0 and inds.max() < 300


def test_train_sampling_randomness_within_interval():
    s = SampleFrames(clip_len=8, frame_interval=4, num_clips=1)
    starts = {s(300, rng=np.random.default_rng(i))[0] for i in range(50)}
    assert len(starts) > 10  # random offsets
    # offset bounded by avg_interval
    assert max(starts) < (300 - 32 + 1)


def test_test_sampling_deterministic_centered():
    s = SampleFrames(clip_len=8, frame_interval=4, num_clips=3, test_mode=True)
    a = s(300)
    b = s(300)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (24,)
    # exact reference arithmetic: avg_interval = (300-32+1)/3, offsets centered
    avg = (300 - 32 + 1) / 3.0
    expected0 = int(0 * avg + avg / 2.0)
    assert a[0] == expected0


def test_twice_sample():
    s = SampleFrames(clip_len=4, frame_interval=1, num_clips=2,
                     test_mode=True, twice_sample=True)
    inds = s(100)
    assert inds.shape == (16,)  # 2 clips x2 x 4 frames
    assert s.views == 4


def test_short_video_loop():
    s = SampleFrames(clip_len=16, frame_interval=4, num_clips=1)
    inds = s(10, rng=np.random.default_rng(0))
    assert inds.max() < 10  # looped into range
    assert inds.shape == (16,)


def test_repeat_last():
    inds = sample_frames(10, 16, 4, 1, out_of_bound_opt="repeat_last",
                         rng=np.random.default_rng(0))
    assert inds.max() < 10
    # tail must repeat the last in-bound index
    assert (np.diff(inds) >= 0).all()


def test_frame_uniform_ssv2():
    """SlowFast get_seq_frames parity: test mode is the segment midpoint."""
    s = SampleFrames(clip_len=8, frame_uniform=True, test_mode=True)
    inds = s(64)
    seg = 63.0 / 8
    expected = [(int(np.round(seg * i)) + int(np.round(seg * (i + 1)))) // 2
                for i in range(8)]
    np.testing.assert_array_equal(inds, expected)
    # train mode stays within segments
    st = SampleFrames(clip_len=8, frame_uniform=True)
    for i in range(5):
        tr = st(64, rng=np.random.default_rng(i))
        assert (tr >= 0).all() and (tr <= 63).all()
        assert (np.diff(tr) >= 0).all()


def test_temporal_jitter():
    a = sample_frames(300, 8, 4, 1, temporal_jitter=True,
                      rng=np.random.default_rng(0))
    assert a.shape == (8,)


def test_start_index_applied():
    s = SampleFrames(clip_len=4, frame_interval=1, num_clips=1, test_mode=True)
    a0 = s(100, start_index=0)
    a1 = s(100, start_index=1)
    np.testing.assert_array_equal(a1, a0 + 1)


def test_dense_sample():
    d = DenseSampleFrames(clip_len=8, frame_interval=1, num_clips=4)
    inds = d(200, rng=np.random.default_rng(0))
    assert inds.shape == (32,)
    assert inds.max() < 200
    dt = DenseSampleFrames(clip_len=8, frame_interval=1, num_clips=4,
                           test_mode=True)
    assert dt(200).shape == (8 * 4 * 10,)
