"""RandAugment / RandomErasing / ColorJitter host transforms."""

import numpy as np
import pytest

from adapt_image_models_tpu.data.randaugment import (
    rand_augment, random_erasing, color_jitter, RANDAUG_OPS,
)
from adapt_image_models_tpu.data.pipeline import build_sample_processor
from adapt_image_models_tpu.data.video_reader import SyntheticVideoReader


def clip():
    rng = np.random.default_rng(0)
    return rng.integers(0, 255, (4, 32, 40, 3), dtype=np.uint8)


def test_every_op_valid_output():
    c = clip()
    rng = np.random.default_rng(1)
    for op in RANDAUG_OPS:
        out = op(c, 7.0, rng)
        assert out.shape == c.shape and out.dtype == np.uint8, op.__name__


def test_rand_augment_deterministic_per_rng():
    c = clip()
    a = rand_augment(np.random.default_rng(3), c, n=4, m=7)
    b = rand_augment(np.random.default_rng(3), c, n=4, m=7)
    np.testing.assert_array_equal(a, b)
    d = rand_augment(np.random.default_rng(4), c, n=4, m=7)
    assert not np.array_equal(a, d)


def test_random_erasing():
    c = clip()
    out = random_erasing(np.random.default_rng(0), c, probability=1.0)
    assert out.shape == c.shape
    changed = (out != c).any(axis=(0, 3))
    assert changed.any()
    # rectangle: changed rows/cols form contiguous spans
    ys, xs = np.where(changed)
    assert (np.diff(np.unique(ys)) == 1).all()
    assert (np.diff(np.unique(xs)) == 1).all()
    # same rectangle across frames
    per_frame = (out != c).any(axis=3)
    for i in range(1, 4):
        np.testing.assert_array_equal(per_frame[0].astype(int) >= 0,
                                      per_frame[i].astype(int) >= 0)
    # probability 0 -> untouched
    np.testing.assert_array_equal(
        random_erasing(np.random.default_rng(0), c, probability=0.0), c)


def test_color_jitter():
    c = clip()
    out = color_jitter(np.random.default_rng(0), c)
    assert out.shape == c.shape and out.dtype == np.uint8
    assert not np.array_equal(out, c)


def test_ssv2_style_pipeline_with_imgaug():
    pipe = [
        dict(type="SampleFrames", clip_len=4, frame_interval=2, num_clips=1,
             frame_uniform=True),
        dict(type="Resize", scale=(-1, 64)),
        dict(type="RandomResizedCrop"),
        dict(type="Resize", scale=(56, 56), keep_ratio=False),
        dict(type="Flip", flip_ratio=0),
        dict(type="Imgaug", transforms=[dict(type="RandAugment", n=4, m=7)]),
        dict(type="Normalize", mean=[122.769, 116.74, 104.04],
             std=[68.493, 66.63, 70.321]),
        dict(type="RandomErasing", probability=0.25),
        dict(type="FormatShape", input_format="NCTHW"),
    ]
    proc = build_sample_processor(pipe)
    reader = SyntheticVideoReader(num_frames=64)
    clips, _ = proc(reader, 0, rng=np.random.default_rng(0))
    assert clips.shape == (1, 4, 56, 56, 3)
    assert clips.dtype == np.uint8


def test_unknown_imgaug_transform_raises():
    pipe = [
        dict(type="SampleFrames", clip_len=4),
        dict(type="Imgaug", transforms=[dict(type="CoarseDropout")]),
    ]
    with pytest.raises(ValueError, match="unsupported Imgaug"):
        build_sample_processor(pipe)
