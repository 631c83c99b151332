"""Pipeline compilation + execution tests over synthetic/real video."""

import os

import numpy as np
import pytest

from adapt_image_models_tpu.data.pipeline import build_sample_processor
from adapt_image_models_tpu.data.video_reader import (
    SyntheticVideoReader, OpenCVVideoReader,
)

IMG_NORM = dict(mean=[122.769, 116.74, 104.04], std=[68.493, 66.63, 70.321],
                to_bgr=False)

TRAIN_PIPELINE = [
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=8, frame_interval=4, num_clips=1),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="RandomResizedCrop"),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Normalize", **IMG_NORM),
    dict(type="FormatShape", input_format="NCTHW"),
    dict(type="Collect", keys=["imgs", "label"], meta_keys=[]),
    dict(type="ToTensor", keys=["imgs", "label"]),
]

TEST_PIPELINE = [
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=8, frame_interval=4, num_clips=3,
         test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 224)),
    dict(type="CenterCrop", crop_size=224),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", **IMG_NORM),
    dict(type="FormatShape", input_format="NCTHW"),
]

THREECROP_PIPELINE = [
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=8, frame_interval=4, num_clips=1,
         test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="ThreeCrop", crop_size=256),
    dict(type="Normalize", **IMG_NORM),
    dict(type="FormatShape", input_format="NCTHW"),
]


def test_train_pipeline_shapes_and_determinism():
    proc = build_sample_processor(TRAIN_PIPELINE)
    assert proc.num_views == 1 and not proc.test_mode
    assert proc.output_size() == (224, 224)
    reader = SyntheticVideoReader(num_frames=300)
    clips, label = proc(reader, 7, rng=np.random.default_rng(0))
    assert clips.shape == (1, 8, 224, 224, 3) and clips.dtype == np.uint8
    assert label == 7
    c2, _ = proc(reader, 7, rng=np.random.default_rng(0))
    np.testing.assert_array_equal(clips, c2)  # same rng -> same sample
    c3, _ = proc(reader, 7, rng=np.random.default_rng(1))
    assert not np.array_equal(clips, c3)  # different rng -> different crop


def test_test_pipeline_multiview():
    proc = build_sample_processor(TEST_PIPELINE)
    assert proc.test_mode and proc.num_views == 3
    reader = SyntheticVideoReader(num_frames=300)
    clips, _ = proc(reader, 0)
    assert clips.shape == (3, 8, 224, 224, 3)
    # deterministic
    c2, _ = proc(reader, 0)
    np.testing.assert_array_equal(clips, c2)


def test_threecrop_pipeline():
    proc = build_sample_processor(THREECROP_PIPELINE)
    assert proc.num_views == 3  # 1 clip x 3 crops
    reader = SyntheticVideoReader(num_frames=300, height=256, width=340)
    clips, _ = proc(reader, 0)
    assert clips.shape == (3, 8, 256, 256, 3)
    # left and right crops must differ, middle is centered
    assert not np.array_equal(clips[0], clips[1])


def test_unsupported_transform_raises():
    bad = TRAIN_PIPELINE[:3] + [dict(type="NoSuchTransform")]
    with pytest.raises(ValueError, match="unsupported pipeline transform"):
        build_sample_processor(bad)


@pytest.fixture(scope="module")
def real_video(tmp_path_factory):
    """Write a real video file with cv2 so the file-decode path is covered."""
    cv2 = pytest.importorskip("cv2")
    path = str(tmp_path_factory.mktemp("vids") / "test.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30, (64, 48))
    assert w.isOpened()
    rng = np.random.default_rng(0)
    for i in range(40):
        frame = np.full((48, 64, 3), i * 5 % 255, np.uint8)
        frame[:10, :10] = rng.integers(0, 255, (10, 10, 3), dtype=np.uint8)
        w.write(frame)
    w.release()
    return path


def test_opencv_reader_real_file(real_video):
    r = OpenCVVideoReader(real_video)
    assert r.num_frames == 40
    frames = r.get_frames([0, 5, 5, 39])
    assert frames.shape == (4, 48, 64, 3)
    np.testing.assert_array_equal(frames[1], frames[2])  # dedup gather
    r.close()


def test_full_pipeline_on_real_file(real_video):
    proc = build_sample_processor([
        dict(type="DecordInit"),
        dict(type="SampleFrames", clip_len=4, frame_interval=1, num_clips=2,
             test_mode=True),
        dict(type="DecordDecode"),
        dict(type="Resize", scale=(-1, 56)),
        dict(type="CenterCrop", crop_size=56),
        dict(type="Normalize", **IMG_NORM),
        dict(type="FormatShape", input_format="NCTHW"),
    ])
    clips, label = proc(real_video, 3)
    assert clips.shape == (2, 4, 56, 56, 3)
    assert label == 3


def test_multigroupcrop_randomrescale_randomscale():
    """Round-3 stragglers (reference augmentations.py:510/1193/1906)."""
    proc = build_sample_processor([
        dict(type="DecordInit"),
        dict(type="SampleFrames", clip_len=2, frame_interval=1, num_clips=1),
        dict(type="DecordDecode"),
        dict(type="RandomRescale", scale_range=(96, 128)),
        dict(type="RandomScale", scales=((128, 96), (160, 120)),
             mode="range"),
        dict(type="Resize", scale=(64, 64), keep_ratio=False),
        dict(type="MultiGroupCrop", crop_size=48, groups=3),
        dict(type="Normalize", **IMG_NORM),
        dict(type="FormatShape", input_format="NCTHW"),
    ])
    assert proc.num_views == 3
    assert proc.output_size() == (48, 48)
    reader = SyntheticVideoReader(num_frames=10, height=120, width=160)
    clips, label = proc(reader, 1, rng=np.random.default_rng(0),
                        total_frames=10)
    assert clips.shape == (3, 2, 48, 48, 3)
    # groups must be DIFFERENT random crops (with very high probability)
    assert not np.array_equal(clips[0], clips[1])


def test_randomscale_value_mode():
    proc = build_sample_processor([
        dict(type="DecordInit"),
        dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=1),
        dict(type="DecordDecode"),
        dict(type="RandomScale", scales=((64, 48), (128, 96), (96, 72)),
             mode="value"),
        dict(type="Resize", scale=(32, 32), keep_ratio=False),
        dict(type="Normalize", **IMG_NORM),
        dict(type="FormatShape", input_format="NCTHW"),
    ])
    reader = SyntheticVideoReader(num_frames=4, height=48, width=64)
    clips, _ = proc(reader, 0, rng=np.random.default_rng(3), total_frames=4)
    assert clips.shape == (1, 1, 32, 32, 3)


def test_flip_label_map():
    """Direction-sensitive classes swap on flip, once per sample
    (reference augmentations.py Flip.flip_label_map, trn sthv1 recipes)."""
    import numpy as np
    from adapt_image_models_tpu.data.pipeline import build_sample_processor

    pipe = [
        dict(type="SampleFrames", clip_len=2, frame_interval=1, num_clips=1),
        dict(type="Resize", scale=(32, 32), keep_ratio=False),
        dict(type="Flip", flip_ratio=1.0, flip_label_map={2: 4, 4: 2}),
        dict(type="Normalize", mean=[0, 0, 0], std=[1, 1, 1]),
        dict(type="FormatShape", input_format="NCHW"),
    ]
    proc = build_sample_processor(pipe)
    rng = np.random.default_rng(0)
    _, label = proc("synthetic://0", 2, rng=rng)
    assert label == 4  # flip_ratio=1 -> always flipped -> 2 -> 4
    _, label = proc("synthetic://0", 7, rng=rng)
    assert label == 7  # unmapped labels pass through
    # flip_ratio=0 never remaps
    pipe[2] = dict(type="Flip", flip_ratio=0.0, flip_label_map={2: 4})
    proc0 = build_sample_processor(pipe)
    _, label = proc0("synthetic://0", 2, rng=np.random.default_rng(0))
    assert label == 2
    # test_mode pipelines never flip (reference Flip only randomizes in train)
    proc_t = build_sample_processor([
        dict(type="SampleFrames", clip_len=2, frame_interval=1, num_clips=1,
             test_mode=True),
        dict(type="Resize", scale=(32, 32), keep_ratio=False),
        dict(type="Flip", flip_ratio=1.0, flip_label_map={2: 4}),
        dict(type="Normalize", mean=[0, 0, 0], std=[1, 1, 1]),
        dict(type="FormatShape", input_format="NCHW"),
    ])
    _, label = proc_t("synthetic://0", 2, rng=np.random.default_rng(0))
    assert label == 2


def test_pytorchvideo_wrapper_and_fuse():
    """PytorchVideoWrapper(op='RandAugment') maps to the native RandAugment
    (reference augmentations.py:2086); 'Fuse' (lazy-op materializer,
    augmentations.py:466) is a documented no-op under the two-stage design."""
    import numpy as np
    import pytest as _pytest
    from adapt_image_models_tpu.data.pipeline import build_sample_processor

    proc = build_sample_processor([
        dict(type="SampleFrames", clip_len=2, frame_interval=1, num_clips=1),
        dict(type="Resize", scale=(32, 32), keep_ratio=False),
        dict(type="Fuse"),
        dict(type="PytorchVideoWrapper", op="RandAugment", num_layers=2,
             magnitude=5),
        dict(type="Normalize", mean=[0, 0, 0], std=[1, 1, 1]),
        dict(type="FormatShape", input_format="NCHW"),
    ])
    clips, label = proc("synthetic://0", 1, rng=np.random.default_rng(0))
    assert clips.shape == (1, 2, 32, 32, 3) and label == 1
    with _pytest.raises(ValueError, match="AugMix"):
        build_sample_processor([
            dict(type="SampleFrames", clip_len=2, frame_interval=1,
                 num_clips=1),
            dict(type="Resize", scale=(32, 32), keep_ratio=False),
            dict(type="PytorchVideoWrapper", op="AugMix"),
            dict(type="Normalize", mean=[0, 0, 0], std=[1, 1, 1]),
            dict(type="FormatShape", input_format="NCHW"),
        ])


def test_build_pseudo_clip_and_aliases():
    """BuildPseudoClip repeats a 1-frame image into a clip (reference
    loading.py:1422, OmniSource web-image -> 3D recognizer); FrameSelector /
    Rename / ToDataContainer are accepted aliases/no-ops."""
    from adapt_image_models_tpu.data.pipeline import build_sample_processor

    proc = build_sample_processor([
        dict(type="FrameSelector"),
        dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=1),
        dict(type="Resize", scale=(32, 32), keep_ratio=False),
        dict(type="BuildPseudoClip", clip_len=8),
        dict(type="Rename", mapping=dict(imgs="imgs")),
        dict(type="ToDataContainer", fields=[]),
        dict(type="Normalize", mean=[0, 0, 0], std=[1, 1, 1]),
        dict(type="FormatShape", input_format="NCTHW"),
    ])
    clips, label = proc("synthetic://0", 3, rng=np.random.default_rng(0))
    assert clips.shape == (1, 8, 32, 32, 3) and label == 3
    # every pseudo frame is the same image
    for t in range(1, 8):
        np.testing.assert_array_equal(clips[0, t], clips[0, 0])


def test_imgaug_default_maps_to_randaugment():
    """Imgaug(transforms='default') IS RandAugment n=2 m=9 (reference
    augmentations.py:282-301; the tsm/tanet K400 recipes use it)."""
    from adapt_image_models_tpu.data.pipeline import build_sample_processor
    proc = build_sample_processor([
        dict(type="SampleFrames", clip_len=2, frame_interval=1, num_clips=1),
        dict(type="Resize", scale=(32, 32), keep_ratio=False),
        dict(type="Imgaug", transforms="default"),
        dict(type="Normalize", mean=[0, 0, 0], std=[1, 1, 1]),
        dict(type="FormatShape", input_format="NCHW"),
    ])
    assert ("RandAugment", dict(n=2, m=9)) in proc.steps
    clips, _ = proc("synthetic://0", 0, rng=np.random.default_rng(0))
    assert clips.shape == (1, 2, 32, 32, 3)


def test_dense_sampler_wired_not_degraded():
    """DenseSampleFrames recipes must get the 64-frame-window sampler, not
    silently degrade to uniform SampleFrames (caught in round 3)."""
    from adapt_image_models_tpu.data.pipeline import build_sample_processor
    from adapt_image_models_tpu.data.sampling import DenseSampleFrames
    proc = build_sample_processor([
        dict(type="DenseSampleFrames", clip_len=1, frame_interval=1,
             num_clips=5),
        dict(type="RawFrameDecode"),
        dict(type="Resize", scale=(16, 16), keep_ratio=False),
        dict(type="Normalize"),
        dict(type="FormatShape", input_format="NCHW"),
    ])
    assert isinstance(proc.sampler, DenseSampleFrames)
    assert proc.sampler.sample_range == 64
    # train-mode dense sampling stays inside a 64-frame window
    import numpy as np
    rng = np.random.default_rng(0)
    for _ in range(8):
        inds = proc.sampler(1000, rng=rng)
        assert inds.max() - inds.min() <= 64


def test_untrimmed_sampler_in_processor():
    """UntrimmedSampleFrames compiles for per-video tools; view count is
    video-dependent (None)."""
    from adapt_image_models_tpu.data.pipeline import build_sample_processor
    import numpy as np
    proc = build_sample_processor([
        dict(type="UntrimmedSampleFrames", clip_len=1, frame_interval=16),
        dict(type="RawFrameDecode"),
        dict(type="Resize", scale=(16, 16), keep_ratio=False),
        dict(type="Normalize"),
        dict(type="FormatShape", input_format="NCHW"),
    ])
    assert proc.num_views is None
    clips, _ = proc("synthetic://0", 0, np.random.default_rng(0))
    assert clips.shape[1:] == (1, 16, 16, 3)
    assert clips.shape[0] >= 1
