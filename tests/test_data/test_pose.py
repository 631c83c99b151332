"""Pose/skeleton pipeline: sampling, compaction, geometry, heatmaps,
dataset + loader integration (reference pose_loading.py / pose_dataset.py)."""

import pickle

import numpy as np
import pytest

from adapt_image_models_tpu.data.pose import (
    PoseSampleProcessor, flip_kp, generate_pose_target, keypoint_heatmaps,
    limb_heatmaps, pose_compact, pose_decode, uniform_sample_frames,
)

V = 17


def test_uniform_sample_frames_modes():
    rng = np.random.default_rng(0)
    # long video: one index per uniform bin
    inds = uniform_sample_frames(100, 10, rng=rng)
    assert inds.shape == (10,)
    bins = np.array([i * 100 // 10 for i in range(11)])
    assert np.all(inds >= bins[:10]) and np.all(inds < bins[1:])
    # short video wraps via mod
    inds = uniform_sample_frames(5, 8, rng=rng)
    assert inds.shape == (8,) and inds.max() < 5
    # mid-length: strictly increasing cover
    inds = uniform_sample_frames(12, 8, rng=rng)
    assert np.all(np.diff(inds) >= 1) and inds.max() < 12
    # test mode is deterministic given the seed
    a = uniform_sample_frames(100, 10, num_clips=3, test_mode=True)
    b = uniform_sample_frames(100, 10, num_clips=3, test_mode=True)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (30,)
    with pytest.raises(ValueError):
        uniform_sample_frames(100, 10, num_clips=2, test_mode=False)


def test_pose_decode_gathers():
    kp = np.arange(2 * 6 * V * 2, dtype=np.float32).reshape(2, 6, V, 2)
    score = np.arange(2 * 6 * V, dtype=np.float32).reshape(2, 6, V)
    inds = np.array([0, 3, 3])
    k2, s2 = pose_decode(kp, score, inds)
    assert k2.shape == (2, 3, V, 2)
    np.testing.assert_array_equal(k2[:, 1], kp[:, 3])
    np.testing.assert_array_equal(s2[:, 2], score[:, 3])


def test_pose_compact_shifts_and_threshold():
    kp = np.zeros((1, 1, V, 2), np.float32)
    kp[0, 0, :2] = [[30, 40], [70, 90]]
    out, shape = pose_compact(kp, (128, 128), padding=0.0)
    # tight box (30..70, 40..90) -> zero-keypoints stay zero, others shift
    assert out[0, 0, 0, 0] == 0 and out[0, 0, 1, 0] == 40
    assert shape == (50, 40)
    # below threshold: untouched
    kp2 = np.zeros((1, 1, V, 2), np.float32)
    kp2[0, 0, :2] = [[30, 40], [35, 44]]
    _, shape2 = pose_compact(kp2, (128, 128), threshold=10)
    assert shape2 == (128, 128)


def test_flip_swaps_left_right():
    kp = np.zeros((1, 1, V, 2), np.float32)
    kp[0, 0, 1] = [10, 5]   # left eye
    kp[0, 0, 2] = [20, 5]   # right eye
    out = flip_kp(kp, img_w=100)
    # left channel now holds the flipped right keypoint
    np.testing.assert_allclose(out[0, 0, 1], [80, 5])
    np.testing.assert_allclose(out[0, 0, 2], [90, 5])


def test_keypoint_heatmap_matches_reference_formula():
    kp = np.zeros((1, 1, V, 2), np.float32)
    kp[0, 0, 0] = [8.0, 4.0]
    val = np.zeros((1, 1, V), np.float32)
    val[0, 0, 0] = 0.7
    h = keypoint_heatmaps(kp, val, (16, 16), sigma=1.0)
    assert h.shape == (1, 16, 16, V)
    assert h[0, 4, 8, 0] == pytest.approx(0.7, abs=1e-6)
    assert h[0, 4, 9, 0] == pytest.approx(0.7 * np.exp(-0.5), rel=1e-5)
    # zero-score keypoints contribute nothing
    assert np.all(h[..., 1:] == 0)


def test_keypoint_heatmap_max_over_persons():
    kp = np.zeros((2, 1, 1, 2), np.float32)
    kp[0, 0, 0] = [4, 4]
    kp[1, 0, 0] = [4, 4]
    val = np.array([[[0.3]], [[0.9]]], np.float32)
    h = keypoint_heatmaps(kp, val, (8, 8), sigma=1.0)
    assert h[0, 4, 4, 0] == pytest.approx(0.9)


def test_limb_heatmap_segment_distance():
    kp = np.zeros((1, 1, 2, 2), np.float32)
    kp[0, 0, 0] = [2.0, 8.0]
    kp[0, 0, 1] = [12.0, 8.0]
    val = np.ones((1, 1, 2), np.float32)
    h = limb_heatmaps(kp, val, (16, 16), skeletons=((0, 1),), sigma=1.0)
    assert h.shape == (1, 16, 16, 1)
    # on the segment: distance 0 -> 1.0
    assert h[0, 8, 7, 0] == pytest.approx(1.0, abs=1e-6)
    # one pixel off the segment: exp(-0.5)
    assert h[0, 9, 7, 0] == pytest.approx(np.exp(-0.5), rel=1e-5)
    # beyond the endpoint: distance to endpoint
    assert h[0, 8, 14, 0] == pytest.approx(np.exp(-2.0), rel=1e-5)


def test_generate_pose_target_channels_and_double():
    rng = np.random.default_rng(0)
    kp = rng.uniform(4, 28, (2, 3, V, 2)).astype(np.float32)
    score = rng.uniform(size=(2, 3, V)).astype(np.float32)
    out = generate_pose_target(kp, score, (32, 32), with_kp=True,
                               with_limb=True)
    assert out.shape == (3, 32, 32, V + 17)
    dbl = generate_pose_target(kp, score, (32, 32), double=True)
    assert dbl.shape == (6, 32, 32, V)


def _make_ann(path, n_videos=3, total_frames=24):
    rng = np.random.default_rng(0)
    data = []
    for i in range(n_videos):
        data.append(dict(
            frame_dir=f"v{i}", total_frames=total_frames, label=i % 2,
            img_shape=(128, 128),
            keypoint=rng.uniform(20, 100, (2, total_frames, V, 2)).astype(
                np.float32),
            keypoint_score=rng.uniform(
                size=(2, total_frames, V)).astype(np.float32)))
    with open(path, "wb") as f:
        pickle.dump(data, f)


PIPELINE = [
    dict(type="UniformSampleFrames", clip_len=8),
    dict(type="PoseDecode"),
    dict(type="PoseCompact", hw_ratio=1.0, allow_imgpad=True),
    dict(type="Resize", scale=(-1, 24)),
    dict(type="RandomResizedCrop", area_range=(0.56, 1.0)),
    dict(type="Resize", scale=(24, 24), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="GeneratePoseTarget", sigma=0.6, use_score=True),
    dict(type="FormatShape", input_format="NCTHW"),
]


def test_pose_dataset_and_processor(tmp_path):
    from adapt_image_models_tpu.data.pose_dataset import PoseDataset
    ann = str(tmp_path / "ann.pkl")
    _make_ann(ann)
    ds = PoseDataset(ann, pipeline=PIPELINE)
    assert len(ds) == 3
    s = ds.prepare_sample(0, np.random.default_rng(0))
    assert s["imgs"].shape == (1, 8, 24, 24, V)
    assert np.isfinite(s["imgs"]).all() and s["imgs"].max() <= 1.0


def test_pose_dataset_valid_ratio_filter(tmp_path):
    from adapt_image_models_tpu.data.pose_dataset import PoseDataset
    rng = np.random.default_rng(0)
    data = []
    for i, valid in enumerate((20, 4)):
        data.append(dict(
            frame_dir=f"v{i}", total_frames=20, label=0,
            img_shape=(64, 64), valid_frames=valid,
            keypoint=rng.uniform(0, 64, (1, 20, V, 2)).astype(np.float32)))
    ann = str(tmp_path / "ann.pkl")
    with open(ann, "wb") as f:
        pickle.dump(data, f)
    ds = PoseDataset(ann, pipeline=PIPELINE, valid_ratio=0.5)
    assert len(ds) == 1 and ds[0]["frame_dir"] == "v0"


def test_pose_loader_batches(tmp_path):
    from adapt_image_models_tpu.data.loader import VideoLoader
    from adapt_image_models_tpu.data.pose_dataset import PoseDataset
    ann = str(tmp_path / "ann.pkl")
    _make_ann(ann, n_videos=4)
    ds = PoseDataset(ann, pipeline=PIPELINE)
    loader = VideoLoader(ds, pipeline=None, batch_size=2, shuffle=True,
                         seed=0, num_workers=2)
    batch = next(iter(loader))
    assert batch["imgs"].shape == (2, 1, 8, 24, 24, V)
    assert batch["label"].shape == (2,)


def test_posec3d_backbone_consumes_heatmaps():
    """SlowOnly on 17-channel heatmap input (PoseC3D recipe)."""
    import jax
    import jax.numpy as jnp
    from adapt_image_models_tpu.models import build_backbone
    bb = build_backbone(dict(
        type="ResNet3dSlowOnly", depth=50, base_channels=32,
        num_stages=3, stage_blocks=(1, 1, 1), inflate=(0, 1, 1),
        spatial_strides=(2, 2, 2), temporal_strides=(1, 1, 2)))
    x = jnp.zeros((1, V, 8, 24, 24))  # NCTHW with C=17 heatmap channels
    variables = bb.init(jax.random.PRNGKey(0), x)
    out = bb.apply(variables, x)
    assert out.shape[0] == 1 and out.ndim == 5


def test_pose_processor_double_flip_doubles_clips(tmp_path):
    """The test pipeline's double-flip GeneratePoseTarget doubles the CLIP
    axis (reference FormatShape semantics), not the frame axis."""
    from adapt_image_models_tpu.data.pose_dataset import PoseDataset
    ann = str(tmp_path / "ann.pkl")
    _make_ann(ann, n_videos=1)
    pipeline = [
        dict(type="UniformSampleFrames", clip_len=8, num_clips=2,
             test_mode=True),
        dict(type="PoseDecode"),
        dict(type="Resize", scale=(24, 24), keep_ratio=False),
        dict(type="GeneratePoseTarget", sigma=0.6, double=True),
        dict(type="FormatShape", input_format="NCTHW"),
    ]
    ds = PoseDataset(ann, pipeline=pipeline, test_mode=True)
    s = ds.prepare_sample(0, np.random.default_rng(0))
    # 2 clips x double flip -> 4 views of 8 frames each
    assert s["imgs"].shape == (4, 8, 24, 24, V)


def test_repeat_dataset_wraps_prepare_sample(tmp_path):
    """RepeatDataset(PoseDataset) must modulo indices before delegating
    prepare_sample (VideoLoader bypasses __getitem__)."""
    from adapt_image_models_tpu.data.datasets import RepeatDataset
    from adapt_image_models_tpu.data.pose_dataset import PoseDataset
    ann = str(tmp_path / "ann.pkl")
    _make_ann(ann, n_videos=2)
    rep = RepeatDataset(PoseDataset(ann, pipeline=PIPELINE), times=3)
    assert len(rep) == 6
    s = rep.prepare_sample(5, np.random.default_rng(0))  # inner idx 1
    assert s["imgs"].shape == (1, 8, 24, 24, V)
