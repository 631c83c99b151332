"""Dataset parsing, evaluate(), loader batching + device transforms."""

import numpy as np
import pytest

import jax.numpy as jnp

from adapt_image_models_tpu.data.datasets import VideoDataset, RawframeDataset, build_dataset
from adapt_image_models_tpu.data.loader import VideoLoader
from adapt_image_models_tpu.data.transforms import (
    make_prepare_fn, CLIP_MEAN, CLIP_STD, three_crop, center_crop,
)
from adapt_image_models_tpu.core.metrics import (
    top_k_accuracy, mean_class_accuracy, confusion_matrix,
)

PIPE = [
    dict(type="SampleFrames", clip_len=4, frame_interval=2, num_clips=1),
    dict(type="Resize", scale=(-1, 64)),
    dict(type="CenterCrop", crop_size=64),
    dict(type="Normalize", mean=list(CLIP_MEAN), std=list(CLIP_STD)),
    dict(type="FormatShape", input_format="NCTHW"),
]


@pytest.fixture
def ann_file(tmp_path):
    p = tmp_path / "ann.txt"
    lines = [f"synthetic://{i} {i % 3}" for i in range(10)]
    p.write_text("\n".join(lines))
    return str(p)


def test_video_dataset_parse(ann_file):
    ds = VideoDataset(ann_file, PIPE)
    assert len(ds) == 10
    assert ds[0]["filename"] == "synthetic://0"
    assert ds[4]["label"] == 1
    np.testing.assert_array_equal(ds.labels(), [i % 3 for i in range(10)])


def test_dataset_registry(ann_file):
    ds = build_dataset(dict(type="VideoDataset", ann_file=ann_file,
                            pipeline=PIPE))
    assert isinstance(ds, VideoDataset)


def test_multiclass_and_weights(tmp_path):
    p = tmp_path / "ann_mc.txt"
    p.write_text("a.mp4 0 2\nb.mp4 1\n")
    ds = VideoDataset(str(p), PIPE, multi_class=True, num_classes=4)
    assert ds[0]["label"].tolist() == [1, 0, 1, 0]
    p2 = tmp_path / "ann_w.txt"
    p2.write_text("a 0\nb 0\nc 0\nd 1\n")
    ds2 = VideoDataset(str(p2), PIPE)
    w = ds2.class_weights()
    assert w[3] > w[0]
    np.testing.assert_allclose(w.sum() / w.sum(), 1.0)


def test_evaluate_metrics(ann_file):
    ds = VideoDataset(ann_file, PIPE)
    labels = ds.labels()
    scores = np.eye(3)[labels] + 0.01  # perfect predictions
    res = ds.evaluate(scores, metrics=("top_k_accuracy", "mean_class_accuracy"),
                      topk=(1, 2))
    assert res["top1_acc"] == 1.0 and res["top2_acc"] == 1.0
    assert res["mean_class_accuracy"] == 1.0
    with pytest.raises(ValueError):
        ds.evaluate(scores[:3])


def test_loader_batches(ann_file):
    ds = VideoDataset(ann_file, PIPE)
    loader = VideoLoader(ds, PIPE, batch_size=4, shuffle=True, seed=1,
                         num_workers=2, drop_last=True)
    batches = list(loader)
    assert len(batches) == 2 == len(loader)
    assert batches[0]["imgs"].shape == (4, 1, 4, 64, 64, 3)
    assert batches[0]["imgs"].dtype == np.uint8
    assert batches[0]["label"].shape == (4,)
    # epoch determinism
    again = list(loader)
    np.testing.assert_array_equal(batches[0]["imgs"], again[0]["imgs"])
    loader.set_epoch(1)
    shifted = list(loader)
    assert not np.array_equal(batches[0]["label"], shifted[0]["label"])


def test_loader_sharding(ann_file):
    ds = VideoDataset(ann_file, PIPE)
    l0 = VideoLoader(ds, PIPE, batch_size=2, num_shards=2, shard_index=0,
                     num_workers=1)
    l1 = VideoLoader(ds, PIPE, batch_size=2, num_shards=2, shard_index=1,
                     num_workers=1)
    lab0 = np.concatenate([b["label"] for b in l0])
    lab1 = np.concatenate([b["label"] for b in l1])
    assert len(lab0) == len(lab1) == 5


def test_device_prepare():
    prepare = make_prepare_fn(dtype=jnp.bfloat16)
    clips = np.zeros((2, 3, 4, 8, 8, 3), np.uint8)
    out = prepare(jnp.asarray(clips))
    assert out.shape == (2, 3, 3, 4, 8, 8)  # (B, V, C, T, H, W)
    assert out.dtype == jnp.bfloat16
    # uint8 0 -> (0 - mean)/std
    expected = (0 - CLIP_MEAN[0]) / CLIP_STD[0]
    assert abs(float(out[0, 0, 0, 0, 0, 0]) - expected) < 0.05


def test_jax_crops():
    x = jnp.arange(1 * 8 * 12 * 3).reshape(1, 8, 12, 3).astype(jnp.float32)
    cc = center_crop(x, (8, 8))
    assert cc.shape == (1, 8, 8, 3)
    tc = three_crop(x, (8, 8))
    assert tc.shape == (3, 1, 8, 8, 3)
    np.testing.assert_array_equal(np.asarray(tc[0]), np.asarray(x[:, :, :8]))
    np.testing.assert_array_equal(np.asarray(tc[1]), np.asarray(x[:, :, 4:12]))


def test_confusion_matrix():
    pred = [0, 1, 2, 2]
    real = [0, 1, 1, 2]
    cm = confusion_matrix(pred, real)
    np.testing.assert_array_equal(cm, [[1, 0, 0], [0, 1, 1], [0, 0, 1]])


def test_roundrobin_ratios(ann_file):
    """train_ratio interleaving (reference omnisource_runner: 2 main
    batches, then 1 from each aux source per cycle)."""
    from adapt_image_models_tpu.data.loader import RoundRobinLoader

    ds = VideoDataset(ann_file, PIPE)
    main = VideoLoader(ds, PIPE, batch_size=2, shuffle=True, seed=1,
                       num_workers=1, drop_last=True)          # 5 batches
    aux = VideoLoader(ds, PIPE, batch_size=3, shuffle=True, seed=2,
                      num_workers=1, drop_last=True)
    rr = RoundRobinLoader([main, aux], ratios=[2, 1])
    sizes = [b["imgs"].shape[0] for b in rr]
    # groups of (2 main batches, 1 aux batch); main has 5 -> last group
    # truncates after its final main batch
    assert sizes == [2, 2, 3, 2, 2, 3, 2]
    assert len(rr) == 7
    with pytest.raises(ValueError):
        RoundRobinLoader([main, aux], ratios=[2])


def test_sample_by_class_loader(tmp_path):
    """sample_by_class follows the reference semantics (base.py:49-52,
    89-100): class drawn with prob ∝ (n_c/N)^power, uniform within —
    power=0 balances classes, power=1 is uniform over samples."""
    p = tmp_path / "ann_imb.txt"
    # 8 samples of class 0, 2 of class 1
    p.write_text("\n".join(
        [f"synthetic://{i} 0" for i in range(8)]
        + [f"synthetic://{8 + i} 1" for i in range(2)]))

    def class1_share(power):
        ds = VideoDataset(str(p), PIPE, sample_by_class=True, power=power)
        loader = VideoLoader(ds, PIPE, batch_size=5, shuffle=True, seed=0,
                             num_workers=1, drop_last=True)
        draws = []
        for epoch in range(12):
            loader.set_epoch(epoch)
            draws.append(np.concatenate([b["label"] for b in loader]))
        return (np.concatenate(draws) == 1).mean(), loader

    # power=0 (reference default): classes equally likely -> share ~0.5
    frac1, loader = class1_share(0.0)
    assert 0.35 < frac1 < 0.65, frac1
    # power=1: uniform over samples -> share ~0.2 (its base rate)
    frac1_uniform, _ = class1_share(1.0)
    assert 0.08 < frac1_uniform < 0.35, frac1_uniform
    # per-sample weights: power=1 uniform, power=0 ∝ 1/n_c
    ds = VideoDataset(str(p), PIPE, sample_by_class=True)
    w1 = ds.class_weights(power=1.0)
    np.testing.assert_allclose(w1, np.full(10, 0.1), rtol=1e-12)
    w0 = ds.class_weights(power=0.0)
    np.testing.assert_allclose(w0[:8].sum(), w0[8:].sum(), rtol=1e-12)
    np.testing.assert_allclose(w0[0] * 8, w0[8] * 2, rtol=1e-12)
    # deterministic per (seed, epoch)
    loader.set_epoch(0)
    first = np.concatenate([b["label"] for b in loader])
    again = np.concatenate([b["label"] for b in loader])
    np.testing.assert_array_equal(first, again)


def test_rawframe_with_offset(tmp_path):
    """with_offset annotations: `<dir> <offset> <total> <label>` lines shift
    file indices by offset (reference rawframe_dataset.py:133-135 +
    RawFrameDecode loading.py:1157 — the ActivityNet clip recipes)."""
    import cv2
    d = tmp_path / "clips" / "v0"
    d.mkdir(parents=True)
    # frames 11..14 on disk; clip offset 10, total_frames 4, start_index 1
    for i in range(11, 15):
        img = np.full((8, 8, 3), i, np.uint8)
        cv2.imwrite(str(d / f"image_{i:05d}.jpg"), img)
    ann = tmp_path / "ann.txt"
    ann.write_text("v0 10 4 2\n")
    ds = RawframeDataset(str(ann), [
        dict(type="SampleFrames", clip_len=4, frame_interval=1, num_clips=1,
             test_mode=True),
        dict(type="Resize", scale=(8, 8), keep_ratio=False),
        dict(type="FormatShape", input_format="NCTHW"),
    ], data_prefix=str(tmp_path / "clips"), with_offset=True,
        filename_tmpl="image_{:05d}.jpg")
    assert ds.video_infos[0]["offset"] == 10
    assert ds.video_infos[0]["total_frames"] == 4
    assert ds.video_infos[0]["label"] == 2
    loader = VideoLoader(ds, ds.pipeline, batch_size=1, shuffle=False,
                         num_workers=1)
    batch = next(iter(loader))
    # sampled frame indices 1..4 + offset 10 -> pixel values 11..14
    got = sorted(int(v) for v in
                 np.unique(batch["imgs"].reshape(-1, 3).mean(-1).round()))
    assert got == [11, 12, 13, 14]
