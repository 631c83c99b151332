"""HVU dataset + HVULoss, flow formats/reader, dataset wrappers."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adapt_image_models_tpu.data.datasets import (
    DATASETS, build_dataset, RepeatDataset, ImageDataset, RawVideoDataset,
    VideoDataset,
)
from adapt_image_models_tpu.data.hvu_dataset import HVUDataset
from adapt_image_models_tpu.models.losses.hvu_loss import HVULoss
from adapt_image_models_tpu.data.transforms import (
    format_nchw_flow, format_nptchw,
)


@pytest.fixture(scope="module", autouse=True)
def _optimized_convs():
    """ResNet/conv execution dominates parts of this module on this host;
    optimized compiles (cached persistently) beat
    jax_disable_most_optimizations (see tests/test_models/test_cnn_backbones.py)."""
    jax.config.update("jax_disable_most_optimizations", False)
    yield
    jax.config.update("jax_disable_most_optimizations", True)


CATS = ("action", "object", "scene")
NUMS = (4, 6, 3)


def _write_hvu_json(tmp_path):
    anno = [
        dict(filename="a.mp4",
             label=dict(action=[0, 2], object=[5], scene=[1])),
        dict(filename="b.mp4", label=dict(action=[1], object=[0, 3])),
        dict(filename="c.mp4", label=dict(scene=[2])),
    ]
    p = tmp_path / "hvu.json"
    p.write_text(json.dumps(anno))
    return str(p)


def test_hvu_dataset_labels_and_masks(tmp_path):
    ds = HVUDataset(_write_hvu_json(tmp_path), tag_categories=CATS,
                    tag_category_nums=NUMS)
    assert len(ds) == 3 and ds.num_tags == 13
    info = ds[0]
    onehot, mask, cmask = (info["label_onehot"], info["mask"],
                           info["category_mask"])
    assert onehot.shape == (13,)
    assert onehot[[0, 2, 4 + 5, 10 + 1]].sum() == 4
    assert mask.sum() == 13 and cmask.sum() == 3
    # video b misses 'scene': mask zero over scene block
    b = ds[1]
    assert b["mask"][10:].sum() == 0
    assert b["category_mask"].tolist() == [1, 1, 0]


def test_hvu_dataset_evaluate(tmp_path):
    ds = HVUDataset(_write_hvu_json(tmp_path), tag_categories=CATS,
                    tag_category_nums=NUMS)
    # perfect predictions -> every per-category mAP = 1
    results = [info["label_onehot"] * 10 - 5 for info in ds.video_infos]
    out = ds.evaluate(results)
    assert out["action_mAP"] == pytest.approx(1.0)
    assert out["object_mAP"] == pytest.approx(1.0)
    assert out["scene_mAP"] == pytest.approx(1.0)
    assert out["overall_mAP"] == pytest.approx(1.0)


def test_hvu_loss_all_and_individual(tmp_path):
    ds = HVUDataset(_write_hvu_json(tmp_path), tag_categories=CATS,
                    tag_category_nums=NUMS)
    scores = jnp.asarray(np.random.default_rng(0).normal(size=(3, 13)),
                         jnp.float32)
    labels = jnp.asarray(np.stack([i["label_onehot"] for i in ds.video_infos]))
    mask = jnp.asarray(np.stack([i["mask"] for i in ds.video_infos]))
    cmask = jnp.asarray(np.stack([i["category_mask"]
                                  for i in ds.video_infos]))

    all_loss = HVULoss(categories=CATS, category_nums=NUMS, loss_type="all",
                       with_mask=True)
    out = jax.jit(lambda *a: all_loss(*a))(scores, labels, mask, cmask)
    assert np.isfinite(float(out["loss_cls"]))

    ind_loss = HVULoss(categories=CATS, category_nums=NUMS,
                       loss_type="individual", with_mask=True)
    out = jax.jit(lambda *a: ind_loss(*a))(scores, labels, mask, cmask)
    assert np.isfinite(float(out["loss_cls"]))
    for cat in CATS:
        assert f"{cat}_LOSS" in out
    # weights normalize to 1
    wsum = sum(float(out[f"{cat}_LOSS_weight"]) for cat in CATS)
    assert wsum == pytest.approx(1.0)
    # perfect logits -> near-zero loss
    perfect = (labels * 2 - 1) * 20.0
    out0 = all_loss(perfect, labels, mask, cmask)
    assert float(out0["loss_cls"]) < 1e-4


def test_format_nchw_flow_semantics():
    # 2 clips x 3 frames of (4, 4, 2) flow
    x = np.zeros((6, 4, 4, 2), np.float32)
    for t in range(6):
        x[t, :, :, 0] = t          # dx channel holds frame id
        x[t, :, :, 1] = 100 + t    # dy channel
    y = np.asarray(format_nchw_flow(jnp.asarray(x), clip_len=3))
    assert y.shape == (2, 6, 4, 4)
    # clip 0 channels: [dx0, dy0, dx1, dy1, dx2, dy2]
    np.testing.assert_allclose(y[0, 0], 0)
    np.testing.assert_allclose(y[0, 1], 100)
    np.testing.assert_allclose(y[0, 4], 2)
    np.testing.assert_allclose(y[1, 0], 3)


def test_flow_frame_reader(tmp_path):
    import cv2
    from adapt_image_models_tpu.data.video_reader import FlowFrameReader

    d = tmp_path / "flow"
    d.mkdir()
    for i in (1, 2):
        for axis, base in (("x", 10), ("y", 200)):
            img = np.full((8, 6), base + i, np.uint8)
            cv2.imwrite(str(d / f"flow_{axis}_{i:05d}.jpg"), img)
    reader = FlowFrameReader(str(d), num_frames=2)
    frames = reader.get_frames([1, 2, 1])
    assert frames.shape == (3, 8, 6, 2)
    assert abs(int(frames[0, 0, 0, 0]) - 11) <= 2  # jpeg tolerance
    assert abs(int(frames[1, 0, 0, 1]) - 202) <= 2
    np.testing.assert_array_equal(frames[0], frames[2])


def test_repeat_dataset(tmp_path):
    ann = tmp_path / "ann.txt"
    ann.write_text("synthetic://1 0\nsynthetic://2 1\n")
    ds = build_dataset(dict(type="RepeatDataset",
                            dataset=dict(type="VideoDataset",
                                         ann_file=str(ann)),
                            times=3))
    assert len(ds) == 6
    assert ds[0] == ds[2] == ds[4]
    assert isinstance(ds.dataset, VideoDataset)
    # delegation to the wrapped dataset
    assert len(ds.labels()) == 2


def test_image_dataset(tmp_path):
    ann = tmp_path / "imgs.txt"
    ann.write_text("img1.jpg 0\nimg2.jpg 2\n")
    ds = ImageDataset(str(ann), data_prefix="/pre")
    assert len(ds) == 2
    assert ds[0]["filename"] == "/pre/img1.jpg"
    assert ds[0]["total_frames"] == 1
    assert ds[1]["label"] == 2


def test_raw_video_dataset(tmp_path):
    ann = tmp_path / "raw.txt"
    ann.write_text("vid_a 66 10 0 1 2\nvid_b 3 5\n")
    ds = RawVideoDataset(str(ann), sampling_strategy="positive",
                         data_prefix="/pre")
    assert len(ds) == 2
    item = ds.sample_clip(0, rng=np.random.default_rng(0))
    assert item["label"] == 66
    clip_id = int(item["filename"].rsplit("_", 1)[1].split(".")[0])
    assert clip_id in (0, 1, 2)
    # no positives listed -> random among num_clips
    item_b = ds.sample_clip(1, rng=np.random.default_rng(0))
    clip_b = int(item_b["filename"].rsplit("_", 1)[1].split(".")[0])
    assert 0 <= clip_b < 5


def test_flow_reader_clamps_last_index(tmp_path):
    """n RGB frames give n-1 flow pairs; sampling frame n-1 must clamp to
    the last existing pair instead of raising."""
    import cv2
    import numpy as np
    from adapt_image_models_tpu.data.video_reader import FlowFrameReader
    d = tmp_path / "v"
    d.mkdir()
    n = 5
    for i in range(1, n):  # flow files 1..n-1
        for ax in ("x", "y"):
            cv2.imwrite(str(d / f"flow_{ax}_{i:05d}.jpg"),
                        np.full((8, 8), i * 10, np.uint8))
    r = FlowFrameReader(str(d), num_frames=n, start_index=1)
    out = r.get_frames([1, n - 1, n])  # n is out of range -> clamp to n-1
    assert out.shape == (3, 8, 8, 2)
    np.testing.assert_array_equal(out[1], out[2])


def test_hvu_style_multilabel_train_step():
    """The HVU recipe's model (Recognizer2D + TSNHead multi_class BCE)
    takes a train step on multi-hot targets (VERDICT round-2 item 9)."""
    import jax
    import jax.numpy as jnp
    from adapt_image_models_tpu.models import build_model
    from adapt_image_models_tpu.parallel.partition import partition_params
    from adapt_image_models_tpu.core.optim import build_optimizer
    from adapt_image_models_tpu.core.train_state import (
        create_train_state, make_train_step,
    )
    model = build_model(dict(
        type="Recognizer2D",
        backbone=dict(type="ResNet", depth=18, stage_blocks=(1, 1, 1, 1)),
        cls_head=dict(type="TSNHead", in_channels=512, num_classes=7,
                      multi_class=True,
                      loss_cls=dict(type="BCELossWithLogits",
                                    loss_weight=3.0))))
    x = jnp.zeros((2, 4, 3, 32, 32))  # (B, segs, C, H, W)
    variables = model.init(jax.random.PRNGKey(0), x)
    trainable, _ = partition_params(variables["params"])
    tx = build_optimizer(dict(type="SGD", lr=0.01), trainable, schedule=0.01)
    state = create_train_state(variables["params"], tx,
                               model_state={k: v for k, v in
                                            variables.items()
                                            if k != "params"})
    step = jax.jit(make_train_step(model, tx))
    labels = jnp.zeros((2, 7)).at[0, 2].set(1).at[1, 5].set(1).at[1, 6].set(1)
    s2, metrics = step(state, dict(imgs=x, label=labels),
                       jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(s2.step) == 1


def test_make_prepare_fn_segment_layouts():
    """NCHW folds crops x clips x frames into consensus segments; NCHW_Flow
    stacks each clip's L flow frames frame-major into 2L channels (matches
    format_nchw_flow, reference formating.py:268-278)."""
    import jax.numpy as jnp
    from adapt_image_models_tpu.data.transforms import (
        format_nchw_flow, layout_from_pipeline, make_prepare_fn, normalize,
    )
    rng = np.random.default_rng(0)
    # NCHW: (B=2, V=3 clips, T=2, H, W, C=3) -> (2, 6, 3, H, W)
    raw = rng.integers(0, 255, (2, 3, 2, 4, 4, 3), dtype=np.uint8)
    prep = make_prepare_fn((0, 0, 0), (1, 1, 1), layout="NCHW")
    out = np.asarray(prep(jnp.asarray(raw)))
    assert out.shape == (2, 6, 3, 4, 4)
    # segment 1 of clip 0 == raw frame [b, 0, 1] (CHW)
    np.testing.assert_allclose(out[1, 1], raw[1, 0, 1].transpose(2, 0, 1))

    # NCHW_Flow: (B=1, V=2 clips, L=3, H, W, C=2) -> (1, 2, 6, H, W)
    flow = rng.integers(0, 255, (1, 2, 3, 4, 4, 2), dtype=np.uint8)
    prep_f = make_prepare_fn((0, 0), (1, 1), layout="NCHW_Flow")
    got = np.asarray(prep_f(jnp.asarray(flow)))
    assert got.shape == (1, 2, 6, 4, 4)
    want = np.asarray(format_nchw_flow(
        normalize(jnp.asarray(flow.reshape(1, 6, 4, 4, 2)), (0, 0), (1, 1)),
        clip_len=3))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # layout detection
    assert layout_from_pipeline(
        [dict(type="FormatShape", input_format="NCHW")]) == "NCHW"
    assert layout_from_pipeline([dict(type="Resize")]) == "NCTHW"
    with pytest.raises(ValueError, match="layout"):
        make_prepare_fn(layout="NPTCHW")


def test_init_sample_shape_matches_prepared_batches():
    from adapt_image_models_tpu.data.pipeline import build_sample_processor
    from adapt_image_models_tpu.data.transforms import (
        init_sample_shape, make_prepare_fn, layout_from_pipeline,
    )
    import jax.numpy as jnp
    pipe = [
        dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=4),
        dict(type="Resize", scale=(16, 16), keep_ratio=False),
        dict(type="Normalize"),
        dict(type="FormatShape", input_format="NCHW"),
    ]
    proc = build_sample_processor(pipe)
    clips, _ = proc("synthetic://0", 0, np.random.default_rng(0))
    prep = make_prepare_fn(layout=layout_from_pipeline(pipe))
    batch = prep(jnp.asarray(clips[None]))
    assert tuple(batch.shape) == init_sample_shape(pipe, proc)
