"""AVA spatio-temporal detection: SlowOnly-R50 4x16 FastRCNN
(reference configs/detection/ava/slowonly_kinetics_pretrained_r50_4x16x1_20e_ava_rgb.py).

TPU notes: proposal assignment/sampling happens host-side inside AVADataset
(assigner/sampler cfg below); val frames are padded onto a static 256x456
canvas (XLA static shapes) instead of ragged short-side-only resize.
"""

model = dict(
    type="FastRCNN",
    backbone=dict(
        type="ResNet3dSlowOnly",
        depth=50,
        stage_blocks=(3, 4, 6, 3),
        inflate=(0, 0, 1, 1),
        spatial_strides=(1, 2, 2, 1)),
    roi_head=dict(
        type="AVARoIHead",
        bbox_roi_extractor=dict(
            type="SingleRoIExtractor3D",
            roi_layer_type="RoIAlign",
            featmap_stride=16,
            output_size=8,
            with_temporal_pool=True),
        bbox_head=dict(
            type="BBoxHeadAVA",
            in_channels=2048,
            num_classes=81,
            multilabel=True,
            dropout_ratio=0.5)),
    train_cfg=dict(rcnn=dict(pos_weight=1.0)),
    test_cfg=dict(rcnn=dict(action_thr=0.002)))

dataset_type = "AVADataset"
data_root = "data/ava/rawframes"
anno_root = "data/ava/annotations"

ann_file_train = f"{anno_root}/ava_train_v2.1.csv"
ann_file_val = f"{anno_root}/ava_val_v2.1.csv"
exclude_file_train = f"{anno_root}/ava_train_excluded_timestamps_v2.1.csv"
exclude_file_val = f"{anno_root}/ava_val_excluded_timestamps_v2.1.csv"
label_file = f"{anno_root}/ava_action_list_v2.1_for_activitynet_2018.pbtxt"
proposal_file_train = (f"{anno_root}/ava_dense_proposals_train.FAIR."
                       "recall_93.9.pkl")
proposal_file_val = f"{anno_root}/ava_dense_proposals_val.FAIR.recall_93.9.pkl"

img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_bgr=False)

train_pipeline = [
    dict(type="SampleAVAFrames", clip_len=4, frame_interval=16),
    dict(type="RawFrameDecode"),
    dict(type="RandomRescale", scale_range=(256, 320)),
    dict(type="RandomCrop", size=256),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCTHW", collapse=True),
]
val_pipeline = [
    dict(type="SampleAVAFrames", clip_len=4, frame_interval=16),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCTHW", collapse=True),
]

rcnn_train = dict(
    assigner=dict(type="MaxIoUAssignerAVA", pos_iou_thr=0.9,
                  neg_iou_thr=0.9, min_pos_iou=0.9),
    sampler=dict(type="RandomSampler", num=32, pos_fraction=1,
                 neg_pos_ub=-1, add_gt_as_proposals=True),
    pos_weight=1.0)

data = dict(
    videos_per_gpu=16,
    workers_per_gpu=4,
    val_dataloader=dict(videos_per_gpu=1),
    test_dataloader=dict(videos_per_gpu=1),
    train=dict(
        type=dataset_type,
        ann_file=ann_file_train,
        exclude_file=exclude_file_train,
        label_file=label_file,
        proposal_file=proposal_file_train,
        data_prefix=data_root,
        pipeline=train_pipeline,
        num_rois=32,
        assigner=rcnn_train["assigner"],
        sampler=rcnn_train["sampler"],
        pos_weight=rcnn_train["pos_weight"],
        person_det_score_thr=0.9),
    val=dict(
        type=dataset_type,
        ann_file=ann_file_val,
        exclude_file=exclude_file_val,
        label_file=label_file,
        proposal_file=proposal_file_val,
        data_prefix=data_root,
        pipeline=val_pipeline,
        test_mode=True,
        num_rois=32,
        test_pad_to=(256, 456),
        person_det_score_thr=0.9))
data["test"] = data["val"]

optimizer = dict(type="SGD", lr=0.2, momentum=0.9, weight_decay=1e-5)
optimizer_config = dict(grad_clip=dict(max_norm=40))
lr_config = dict(policy="step", step=[10, 15], warmup="linear",
                 warmup_by_epoch=True, warmup_iters=5, warmup_ratio=0.1)
total_epochs = 20
checkpoint_config = dict(interval=1)
log_config = dict(interval=20)
evaluation = dict(interval=1, save_best="mAP@0.5IOU")
work_dir = "./work_dirs/ava/slowonly_r50_4x16"
