# SSN-R50 THUMOS14 (parity: reference
# configs/localization/ssn/ssn_r50_450e_thumos14_rgb_train.py — STPP
# (1,1,1) over (2,5,2) segments, SSNLoss with comp/reg weights 0.1).
train_cfg = dict(ssn=dict(
    assigner=dict(positive_iou_threshold=0.7,
                  background_iou_threshold=0.01,
                  incomplete_iou_threshold=0.3,
                  background_coverage_threshold=0.02,
                  incomplete_overlap_threshold=0.01),
    sampler=dict(num_per_video=8, positive_ratio=1, background_ratio=1,
                 incomplete_ratio=6, add_gt_as_proposals=True),
    loss_weight=dict(comp_loss_weight=0.1, reg_loss_weight=0.1)))
test_cfg = dict(ssn=dict(
    sampler=dict(test_interval=6, batch_size=16),
    evaluater=dict(top_k=2000, nms=0.2, softmax_before_filter=True,
                   cls_top_k=2)))

model = dict(
    type="SSN",
    backbone=dict(type="ResNet", depth=50),
    spatial_type="avg",
    dropout_ratio=0.8,
    loss_cls=dict(type="SSNLoss"),
    cls_head=dict(
        type="SSNHead",
        dropout_ratio=0.0,
        in_channels=2048,
        num_classes=20,
        stpp_cfg=(1, 1, 1),
        num_segments_list=(2, 5, 2),
        use_regression=True),
    train_cfg=train_cfg,
    test_cfg=test_cfg,
)

dataset_type = "SSNDataset"
data_root = "data/thumos14/rawframes"
ann_file_train = "data/thumos14/thumos14_tag_val_proposal_list.txt"
ann_file_test = "data/thumos14/thumos14_tag_test_proposal_list.txt"
img_norm_cfg = dict(mean=[104, 117, 128], std=[1, 1, 1], to_bgr=True)

train_pipeline = [
    dict(type="SampleProposalFrames", clip_len=1, body_segments=5,
         aug_segments=(2, 2), aug_ratio=0.5),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(340, 256), keep_ratio=True),
    dict(type="CenterCrop", crop_size=224),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[104, 117, 128], std=[1, 1, 1], to_bgr=True),
    dict(type="FormatShape", input_format="NPTCHW"),
]
test_pipeline = [
    dict(type="SampleProposalFrames", clip_len=1, body_segments=5,
         aug_segments=(2, 2), aug_ratio=0.5, mode="test"),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(340, 256), keep_ratio=False),
    dict(type="CenterCrop", crop_size=224),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCHW"),
]

data = dict(
    videos_per_gpu=1,
    workers_per_gpu=2,
    train=dict(type=dataset_type, ann_file=ann_file_train,
               data_prefix=data_root, pipeline=train_pipeline,
               body_segments=5, aug_segments=(2, 2), aug_ratio=0.5),
    val=dict(type=dataset_type, ann_file=ann_file_train,
             data_prefix=data_root, pipeline=test_pipeline, test_mode=True,
             body_segments=5, aug_segments=(2, 2), aug_ratio=0.5),
    test=dict(type=dataset_type, ann_file=ann_file_test,
              data_prefix=data_root, pipeline=test_pipeline, test_mode=True,
              body_segments=5, aug_segments=(2, 2), aug_ratio=0.5),
)
evaluation = dict(interval=5, metrics=["mAP"])

optimizer = dict(type="SGD", lr=0.001, momentum=0.9, weight_decay=1e-6)
optimizer_config = dict(grad_clip=dict(max_norm=35))
lr_config = dict(policy="step", step=[200, 400])
total_epochs = 450
checkpoint_config = dict(interval=5)
work_dir = "./work_dirs/ssn_r50_450e_thumos14_rgb"

# Reference pipeline fidelity overrides: the merged
# reference ssn_r50_450e_thumos14_rgb_train.py pipelines (values regenerated; the
# device-stage Normalize is kept where the reference
# normalizes in the model instead)
_d = globals().get("data") or {}
data = dict(_d)
data["val"] = dict(_d.get("val") or {}, pipeline=[
    dict(type="SampleProposalFrames", clip_len=1, body_segments=5,
         aug_segments=(2, 2), aug_ratio=0.5),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(340, 256), keep_ratio=True),
    dict(type="CenterCrop", crop_size=224),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Normalize", mean=[104, 117, 128], std=[1, 1, 1], to_bgr=True),
    dict(type="FormatShape", input_format="NPTCHW"),
])
del _d

# Reference hyperparameter fidelity overrides (merged
# reference ssn_r50_450e_thumos14_rgb_train.py values; generated)
_t = dict(globals().get('optimizer_config') or {})
_t['grad_clip'] = dict(_t.get('grad_clip') or {})
optimizer_config = _t
del _t
