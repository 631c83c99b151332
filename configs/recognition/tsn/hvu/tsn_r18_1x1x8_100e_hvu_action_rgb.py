# TSN-R18 on HVU, action category (parity: reference
# configs/recognition/tsn/hvu/tsn_r18_1x1x8_100e_hvu_action_rgb.py —
# per-category multi-label BCE; swap `target_cate`/num_classes for the
# other five categories like the reference's sibling configs).
category_nums = dict(
    action=739, attribute=117, concept=291, event=69, object=1678, scene=248)
target_cate = "action"

model = dict(
    type="Recognizer2D",
    backbone=dict(type="ResNet", depth=18),
    cls_head=dict(
        type="TSNHead",
        in_channels=512,
        num_classes=category_nums[target_cate],
        multi_class=True,
        loss_cls=dict(type="BCELossWithLogits", loss_weight=333.0),
    ),
    test_cfg=dict(average_clips="prob"),
)

dataset_type = "VideoDataset"
data_root = "data/hvu/videos_train"
data_root_val = "data/hvu/videos_val"
ann_file_train = f"data/hvu/hvu_{target_cate}_train.json"
ann_file_val = f"data/hvu/hvu_{target_cate}_val.json"
img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375],
    to_bgr=False)

train_pipeline = [
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=8),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="RandomResizedCrop"),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCHW"),
]
val_pipeline = [
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=8,
         test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=256),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCHW"),
]
test_pipeline = [
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=25,
         test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="ThreeCrop", crop_size=256),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCHW"),
]

data = dict(
    videos_per_gpu=32,
    workers_per_gpu=4,
    test_dataloader=dict(videos_per_gpu=1),
    train=dict(type=dataset_type, ann_file=ann_file_train,
               data_prefix=data_root, multi_class=True,
               num_classes=category_nums[target_cate],
               pipeline=train_pipeline),
    val=dict(type=dataset_type, ann_file=ann_file_val,
             data_prefix=data_root_val, multi_class=True,
             num_classes=category_nums[target_cate],
             pipeline=val_pipeline),
    test=dict(type=dataset_type, ann_file=ann_file_val,
              data_prefix=data_root_val, multi_class=True,
              num_classes=category_nums[target_cate],
              pipeline=test_pipeline),
)
evaluation = dict(interval=2, metrics=["mean_average_precision"])

optimizer = dict(type="SGD", lr=0.01, momentum=0.9, weight_decay=1e-4)
optimizer_config = dict(grad_clip=dict(max_norm=40))
lr_config = dict(policy="step", step=[40, 80])
total_epochs = 100
checkpoint_config = dict(interval=5)
work_dir = "./work_dirs/tsn_r18_hvu_action"

# Reference hyperparameter fidelity overrides (merged
# reference tsn_r18_1x1x8_100e_hvu_action_rgb.py values; generated)
_t = dict(globals().get('model') or {})
_t['cls_head'] = dict(_t.get('cls_head') or {})
_t['cls_head']['dropout_ratio'] = 0.4
model = _t
del _t
