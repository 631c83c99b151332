# TIN-R50 SthV1 1x1x8 (parity: reference
# configs/recognition/tin/tin_r50_1x1x8_40e_sthv1_rgb.py +
# _base_/models/tin_r50.py — TSMHead with is_shift=False semantics =
# consensus BEFORE the classifier, i.e. TSNHead-style averaging).
model = dict(
    type="Recognizer2D",
    backbone=dict(type="ResNetTIN", depth=50, num_segments=8, shift_div=4),
    cls_head=dict(type="TSNHead", num_classes=174, in_channels=2048,
                  dropout_ratio=0.8),
    test_cfg=dict(average_clips=None),
)

dataset_type = "RawframeDataset"
data_root = "data/sthv1/rawframes"
ann_file_train = "data/sthv1/sthv1_train_list_rawframes.txt"
ann_file_val = "data/sthv1/sthv1_val_list_rawframes.txt"
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_bgr=False)

train_pipeline = [
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=8),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="MultiScaleCrop", input_size=224,
         scales=(1, 0.875, 0.75, 0.66), random_crop=False,
         max_wh_scale_gap=1),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCHW"),
]
val_pipeline = [
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=8,
         test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=224),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCHW"),
]
test_pipeline = val_pipeline

data = dict(
    videos_per_gpu=6,
    workers_per_gpu=4,
    test_dataloader=dict(videos_per_gpu=1),
    train=dict(type=dataset_type, ann_file=ann_file_train,
               data_prefix=data_root, pipeline=train_pipeline),
    val=dict(type=dataset_type, ann_file=ann_file_val,
             data_prefix=data_root, pipeline=val_pipeline),
    test=dict(type=dataset_type, ann_file=ann_file_val,
              data_prefix=data_root, pipeline=test_pipeline),
)
evaluation = dict(interval=2,
                  metrics=["top_k_accuracy", "mean_class_accuracy"])

optimizer = dict(type="SGD", constructor="TSMOptimizerConstructor",
                 paramwise_cfg=dict(fc_lr5=True), lr=0.02, momentum=0.9,
                 weight_decay=5e-4)
optimizer_config = dict(grad_clip=dict(max_norm=20))
lr_config = dict(policy="CosineAnnealing", min_lr_ratio=0.5,
                 warmup="linear", warmup_by_epoch=True, warmup_iters=1,
                 warmup_ratio=0.1)
total_epochs = 40
checkpoint_config = dict(interval=2)
work_dir = "./work_dirs/tin_r50_1x1x8_40e_sthv1_rgb"

# Reference hyperparameter fidelity overrides (merged
# reference tin_r50_1x1x8_40e_sthv1_rgb.py values; generated)
_t = dict(globals().get('model') or {})
_t['cls_head'] = dict(_t.get('cls_head') or {})
model = _t
del _t
