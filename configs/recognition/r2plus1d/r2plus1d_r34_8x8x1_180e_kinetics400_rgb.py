# R(2+1)D-34 K400 8x8 (parity: reference
# configs/recognition/r2plus1d/r2plus1d_r34_8x8x1_180e_kinetics400_rgb.py +
# _base_/models/r2plus1d_r34.py).
model = dict(
    type="Recognizer3D",
    backbone=dict(type="ResNet2Plus1d", stage_blocks=(3, 4, 6, 3)),  # r34
    cls_head=dict(type="I3DHead", num_classes=400, in_channels=512,
                  dropout_ratio=0.5),
    test_cfg=dict(average_clips="prob"),
)

dataset_type = "RawframeDataset"
data_root = "data/kinetics400/rawframes_train"
data_root_val = "data/kinetics400/rawframes_val"
ann_file_train = "data/kinetics400/kinetics400_train_list_rawframes.txt"
ann_file_val = "data/kinetics400/kinetics400_val_list_rawframes.txt"
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_bgr=False)

train_pipeline = [
    dict(type="SampleFrames", clip_len=8, frame_interval=8, num_clips=1),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="RandomResizedCrop"),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCTHW"),
]
val_pipeline = [
    dict(type="SampleFrames", clip_len=8, frame_interval=8, num_clips=1,
         test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=224),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCTHW"),
]
test_pipeline = [
    dict(type="SampleFrames", clip_len=8, frame_interval=8, num_clips=10,
         test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="ThreeCrop", crop_size=256),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCTHW"),
]

data = dict(
    videos_per_gpu=8,
    workers_per_gpu=4,
    test_dataloader=dict(videos_per_gpu=1),
    train=dict(type=dataset_type, ann_file=ann_file_train,
               data_prefix=data_root, pipeline=train_pipeline),
    val=dict(type=dataset_type, ann_file=ann_file_val,
             data_prefix=data_root_val, pipeline=val_pipeline),
    test=dict(type=dataset_type, ann_file=ann_file_val,
              data_prefix=data_root_val, pipeline=test_pipeline),
)
evaluation = dict(interval=5,
                  metrics=["top_k_accuracy", "mean_class_accuracy"])

optimizer = dict(type="SGD", lr=0.1, momentum=0.9, weight_decay=1e-4)
optimizer_config = dict(grad_clip=dict(max_norm=40))
lr_config = dict(policy="CosineAnnealing", min_lr=0)
total_epochs = 180
checkpoint_config = dict(interval=5)
work_dir = "./work_dirs/r2plus1d_r34_8x8x1_180e_kinetics400_rgb"

# Reference hyperparameter fidelity overrides (merged
# reference r2plus1d_r34_8x8x1_180e_kinetics400_rgb.py values; generated)
_t = dict(globals().get('model') or {})
_t['backbone'] = dict(_t.get('backbone') or {})
_t['backbone']['depth'] = 34
model = _t
del _t
