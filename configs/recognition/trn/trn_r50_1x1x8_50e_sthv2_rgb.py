# TRN-R50 SthV1 1x1x8 (parity: reference
# configs/recognition/trn/trn_r50_1x1x8_50e_sthv2_rgb.py +
# _base_/models/trn_r50.py: 2D ResNet backbone, TRNMultiScale relation
# head, hidden 256; sthv2 label-aware flips).
model = dict(
    type="Recognizer2D",
    backbone=dict(type="ResNet", depth=50),
    cls_head=dict(type="TRNHead", num_classes=174, in_channels=2048,
                  num_segments=8, relation_type="TRNMultiScale",
                  hidden_dim=256, dropout_ratio=0.8, init_std=0.001),
    test_cfg=dict(average_clips="prob"),
)

dataset_type = "RawframeDataset"
data_root = "data/sthv2/rawframes"
data_root_val = "data/sthv2/rawframes"
ann_file_train = "data/sthv2/sthv2_train_list_rawframes.txt"
ann_file_val = "data/sthv2/sthv2_val_list_rawframes.txt"
# reference: directional classes swap on horizontal flip
sthv2_flip_label_map = {86: 87, 87: 86, 93: 94, 94: 93, 166: 167, 167: 166}
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_bgr=False)

train_pipeline = [
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=8),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="MultiScaleCrop", input_size=224,
         scales=(1, 0.875, 0.75, 0.66), random_crop=False,
         max_wh_scale_gap=1, num_fixed_crops=13),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5, flip_label_map=sthv2_flip_label_map),
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
test_pipeline = [
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=8,
         twice_sample=True, test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="ThreeCrop", crop_size=256),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCHW"),
]

data = dict(
    videos_per_gpu=16,
    workers_per_gpu=4,
    train=dict(type=dataset_type, ann_file=ann_file_train,
               data_prefix=data_root, pipeline=train_pipeline),
    val=dict(type=dataset_type, ann_file=ann_file_val,
             data_prefix=data_root_val, pipeline=val_pipeline),
    test=dict(type=dataset_type, ann_file=ann_file_val,
              data_prefix=data_root_val, pipeline=test_pipeline),
)
evaluation = dict(interval=5,
                  metrics=["top_k_accuracy", "mean_class_accuracy"])

optimizer = dict(type="SGD", lr=0.002, momentum=0.9, weight_decay=5e-4)
optimizer_config = dict(grad_clip=dict(max_norm=20))
lr_config = dict(policy="step", step=[30, 45])
total_epochs = 50
checkpoint_config = dict(interval=1)
work_dir = "./work_dirs/trn_r50_1x1x8_50e_sthv2_rgb"

# Reference hyperparameter fidelity overrides (merged
# reference trn_r50_1x1x8_50e_sthv2_rgb.py values; generated)
_t = dict(globals().get('lr_config') or {})
lr_config = _t
del _t
