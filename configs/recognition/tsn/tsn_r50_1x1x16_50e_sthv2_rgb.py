# tsn_r50_1x1x16_50e_sthv2_rgb (parity: reference configs/recognition/tsn/tsn_r50_1x1x16_50e_sthv2_rgb.py)
_base_ = "./tsn_r50_1x1x3_100e_kinetics400_rgb.py"

model = dict(cls_head=dict(num_classes=174, dropout_ratio=0.5))

img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_bgr=False)

train_pipeline = [
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=16),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="MultiScaleCrop", input_size=224, scales=(1, 0.875, 0.75,
         0.66), random_crop=False, max_wh_scale_gap=1),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCHW"),
]
val_pipeline = [
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=16, test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=224),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCHW"),
]
test_pipeline = [
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=16, test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="TenCrop", crop_size=224),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCHW"),
]

data = dict(
    videos_per_gpu=4,
    train=dict(type="RawframeDataset", ann_file="data/sthv2/sthv2_train_list.txt",
               data_prefix="data/sthv2/rawframes/train", pipeline=train_pipeline, filename_tmpl="{:05}.jpg"),
    val=dict(type="RawframeDataset", ann_file="data/sthv2/sthv2_val_list.txt",
             data_prefix="data/sthv2/rawframes/val", pipeline=val_pipeline, filename_tmpl="{:05}.jpg"),
    test=dict(type="RawframeDataset", ann_file="data/sthv2/sthv2_val_list.txt",
              data_prefix="data/sthv2/rawframes/val", pipeline=test_pipeline, filename_tmpl="{:05}.jpg"),
)

optimizer = dict(type="SGD", lr=0.005, momentum=0.9, weight_decay=0.0005)
lr_config = dict(policy="step", step=[20, 40])
total_epochs = 50
work_dir = "./work_dirs/tsn_r50_1x1x16_50e_sthv2_rgb"

# Reference hyperparameter fidelity overrides (merged
# reference tsn_r50_1x1x16_50e_sthv2_rgb.py values; generated)
_t = dict(globals().get('optimizer') or {})
optimizer = _t
_t = dict(globals().get('optimizer_config') or {})
_t['grad_clip'] = dict(_t.get('grad_clip') or {})
_t['grad_clip']['max_norm'] = 20
optimizer_config = _t
del _t
