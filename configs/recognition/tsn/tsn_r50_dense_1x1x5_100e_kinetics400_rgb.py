# tsn_r50_dense_1x1x5_100e_kinetics400_rgb (parity: reference configs/recognition/tsn/tsn_r50_dense_1x1x5_100e_kinetics400_rgb.py)
_base_ = "./tsn_r50_1x1x3_100e_kinetics400_rgb.py"

img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_bgr=False)

train_pipeline = [
    dict(type="DenseSampleFrames", clip_len=1, frame_interval=1, num_clips=5),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="MultiScaleCrop", input_size=224,
         scales=(1, 0.875, 0.75, 0.66), random_crop=False,
         max_wh_scale_gap=1, num_fixed_crops=13),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCHW"),
]
val_pipeline = [
    dict(type="DenseSampleFrames", clip_len=1, frame_interval=1, num_clips=8, test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=224),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCHW"),
]
test_pipeline = [
    dict(type="DenseSampleFrames", clip_len=1, frame_interval=1,
         num_clips=8, test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=224),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCHW"),
]

data = dict(
    videos_per_gpu=16,
    train=dict(pipeline=train_pipeline),
    val=dict(pipeline=val_pipeline),
    test=dict(pipeline=test_pipeline),
)

optimizer = dict(type="SGD", lr=0.03, momentum=0.9,
                 weight_decay=1e-4)
total_epochs = 100
work_dir = "./work_dirs/tsn_r50_dense_1x1x5_100e_kinetics400_rgb"

# Reference hyperparameter fidelity overrides (merged
# reference tsn_r50_dense_1x1x5_100e_kinetics400_rgb.py values; generated)
_t = dict(globals().get('optimizer_config') or {})
_t['grad_clip'] = dict(_t.get('grad_clip') or {})
_t['grad_clip']['max_norm'] = 20
optimizer_config = _t
del _t

# Reference hyperparameter fidelity overrides (merged
# reference tsn_r50_dense_1x1x5_100e_kinetics400_rgb.py values; generated)
_t = dict(globals().get('model') or {})
_t['cls_head'] = dict(_t.get('cls_head') or {})
_t['cls_head']['dropout_ratio'] = 0.5
model = _t
del _t
