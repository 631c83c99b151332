# tsm_r50_dense_1x1x8_100e_kinetics400_rgb (parity: reference configs/recognition/tsm/tsm_r50_dense_1x1x8_100e_kinetics400_rgb.py)
_base_ = "./tsm_r50_1x1x8_50e_kinetics400_rgb.py"

data = dict(
    train=dict(pipeline=[
        dict(type="DenseSampleFrames", clip_len=1, frame_interval=1,
             num_clips=8),
        dict(type="RawFrameDecode"),
        dict(type="Resize", scale=(-1, 256)),
        dict(type="MultiScaleCrop", input_size=224,
             scales=(1, 0.875, 0.75, 0.66), random_crop=False,
             max_wh_scale_gap=1, num_fixed_crops=13),
        dict(type="Resize", scale=(224, 224), keep_ratio=False),
        dict(type="Flip", flip_ratio=0.5),
        dict(type="Normalize", mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375]),
        dict(type="FormatShape", input_format="NCHW"),
    ]),
)
total_epochs = 100
work_dir = "./work_dirs/tsm_r50_dense_1x1x8_100e_kinetics400_rgb"

optimizer = dict(lr=0.02)  # reference schedule

# Reference pipeline fidelity overrides: the merged
# reference tsm_r50_dense_1x1x8_100e_kinetics400_rgb.py pipelines (values regenerated; the
# device-stage Normalize is kept where the reference
# normalizes in the model instead)
_d = globals().get("data") or {}
data = dict(_d)
data["val"] = dict(_d.get("val") or {}, pipeline=[
    dict(type="DenseSampleFrames", clip_len=1, frame_interval=1,
         num_clips=8, test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=224),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCHW"),
])
data["test"] = dict(_d.get("test") or {}, pipeline=[
    dict(type="DenseSampleFrames", clip_len=1, frame_interval=1,
         num_clips=8, test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=224),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCHW"),
])
del _d

# Reference hyperparameter fidelity overrides (merged
# reference tsm_r50_dense_1x1x8_100e_kinetics400_rgb.py values; generated)
_t = dict(globals().get('lr_config') or {})
_t['step'] = [40, 80]
lr_config = _t
del _t
