# tsm_r50_1x1x16_50e_kinetics400_rgb (parity: reference configs/recognition/tsm/tsm_r50_1x1x16_50e_kinetics400_rgb.py)
_base_ = "./tsm_r50_1x1x8_50e_kinetics400_rgb.py"

model = dict(backbone=dict(num_frames=16),
             cls_head=dict(num_segments=16))

data = dict(
    videos_per_gpu=6,
    train=dict(pipeline=[
        dict(type="SampleFrames", clip_len=1, frame_interval=1,
             num_clips=16),
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
    val=dict(pipeline=[
        dict(type="SampleFrames", clip_len=1, frame_interval=1,
             num_clips=16, test_mode=True),
        dict(type="RawFrameDecode"),
        dict(type="Resize", scale=(-1, 256)),
        dict(type="CenterCrop", crop_size=224),
        dict(type="Normalize", mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375]),
        dict(type="FormatShape", input_format="NCHW"),
    ]),
    test=dict(pipeline=[
        dict(type="SampleFrames", clip_len=1, frame_interval=1,
             num_clips=16, test_mode=True),
        dict(type="RawFrameDecode"),
        dict(type="Resize", scale=(-1, 256)),
        dict(type="ThreeCrop", crop_size=256),
        dict(type="Normalize", mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375]),
        dict(type="FormatShape", input_format="NCHW"),
    ]),
)

optimizer = dict(type="SGD", lr=0.0075, momentum=0.9, weight_decay=0.0001)
work_dir = "./work_dirs/tsm_r50_1x1x16_50e_kinetics400_rgb"

# Reference pipeline fidelity overrides: the merged
# reference tsm_r50_1x1x16_50e_kinetics400_rgb.py pipelines (values regenerated; the
# device-stage Normalize is kept where the reference
# normalizes in the model instead)
_d = globals().get("data") or {}
data = dict(_d)
data["test"] = dict(_d.get("test") or {}, pipeline=[
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=16,
         test_mode=True),
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
# reference tsm_r50_1x1x16_50e_kinetics400_rgb.py values; generated)
_t = dict(globals().get('optimizer') or {})
optimizer = _t
del _t
