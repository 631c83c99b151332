# i3d_r50_dense_32x2x1_100e_kinetics400_rgb (parity: reference configs/recognition/i3d/i3d_r50_dense_32x2x1_100e_kinetics400_rgb.py)
_base_ = "./i3d_r50_32x2x1_100e_kinetics400_rgb.py"

data = dict(
    train=dict(pipeline=[
        dict(type="DenseSampleFrames", clip_len=32, frame_interval=2,
             num_clips=1),
        dict(type="RawFrameDecode"),
        dict(type="Resize", scale=(-1, 256)),
        dict(type="MultiScaleCrop", input_size=224, scales=(1, 0.8),
             random_crop=False, max_wh_scale_gap=0),
        dict(type="Resize", scale=(224, 224), keep_ratio=False),
        dict(type="Flip", flip_ratio=0.5),
        dict(type="Normalize", mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375]),
        dict(type="FormatShape", input_format="NCTHW"),
    ]),
)
work_dir = "./work_dirs/i3d_r50_dense_32x2x1_100e_kinetics400_rgb"

# Reference pipeline fidelity overrides: the merged
# reference i3d_r50_dense_32x2x1_100e_kinetics400_rgb.py pipelines (values regenerated; the
# device-stage Normalize is kept where the reference
# normalizes in the model instead)
_d = globals().get("data") or {}
data = dict(_d)
data["val"] = dict(_d.get("val") or {}, pipeline=[
    dict(type="DenseSampleFrames", clip_len=32, frame_interval=2,
         num_clips=1, test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=224),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCTHW"),
])
data["test"] = dict(_d.get("test") or {}, pipeline=[
    dict(type="DenseSampleFrames", clip_len=32, frame_interval=2,
         num_clips=1, test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="ThreeCrop", crop_size=256),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCTHW"),
])
del _d
