# r2plus1d_r34_32x2x1_180e_kinetics400_rgb (parity: reference configs/recognition/r2plus1d/r2plus1d_r34_32x2x1_180e_kinetics400_rgb.py)
_base_ = "./r2plus1d_r34_8x8x1_180e_kinetics400_rgb.py"

data = dict(
    videos_per_gpu=6,
    train=dict(pipeline=[
        dict(type="SampleFrames", clip_len=32, frame_interval=2,
             num_clips=1),
        dict(type="RawFrameDecode"),
        dict(type="Resize", scale=(-1, 256)),
        dict(type="RandomResizedCrop"),
        dict(type="Resize", scale=(224, 224), keep_ratio=False),
        dict(type="Flip", flip_ratio=0.5),
        dict(type="Normalize", mean=[110.2008, 100.63983, 95.99475],
             std=[58.14765, 56.46975, 55.332195]),
        dict(type="FormatShape", input_format="NCTHW"),
    ]),
    val=dict(pipeline=[
        dict(type="SampleFrames", clip_len=32, frame_interval=2,
             num_clips=1, test_mode=True),
        dict(type="RawFrameDecode"),
        dict(type="Resize", scale=(-1, 256)),
        dict(type="CenterCrop", crop_size=224),
        dict(type="Normalize", mean=[110.2008, 100.63983, 95.99475],
             std=[58.14765, 56.46975, 55.332195]),
        dict(type="FormatShape", input_format="NCTHW"),
    ]),
    test=dict(pipeline=[
        dict(type="SampleFrames", clip_len=32, frame_interval=2,
             num_clips=10, test_mode=True),
        dict(type="RawFrameDecode"),
        dict(type="Resize", scale=(-1, 256)),
        dict(type="ThreeCrop", crop_size=256),
        dict(type="Normalize", mean=[110.2008, 100.63983, 95.99475],
             std=[58.14765, 56.46975, 55.332195]),
        dict(type="FormatShape", input_format="NCTHW"),
    ]),
)
work_dir = "./work_dirs/r2plus1d_r34_32x2x1_180e_kinetics400_rgb"

optimizer = dict(lr=0.075)  # reference schedule

# Reference pipeline fidelity overrides: the merged
# reference r2plus1d_r34_32x2x1_180e_kinetics400_rgb.py pipelines (values regenerated; the
# device-stage Normalize is kept where the reference
# normalizes in the model instead)
_d = globals().get("data") or {}
data = dict(_d)
data["train"] = dict(_d.get("train") or {}, pipeline=[
    dict(type="SampleFrames", clip_len=32, frame_interval=2, num_clips=1),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="RandomResizedCrop"),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCTHW"),
])
data["val"] = dict(_d.get("val") or {}, pipeline=[
    dict(type="SampleFrames", clip_len=32, frame_interval=2, num_clips=1,
         test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=224),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCTHW"),
])
data["test"] = dict(_d.get("test") or {}, pipeline=[
    dict(type="SampleFrames", clip_len=32, frame_interval=2,
         num_clips=10, test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="ThreeCrop", crop_size=256),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCTHW"),
])
del _d

# Reference hyperparameter fidelity overrides (merged
# reference r2plus1d_r34_32x2x1_180e_kinetics400_rgb.py values; generated)
_t = dict(globals().get('model') or {})
_t['backbone'] = dict(_t.get('backbone') or {})
_t['backbone']['depth'] = 34
model = _t
del _t
