# x3d_s_13x6x1_facebook_kinetics400_rgb (parity: reference configs/recognition/x3d/x3d_s_13x6x1_facebook_kinetics400_rgb.py)
_base_ = "./x3d_m_16x5x1_facebook_kinetics400_rgb.py"

# X3D-S: same expanded trunk, 13-frame interval-6 clips at 160px
data = dict(
    train=dict(pipeline=[
        dict(type="SampleFrames", clip_len=13, frame_interval=6,
             num_clips=1),
        dict(type="DecordInit"),
        dict(type="DecordDecode"),
        dict(type="Resize", scale=(-1, 182)),
        dict(type="RandomResizedCrop"),
        dict(type="Resize", scale=(160, 160), keep_ratio=False),
        dict(type="Flip", flip_ratio=0.5),
        dict(type="Normalize", mean=[114.75, 114.75, 114.75],
             std=[57.375, 57.375, 57.375]),
        dict(type="FormatShape", input_format="NCTHW"),
    ]),
    val=dict(pipeline=[
        dict(type="SampleFrames", clip_len=13, frame_interval=6,
             num_clips=1, test_mode=True),
        dict(type="DecordInit"),
        dict(type="DecordDecode"),
        dict(type="Resize", scale=(-1, 182)),
        dict(type="CenterCrop", crop_size=160),
        dict(type="Normalize", mean=[114.75, 114.75, 114.75],
             std=[57.375, 57.375, 57.375]),
        dict(type="FormatShape", input_format="NCTHW"),
    ]),
    test=dict(pipeline=[
        dict(type="SampleFrames", clip_len=13, frame_interval=6,
             num_clips=10, test_mode=True),
        dict(type="DecordInit"),
        dict(type="DecordDecode"),
        dict(type="Resize", scale=(-1, 182)),
        dict(type="ThreeCrop", crop_size=182),
        dict(type="Normalize", mean=[114.75, 114.75, 114.75],
             std=[57.375, 57.375, 57.375]),
        dict(type="FormatShape", input_format="NCTHW"),
    ]),
)
work_dir = "./work_dirs/x3d_s_13x6x1_facebook_kinetics400_rgb"

# Reference pipeline fidelity overrides: the merged
# reference x3d_s_13x6x1_facebook_kinetics400_rgb.py pipelines (values regenerated; the
# device-stage Normalize is kept where the reference
# normalizes in the model instead)
_d = globals().get("data") or {}
data = dict(_d)
data["test"] = dict(_d.get("test") or {}, pipeline=[
    dict(type="SampleFrames", clip_len=13, frame_interval=6,
         num_clips=10, test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 192)),
    dict(type="CenterCrop", crop_size=192),
    dict(type="Normalize", mean=[114.75, 114.75, 114.75], std=[57.38,
         57.38, 57.38], to_bgr=False),
    dict(type="FormatShape", input_format="NCTHW"),
])
del _d
