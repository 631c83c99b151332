# slowonly_r50_8x8x1_256e_kinetics400_flow (parity: reference configs/recognition/slowonly/slowonly_r50_8x8x1_256e_kinetics400_flow.py)
_base_ = "./slowonly_r50_4x16x1_256e_kinetics400_flow.py"

data = dict(
    videos_per_gpu=12,
    train=dict(pipeline=[
        dict(type="SampleFrames", clip_len=8, frame_interval=8, num_clips=1),
        dict(type="RawFrameDecode"),
        dict(type="Resize", scale=(-1, 256)),
        dict(type="RandomResizedCrop"),
        dict(type="Resize", scale=(224, 224), keep_ratio=False),
        dict(type="Flip", flip_ratio=0.5),
        dict(type="Normalize", mean=[128, 128], std=[128, 128]),
        dict(type="FormatShape", input_format="NCTHW"),
    ]),
    val=dict(pipeline=[
        dict(type="SampleFrames", clip_len=8, frame_interval=8, num_clips=1,
             test_mode=True),
        dict(type="RawFrameDecode"),
        dict(type="Resize", scale=(-1, 256)),
        dict(type="CenterCrop", crop_size=224),
        dict(type="Normalize", mean=[128, 128], std=[128, 128]),
        dict(type="FormatShape", input_format="NCTHW"),
    ]),
    test=dict(pipeline=[
        dict(type="SampleFrames", clip_len=8, frame_interval=8,
             num_clips=10, test_mode=True),
        dict(type="RawFrameDecode"),
        dict(type="Resize", scale=(-1, 256)),
        dict(type="ThreeCrop", crop_size=256),
        dict(type="Normalize", mean=[128, 128], std=[128, 128]),
        dict(type="FormatShape", input_format="NCTHW"),
    ]),
)
work_dir = "./work_dirs/slowonly_r50_8x8x1_256e_kinetics400_flow"

total_epochs = 196  # reference schedule

# Reference pipeline fidelity overrides: the merged
# reference slowonly_r50_8x8x1_256e_kinetics400_flow.py pipelines (values regenerated; the
# device-stage Normalize is kept where the reference
# normalizes in the model instead)
_d = globals().get("data") or {}
data = dict(_d)
data["val"] = dict(_d.get("val") or {}, pipeline=[
    dict(type="SampleFrames", clip_len=8, frame_interval=8, num_clips=1,
         test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=256),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[128, 128], std=[128, 128]),
    dict(type="FormatShape", input_format="NCTHW"),
])
del _d
