# slowfast_kinetics_pretrained_r50_4x16x1_20e_ava_rgb (parity: reference configs/detection/ava/slowfast_kinetics_pretrained_r50_4x16x1_20e_ava_rgb.py)
_base_ = "./slowonly_kinetics_pretrained_r50_4x16x1_20e_ava_rgb.py"

model = dict(
    backbone=dict(
        _delete_=True,
        type="ResNet3dSlowFast",
        alpha=8,
        beta_inv=8,
        fusion_kernel=5),
    roi_head=dict(
        bbox_roi_extractor=dict(temporal_pool_mode="avg"),
        bbox_head=dict(in_channels=2304)))

data = dict(
    videos_per_gpu=9,
    train=dict(pipeline=[
        dict(type="SampleAVAFrames", clip_len=32, frame_interval=2),
        dict(type="RawFrameDecode"),
        dict(type="RandomRescale", scale_range=(256, 320)),
        dict(type="RandomCrop", size=256),
        dict(type="Flip", flip_ratio=0.5),
        dict(type="Normalize", mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375]),
        dict(type="FormatShape", input_format="NCTHW", collapse=True),
    ]),
    val=dict(pipeline=[
        dict(type="SampleAVAFrames", clip_len=32, frame_interval=2),
        dict(type="RawFrameDecode"),
        dict(type="Resize", scale=(-1, 256)),
        dict(type="Normalize", mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375]),
        dict(type="FormatShape", input_format="NCTHW", collapse=True),
    ]),
)
work_dir = "./work_dirs/slowfast_kinetics_pretrained_r50_4x16x1_20e_ava_rgb"

optimizer = dict(lr=0.1125)  # reference schedule

# Reference pipeline fidelity overrides: the merged
# reference slowfast_kinetics_pretrained_r50_4x16x1_20e_ava_rgb.py pipelines (values regenerated; the
# device-stage Normalize is kept where the reference
# normalizes in the model instead)
_d = globals().get("data") or {}
data = dict(_d)
data["test"] = dict(_d.get("test") or {}, pipeline=[
    dict(type="SampleAVAFrames", clip_len=32, frame_interval=2),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCTHW", collapse=True),
    dict(type="Rename", mapping=dict(imgs="img")),
    dict(type="ToDataContainer", fields=[dict(key="proposals", stack=False)]),
])
del _d
