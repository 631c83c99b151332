# slowonly_omnisource_pretrained_r101_8x8x1_20e_ava_rgb (parity: reference configs/detection/ava/slowonly_omnisource_pretrained_r101_8x8x1_20e_ava_rgb.py)
_base_ = "./slowonly_kinetics_pretrained_r50_4x16x1_20e_ava_rgb.py"

model = dict(backbone=dict(depth=101, stage_blocks=(3, 4, 23, 3),
                           pretrained="checkpoints/slowonly_r101_omnisource_8x8x1.npz"))
work_dir = "./work_dirs/slowonly_omnisource_pretrained_r101_8x8x1_20e_ava_rgb"

optimizer = dict(lr=0.075)  # reference schedule

data = dict(videos_per_gpu=6)  # reference batch

# Reference pipeline fidelity overrides: the merged
# reference slowonly_omnisource_pretrained_r101_8x8x1_20e_ava_rgb.py pipelines (values regenerated; the
# device-stage Normalize is kept where the reference
# normalizes in the model instead)
_d = globals().get("data") or {}
data = dict(_d)
data["train"] = dict(_d.get("train") or {}, pipeline=[
    dict(type="SampleAVAFrames", clip_len=8, frame_interval=8),
    dict(type="RawFrameDecode"),
    dict(type="RandomRescale", scale_range=(256, 320)),
    dict(type="RandomCrop", size=256),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCTHW", collapse=True),
    dict(type="Rename", mapping=dict(imgs="img")),
    dict(type="ToDataContainer", fields=[dict(key=["proposals",
         "gt_bboxes", "gt_labels"], stack=False)]),
])
data["val"] = dict(_d.get("val") or {}, pipeline=[
    dict(type="SampleAVAFrames", clip_len=8, frame_interval=8),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCTHW", collapse=True),
    dict(type="Rename", mapping=dict(imgs="img")),
    dict(type="ToDataContainer", fields=[dict(key="proposals", stack=False)]),
])
data["test"] = dict(_d.get("test") or {}, pipeline=[
    dict(type="SampleAVAFrames", clip_len=8, frame_interval=8),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCTHW", collapse=True),
    dict(type="Rename", mapping=dict(imgs="img")),
    dict(type="ToDataContainer", fields=[dict(key="proposals", stack=False)]),
])
del _d
