# SlowOnly-R50 mini-Kinetics + kineticsraw auxiliary source (parity: reference
# configs/recognition/omnisource/slowonly_r50_8x8x1_256e_minikinetics/
# slowonly_r50_8x8x1_256e_minikinetics_kineticsraw_rgb.py — kinetics PAIRED
# with one extra source; image sources build 8-frame pseudo clips).
_base_ = ["./slowonly_r50_8x8x1_256e_minikinetics_omnisource_rgb.py"]

img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_bgr=False)

train_pipeline = [
    dict(type="SampleFrames", clip_len=8, frame_interval=8, num_clips=1),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="RandomResizedCrop"),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCTHW"),
]
train_aux_pipeline = [
    dict(type="SampleFrames", clip_len=8, frame_interval=8, num_clips=1),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="RandomResizedCrop"),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCTHW"),
]

data = dict(
    omni_videos_per_gpu=[12, 12],
    train_ratio=[2, 1],
    train=[
        dict(type="VideoDataset",
             ann_file="data/OmniSource/annotations/kinetics_200/k200_train.txt",
             data_prefix="data/OmniSource/kinetics_200_train",
             pipeline=train_pipeline),
        dict(type="RawVideoDataset",
             ann_file="data/OmniSource/annotations/kinetics_raw_200/slowonly_8x8_kinetics_raw_200.txt",
             data_prefix="data/OmniSource/kinetics_raw_200_train",
             pipeline=train_aux_pipeline,
             clipname_tmpl="part_{}.mp4",
             sampling_strategy="positive"),
    ],
)

work_dir = "./work_dirs/slowonly_r50_8x8x1_256e_minikinetics_kineticsraw_rgb"

# reference minikinetics slowonly schedule: lr 0.15 for 8 gpus, batch 12 each
optimizer = dict(lr=0.15)

# Reference pipeline fidelity overrides: the merged
# reference slowonly_r50_8x8x1_256e_minikinetics_kineticsraw_rgb.py pipelines (values regenerated; the
# device-stage Normalize is kept where the reference
# normalizes in the model instead)
_d = globals().get("data") or {}
data = dict(_d)
data["val"] = dict(_d.get("val") or {}, pipeline=[
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=8, frame_interval=8, num_clips=1,
         test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=256),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCTHW"),
])
del _d
