# slowonly omnisource: 4-source round-robin training (parity: reference
# slowonly_r50_8x8x1_256e_minikinetics_omnisource_rgb.py)
_base_ = "./slowonly_r50_8x8x1_256e_minikinetics_rgb.py"

data = dict(
    train=[
        dict(type="VideoDataset",
             ann_file="data/omnisource/minikinetics_train_list.txt",
             data_prefix="data/omnisource/minikinetics_train",
             pipeline=[
                 dict(type="SampleFrames", clip_len=8, frame_interval=8,
                      num_clips=1),
                 dict(type="DecordInit"),
                 dict(type="DecordDecode"),
                 dict(type="Resize", scale=(-1, 256)),
                 dict(type="RandomResizedCrop"),
                 dict(type="Resize", scale=(224, 224), keep_ratio=False),
                 dict(type="Flip", flip_ratio=0.5),
                 dict(type="Normalize", mean=[123.675, 116.28, 103.53],
                      std=[58.395, 57.12, 57.375]),
                 dict(type="FormatShape", input_format="NCTHW"),
             ]),
        dict(type="ImageDataset",
             ann_file="data/omnisource/googleimage_list.txt",
             data_prefix="data/omnisource/googleimage",
             sample_by_class=True, power=0.5,
             pipeline=[
                 dict(type="SampleFrames", clip_len=1, frame_interval=1,
                      num_clips=1),
                 dict(type="ImageDecode"),
                 dict(type="BuildPseudoClip", clip_len=8),
                 dict(type="Resize", scale=(-1, 256)),
                 dict(type="RandomResizedCrop"),
                 dict(type="Resize", scale=(224, 224), keep_ratio=False),
                 dict(type="Flip", flip_ratio=0.5),
                 dict(type="Normalize", mean=[123.675, 116.28, 103.53],
                      std=[58.395, 57.12, 57.375]),
                 dict(type="FormatShape", input_format="NCTHW"),
             ]),
        dict(type="RawVideoDataset",
             ann_file="data/omnisource/kraw_train_list.txt",
             data_prefix="data/omnisource/kinetics_raw",
             clipname_tmpl="part_{}.mp4", sampling_strategy="positive",
             pipeline=[
                 dict(type="SampleFrames", clip_len=8, frame_interval=8,
                      num_clips=1),
                 dict(type="DecordInit"),
                 dict(type="DecordDecode"),
                 dict(type="Resize", scale=(-1, 256)),
                 dict(type="RandomResizedCrop"),
                 dict(type="Resize", scale=(224, 224), keep_ratio=False),
                 dict(type="Flip", flip_ratio=0.5),
                 dict(type="Normalize", mean=[123.675, 116.28, 103.53],
                      std=[58.395, 57.12, 57.375]),
                 dict(type="FormatShape", input_format="NCTHW"),
             ]),
        dict(type="VideoDataset",
             ann_file="data/omnisource/insvideo_train_list.txt",
             data_prefix="data/omnisource/insvideo",
             sample_by_class=True, power=0.5,
             pipeline=[
                 dict(type="SampleFrames", clip_len=8, frame_interval=8,
                      num_clips=1),
                 dict(type="DecordInit"),
                 dict(type="DecordDecode"),
                 dict(type="Resize", scale=(-1, 256)),
                 dict(type="RandomResizedCrop"),
                 dict(type="Resize", scale=(224, 224), keep_ratio=False),
                 dict(type="Flip", flip_ratio=0.5),
                 dict(type="Normalize", mean=[123.675, 116.28, 103.53],
                      std=[58.395, 57.12, 57.375]),
                 dict(type="FormatShape", input_format="NCTHW"),
             ]),
    ],
    train_ratio=[2, 1, 1, 1],
)
work_dir = "./work_dirs/slowonly_r50_8x8x1_256e_minikinetics_omnisource_rgb"

# Reference pipeline fidelity overrides: the merged
# reference slowonly_r50_8x8x1_256e_minikinetics_omnisource_rgb.py pipelines (values regenerated; the
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
