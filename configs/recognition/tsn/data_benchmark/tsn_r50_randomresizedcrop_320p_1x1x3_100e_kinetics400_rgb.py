# tsn_r50_randomresizedcrop_320p_1x1x3 data-benchmark ablation (parity: reference
# configs/recognition/tsn/data_benchmark/tsn_r50_randomresizedcrop_320p_1x1x3_100e_kinetics400_rgb.py
# — train-crop x source-resolution matrix; all cells share Resize (-1, 256))
_base_ = "../tsn_r50_1x1x3_100e_kinetics400_rgb.py"

img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_bgr=False)

train_pipeline = [
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=3),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="RandomResizedCrop"),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCHW"),
]

data = dict(
    train=dict(data_prefix="data/kinetics400/rawframes_train_320p",
               pipeline=train_pipeline),
    val=dict(data_prefix="data/kinetics400/rawframes_val_320p"),
    test=dict(data_prefix="data/kinetics400/rawframes_val_320p"),
)

work_dir = "./work_dirs/tsn_r50_randomresizedcrop_320p_1x1x3_100e_kinetics400_rgb"

# Reference pipeline fidelity overrides: the merged
# reference tsn_r50_randomresizedcrop_320p_1x1x3_100e_kinetics400_rgb.py pipelines (values regenerated; the
# device-stage Normalize is kept where the reference
# normalizes in the model instead)
_d = globals().get("data") or {}
data = dict(_d)
data["val"] = dict(_d.get("val") or {}, pipeline=[
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=3,
         test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=256),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCHW"),
])
data["test"] = dict(_d.get("test") or {}, pipeline=[
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=25,
         test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="ThreeCrop", crop_size=256),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCHW"),
])
del _d
