# TSN 1x1x3 over 320p-rescaled video files (parity: reference
# configs/recognition/tsn/tsn_r50_video_320p_1x1x3_100e_kinetics400_rgb.py
# — the 320p rawframe recipe re-pointed at short-side-320 videos).
_base_ = ["./tsn_r50_320p_1x1x3_100e_kinetics400_rgb.py"]

data = dict(
    train=dict(type="VideoDataset",
               ann_file="data/kinetics400/kinetics400_train_list_videos_320p.txt",
               data_prefix="data/kinetics400/videos_train_320p"),
    val=dict(type="VideoDataset",
             ann_file="data/kinetics400/kinetics400_val_list_videos_320p.txt",
             data_prefix="data/kinetics400/videos_val_320p"),
    test=dict(type="VideoDataset",
              ann_file="data/kinetics400/kinetics400_val_list_videos_320p.txt",
              data_prefix="data/kinetics400/videos_val_320p"),
)

work_dir = "./work_dirs/tsn_r50_video_320p_1x1x3_100e_kinetics400_rgb"

# Reference pipeline fidelity overrides: the merged
# reference tsn_r50_video_320p_1x1x3_100e_kinetics400_rgb.py pipelines (values regenerated; the
# device-stage Normalize is kept where the reference
# normalizes in the model instead)
_d = globals().get("data") or {}
data = dict(_d)
data["train"] = dict(_d.get("train") or {}, pipeline=[
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=3),
    dict(type="DecordDecode"),
    dict(type="RandomResizedCrop"),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCHW"),
])
data["val"] = dict(_d.get("val") or {}, pipeline=[
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=3,
         test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=224),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCHW"),
])
data["test"] = dict(_d.get("test") or {}, pipeline=[
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=25,
         test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="TenCrop", crop_size=224),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCHW"),
])
del _d
