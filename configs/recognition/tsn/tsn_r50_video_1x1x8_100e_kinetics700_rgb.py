# tsn_r50_video_1x1x8_100e_kinetics700_rgb (parity: reference configs/recognition/tsn/tsn_r50_video_1x1x8_100e_kinetics700_rgb.py)
_base_ = "./tsn_r50_1x1x3_100e_kinetics400_rgb.py"

model = dict(cls_head=dict(num_classes=700))

img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_bgr=False)

train_pipeline = [
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=8),
    dict(type="DecordDecode"),
    dict(type="RandomResizedCrop"),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCHW"),
]
val_pipeline = [
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=8,
         test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=256),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCHW"),
]
test_pipeline = [
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=25,
         test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="ThreeCrop", crop_size=256),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCHW"),
]

data = dict(
    videos_per_gpu=12,
    train=dict(type="VideoDataset", ann_file="data/kinetics700/kinetics700_train_list_videos.txt",
               data_prefix="data/kinetics700/videos_train", pipeline=train_pipeline),
    val=dict(type="VideoDataset", ann_file="data/kinetics700/kinetics700_val_list_videos.txt",
             data_prefix="data/kinetics700/videos_val", pipeline=val_pipeline),
    test=dict(type="VideoDataset", ann_file="data/kinetics700/kinetics700_val_list_videos.txt",
              data_prefix="data/kinetics700/videos_val", pipeline=test_pipeline),
)

optimizer = dict(type="SGD", lr=0.00375, momentum=0.9, weight_decay=1e-4)
total_epochs = 100
work_dir = "./work_dirs/tsn_r50_video_1x1x8_100e_kinetics700_rgb"
