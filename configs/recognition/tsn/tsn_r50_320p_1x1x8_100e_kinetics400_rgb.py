# tsn_r50_320p_1x1x8_100e_kinetics400_rgb (parity: reference configs/recognition/tsn/tsn_r50_320p_1x1x8_100e_kinetics400_rgb.py)
_base_ = "./tsn_r50_1x1x3_100e_kinetics400_rgb.py"

img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_bgr=False)

train_pipeline = [
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=8),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="RandomResizedCrop"),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCHW"),
]
val_pipeline = [
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=8,
         test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=256),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCHW"),
]
test_pipeline = [
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=25,
         test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="ThreeCrop", crop_size=256),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCHW"),
]

data = dict(
    videos_per_gpu=12,
    train=dict(data_prefix="data/kinetics400/rawframes_train_320p",
               pipeline=train_pipeline),
    val=dict(data_prefix="data/kinetics400/rawframes_val_320p",
             pipeline=val_pipeline),
    test=dict(data_prefix="data/kinetics400/rawframes_val_320p",
              pipeline=test_pipeline),
)

total_epochs = 100
work_dir = "./work_dirs/tsn_r50_320p_1x1x8_100e_kinetics400_rgb"

optimizer = dict(lr=0.00375)  # reference schedule
