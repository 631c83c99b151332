# tsn_r50_320p_1x1x8_50e_activitynet_video_rgb (parity: reference configs/recognition/tsn/tsn_r50_320p_1x1x8_50e_activitynet_video_rgb.py)
_base_ = "./tsn_r50_1x1x3_100e_kinetics400_rgb.py"

model = dict(cls_head=dict(num_classes=200))

img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_bgr=False)

train_pipeline = [
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=8),
    dict(type="FrameSelector"),
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
    dict(type="FrameSelector"),
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
    dict(type="DecordInit"),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="ThreeCrop", crop_size=256),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCHW"),
]

data = dict(
    videos_per_gpu=8,
    train=dict(type="VideoDataset",
               ann_file="data/ActivityNet/anet_train_video.txt",
               data_prefix="data/ActivityNet/videos", pipeline=train_pipeline),
    val=dict(type="VideoDataset",
             ann_file="data/ActivityNet/anet_val_video.txt",
             data_prefix="data/ActivityNet/videos", pipeline=val_pipeline),
    test=dict(type="VideoDataset",
              ann_file="data/ActivityNet/anet_val_video.txt",
              data_prefix="data/ActivityNet/videos", pipeline=test_pipeline),
)

optimizer = dict(type="SGD", lr=0.001, momentum=0.9, weight_decay=1e-4)
total_epochs = 50
work_dir = "./work_dirs/tsn_r50_320p_1x1x8_50e_activitynet_video_rgb"

# Reference hyperparameter fidelity overrides (merged
# reference tsn_r50_320p_1x1x8_50e_activitynet_video_rgb.py values; generated)
_t = dict(globals().get('lr_config') or {})
_t['step'] = [20, 40]
lr_config = _t
del _t

# Reference hyperparameter fidelity overrides (merged
# reference tsn_r50_320p_1x1x8_50e_activitynet_video_rgb.py values; generated)
_t = dict(globals().get('model') or {})
_t['cls_head'] = dict(_t.get('cls_head') or {})
_t['cls_head']['dropout_ratio'] = 0.8
model = _t
del _t
