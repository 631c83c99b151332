# tsn_r50_320p_1x1x8_150e_activitynet_video_flow (parity: reference configs/recognition/tsn/tsn_r50_320p_1x1x8_150e_activitynet_video_flow.py)
_base_ = "./tsn_r50_1x1x3_100e_kinetics400_rgb.py"

# ``in_channels`` = 2 * clip_len: 5 flow frames stack into 10 channels per
# segment (reference FormatShape NCHW_Flow, formating.py:268-278)
model = dict(backbone=dict(in_channels=10),
             cls_head=dict(num_classes=200))

img_norm_cfg = dict(mean=[128, 128], std=[128, 128])

train_pipeline = [
    dict(type="SampleFrames", clip_len=5, frame_interval=1, num_clips=8),
    dict(type="FrameSelector"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="RandomResizedCrop"),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Normalize", mean=[128, 128], std=[128, 128], to_bgr=False),
    dict(type="FormatShape", input_format="NCHW_Flow"),
]
val_pipeline = [
    dict(type="SampleFrames", clip_len=5, frame_interval=1, num_clips=8,
         test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=224),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCHW_Flow"),
]
test_pipeline = [
    dict(type="SampleFrames", clip_len=5, frame_interval=1, num_clips=25,
         test_mode=True),
    dict(type="FrameSelector"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="TenCrop", crop_size=224),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[128, 128], std=[128, 128], to_bgr=False),
    dict(type="FormatShape", input_format="NCHW_Flow"),
]

data = dict(
    videos_per_gpu=8,
    train=dict(type="RawframeDataset", ann_file="data/ActivityNet/flow_train_list.txt",
               data_prefix="data/ActivityNet/rawframes_flow", pipeline=train_pipeline,
               modality="Flow", filename_tmpl="{}_{:05d}.jpg"),
    val=dict(type="RawframeDataset", ann_file="data/ActivityNet/flow_val_list.txt",
             data_prefix="data/ActivityNet/rawframes_flow", pipeline=val_pipeline,
             modality="Flow", filename_tmpl="{}_{:05d}.jpg"),
    test=dict(type="RawframeDataset", ann_file="data/ActivityNet/flow_val_list.txt",
              data_prefix="data/ActivityNet/rawframes_flow", pipeline=test_pipeline,
              modality="Flow", filename_tmpl="{}_{:05d}.jpg"),
)

optimizer = dict(type="SGD", lr=0.001, momentum=0.9, weight_decay=1e-4)
total_epochs = 150
work_dir = "./work_dirs/tsn_r50_320p_1x1x8_150e_activitynet_video_flow"

# Reference hyperparameter fidelity overrides (merged
# reference tsn_r50_320p_1x1x8_150e_activitynet_video_flow.py values; generated)
_t = dict(globals().get('lr_config') or {})
_t['step'] = [60, 120]
lr_config = _t
del _t

# Reference hyperparameter fidelity overrides (merged
# reference tsn_r50_320p_1x1x8_150e_activitynet_video_flow.py values; generated)
_t = dict(globals().get('model') or {})
_t['cls_head'] = dict(_t.get('cls_head') or {})
_t['cls_head']['dropout_ratio'] = 0.8
model = _t
del _t
