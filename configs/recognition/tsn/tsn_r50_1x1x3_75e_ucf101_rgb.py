# tsn_r50_1x1x3_75e_ucf101_rgb (parity: reference configs/recognition/tsn/tsn_r50_1x1x3_75e_ucf101_rgb.py)
_base_ = "./tsn_r50_1x1x3_100e_kinetics400_rgb.py"

model = dict(cls_head=dict(num_classes=101, init_std=0.001))

img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_bgr=False)

train_pipeline = [
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=3),
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
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=3,
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
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCHW"),
]

data = dict(
    train=dict(type="RawframeDataset", ann_file="data/ucf101/ucf101_train_list.txt",
               data_prefix="data/ucf101/rawframes/train", pipeline=train_pipeline),
    val=dict(type="RawframeDataset", ann_file="data/ucf101/ucf101_val_list.txt",
             data_prefix="data/ucf101/rawframes/val", pipeline=val_pipeline),
    test=dict(type="RawframeDataset", ann_file="data/ucf101/ucf101_val_list.txt",
              data_prefix="data/ucf101/rawframes/val", pipeline=test_pipeline),
)

optimizer = dict(type="SGD", lr=0.00128, momentum=0.9, weight_decay=0.0005)
lr_config = dict(policy="step", step=[])
total_epochs = 75
work_dir = "./work_dirs/tsn_r50_1x1x3_75e_ucf101_rgb"

# Reference hyperparameter fidelity overrides (merged
# reference tsn_r50_1x1x3_75e_ucf101_rgb.py values; generated)
_t = dict(globals().get('optimizer') or {})
optimizer = _t
_t = dict(globals().get('lr_config') or {})
lr_config = _t
del _t
