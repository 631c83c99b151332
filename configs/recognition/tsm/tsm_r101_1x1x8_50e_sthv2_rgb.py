# tsm_r101_1x1x8_50e_sthv2_rgb (parity: reference configs/recognition/tsm/tsm_r101_1x1x8_50e_sthv2_rgb.py)
_base_ = "./tsm_r50_1x1x8_50e_kinetics400_rgb.py"

model = dict(
    backbone=dict(depth=101, num_frames=8),
    cls_head=dict(num_classes=174, num_segments=8))

img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_bgr=False)

train_pipeline = [
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=8),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="MultiScaleCrop", input_size=224,
         scales=(1, 0.875, 0.75, 0.66), random_crop=False,
         max_wh_scale_gap=1, num_fixed_crops=13),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCHW"),
]
val_pipeline = [
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=8,
         test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=224),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCHW"),
]
test_pipeline = [
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=8,
         test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=224),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCHW"),
]

data = dict(
    train=dict(ann_file="data/sthv2/sthv2_train_list_rawframes.txt",
               data_prefix="data/sthv2/rawframes",
               filename_tmpl="{:05}.jpg", pipeline=train_pipeline),
    val=dict(ann_file="data/sthv2/sthv2_val_list_rawframes.txt",
             data_prefix="data/sthv2/rawframes",
             filename_tmpl="{:05}.jpg", pipeline=val_pipeline),
    test=dict(ann_file="data/sthv2/sthv2_val_list_rawframes.txt",
              data_prefix="data/sthv2/rawframes",
              filename_tmpl="{:05}.jpg", pipeline=test_pipeline),
)

optimizer = dict(type="SGD", lr=0.01,
                 momentum=0.9, weight_decay=5e-4)
lr_config = dict(policy="step", step=[20, 40])
total_epochs = 50
work_dir = "./work_dirs/tsm_r101_1x1x8_50e_sthv2_rgb"
