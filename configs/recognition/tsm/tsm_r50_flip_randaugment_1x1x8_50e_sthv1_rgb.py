# tsm_r50_flip_randaugment_1x1x8_50e_sthv1_rgb (parity: reference configs/recognition/tsm/tsm_r50_flip_randaugment_1x1x8_50e_sthv1_rgb.py)
_base_ = "./tsm_r50_1x1x8_50e_sthv1_rgb.py"

sthv1_flip_label_map = {2: 4, 4: 2, 30: 41, 41: 30, 52: 66, 66: 52}

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
    dict(type="Flip", flip_ratio=0.5, flip_label_map=sthv1_flip_label_map),
    dict(type="Imgaug", transforms="default"),
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
    train=dict(ann_file="data/sthv1/sthv1_train_list_rawframes.txt",
               data_prefix="data/sthv1/rawframes",
               filename_tmpl="{:05}.jpg", pipeline=train_pipeline),
    val=dict(ann_file="data/sthv1/sthv1_val_list_rawframes.txt",
             data_prefix="data/sthv1/rawframes",
             filename_tmpl="{:05}.jpg", pipeline=val_pipeline),
    test=dict(ann_file="data/sthv1/sthv1_val_list_rawframes.txt",
              data_prefix="data/sthv1/rawframes",
              filename_tmpl="{:05}.jpg", pipeline=test_pipeline),
)
work_dir = "./work_dirs/tsm_r50_flip_randaugment_1x1x8_50e_sthv1_rgb"
