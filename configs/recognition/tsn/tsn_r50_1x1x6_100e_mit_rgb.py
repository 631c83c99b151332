# tsn_r50_1x1x6_100e_mit_rgb (parity: reference configs/recognition/tsn/tsn_r50_1x1x6_100e_mit_rgb.py)
_base_ = "./tsn_r50_1x1x3_100e_kinetics400_rgb.py"

model = dict(cls_head=dict(num_classes=339))

img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_bgr=False)

train_pipeline = [
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=6),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="MultiScaleCrop", input_size=224, scales=(1, 0.8),
         random_crop=False, max_wh_scale_gap=0),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape"),
]
val_pipeline = [
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=6,
         test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=224),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape"),
]
test_pipeline = [
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=6,
         test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="ThreeCrop", crop_size=256),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape"),
]

data = dict(
    videos_per_gpu=16,
    train=dict(ann_file="data/mit/mit_train_list.txt",
               data_prefix="data/mit/rawframes", pipeline=train_pipeline),
    val=dict(ann_file="data/mit/mit_val_list.txt",
             data_prefix="data/mit/rawframes", pipeline=val_pipeline),
    test=dict(ann_file="data/mit/mit_val_list.txt",
              data_prefix="data/mit/rawframes", pipeline=test_pipeline),
)

optimizer = dict(type="SGD", lr=0.005, momentum=0.9, weight_decay=1e-4)
total_epochs = 100
work_dir = "./work_dirs/tsn_r50_1x1x6_100e_mit_rgb"
