# TSN video recipe + Imgaug default augmentation after Flip (parity:
# reference configs/recognition/tsn/
# tsn_r50_video_imgaug_1x1x8_100e_kinetics400_rgb.py).
_base_ = ["./tsn_r50_video_1x1x8_100e_kinetics400_rgb.py"]

img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_bgr=False)

train_pipeline = [
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=8),
    dict(type="DecordInit"),
    dict(type="DecordDecode"),
    dict(type="MultiScaleCrop", input_size=224,
         scales=(1, 0.875, 0.75, 0.66), random_crop=False,
         max_wh_scale_gap=1),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Imgaug", transforms="default"),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCHW"),
]

data = dict(train=dict(pipeline=train_pipeline))

work_dir = "./work_dirs/tsn_r50_video_imgaug_1x1x8_100e_kinetics400_rgb"
