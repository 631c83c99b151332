# i3d_r50_heavy_8x8x1_100e_kinetics400_rgb (parity: reference configs/recognition/i3d/i3d_r50_heavy_8x8x1_100e_kinetics400_rgb.py)
_base_ = "./i3d_r50_32x2x1_100e_kinetics400_rgb.py"

# 'heavy' stem/inflation: every stage inflated 3x3x3-capable, temporal
# stride kept at the stem, pool2 enabled
model = dict(backbone=dict(inflate=(1, 1, 1, 1), conv1_stride_t=1,
                           pool1_stride_t=1, with_pool2=True))

data = dict(
    train=dict(pipeline=[
        dict(type="SampleFrames", clip_len=8, frame_interval=8, num_clips=1),
        dict(type="RawFrameDecode"),
        dict(type="Resize", scale=(-1, 256)),
        dict(type="MultiScaleCrop", input_size=224, scales=(1, 0.8),
             random_crop=False, max_wh_scale_gap=0),
        dict(type="Resize", scale=(224, 224), keep_ratio=False),
        dict(type="Flip", flip_ratio=0.5),
        dict(type="Normalize", mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375]),
        dict(type="FormatShape", input_format="NCTHW"),
    ]),
    val=dict(pipeline=[
        dict(type="SampleFrames", clip_len=8, frame_interval=8, num_clips=1,
             test_mode=True),
        dict(type="RawFrameDecode"),
        dict(type="Resize", scale=(-1, 256)),
        dict(type="CenterCrop", crop_size=224),
        dict(type="Normalize", mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375]),
        dict(type="FormatShape", input_format="NCTHW"),
    ]),
    test=dict(pipeline=[
        dict(type="SampleFrames", clip_len=8, frame_interval=8,
             num_clips=10, test_mode=True),
        dict(type="RawFrameDecode"),
        dict(type="Resize", scale=(-1, 256)),
        dict(type="ThreeCrop", crop_size=256),
        dict(type="Normalize", mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375]),
        dict(type="FormatShape", input_format="NCTHW"),
    ]),
)
work_dir = "./work_dirs/i3d_r50_heavy_8x8x1_100e_kinetics400_rgb"
