# tsn_r50_1x1x8_100e_minikinetics_insvideo_rgb (parity: reference configs/recognition/omnisource/
# tsn_r50_1x1x8_100e_minikinetics/tsn_r50_1x1x8_100e_minikinetics_insvideo_rgb.py — single-source ablation of the
# omnisource recipe)
_base_ = "./tsn_r50_1x1x8_100e_minikinetics_omnisource_rgb.py"

data = dict(
    _delete_=True,
    videos_per_gpu=12,
    workers_per_gpu=2,
    train=dict(type="VideoDataset", ann_file="data/omnisource/insvideo_train_list.txt",
               data_prefix="data/omnisource/insvideo", pipeline=[
        dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=8),
        dict(type="DecordInit"),
        dict(type="DecordDecode"),
        dict(type="Resize", scale=(-1, 256)),
        dict(type="RandomResizedCrop"),
        dict(type="Resize", scale=(224, 224), keep_ratio=False),
        dict(type="Flip", flip_ratio=0.5),
        dict(type="Normalize", mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375]),
        dict(type="FormatShape", input_format="NCHW"),
    ]),
    val=dict(type="VideoDataset",
             ann_file="data/omnisource/minikinetics_val_list.txt",
             data_prefix="data/omnisource/minikinetics_val", pipeline=[
        dict(type="SampleFrames", clip_len=1, frame_interval=1,
             num_clips=8, test_mode=True),
        dict(type="DecordInit"),
        dict(type="DecordDecode"),
        dict(type="Resize", scale=(-1, 256)),
        dict(type="CenterCrop", crop_size=224),
        dict(type="Normalize", mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375]),
        dict(type="FormatShape", input_format="NCHW"),
    ]),
    test=dict(type="VideoDataset",
              ann_file="data/omnisource/minikinetics_val_list.txt",
              data_prefix="data/omnisource/minikinetics_val", pipeline=[
        dict(type="SampleFrames", clip_len=1, frame_interval=1,
             num_clips=25, test_mode=True),
        dict(type="DecordInit"),
        dict(type="DecordDecode"),
        dict(type="Resize", scale=(-1, 256)),
        dict(type="TenCrop", crop_size=224),
        dict(type="Normalize", mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375]),
        dict(type="FormatShape", input_format="NCHW"),
    ]),
)
work_dir = "./work_dirs/tsn_r50_1x1x8_100e_minikinetics_insvideo_rgb"
