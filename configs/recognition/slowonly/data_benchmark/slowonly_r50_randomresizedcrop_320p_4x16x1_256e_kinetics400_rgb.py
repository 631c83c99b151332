# SlowOnly data-benchmark: RandomResizedCrop at 320p source resolution
# (parity: reference configs/recognition/slowonly/data_benchmark/
# slowonly_r50_randomresizedcrop_320p_4x16x1_256e_kinetics400_rgb.py).
_base_ = ["../slowonly_r50_4x16x1_256e_kinetics400_rgb.py"]

img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_bgr=False)

train_pipeline = [
    dict(type="SampleFrames", clip_len=4, frame_interval=16, num_clips=1),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="RandomResizedCrop"),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCTHW"),
]

data = dict(
    videos_per_gpu=16,
    train=dict(
        ann_file="data/kinetics400/kinetics400_train_list_rawframes_320p.txt",
        data_prefix="data/kinetics400/rawframes_train_320p",
        pipeline=train_pipeline),
)

work_dir = ("./work_dirs/"
            "slowonly_r50_randomresizedcrop_320p_4x16x1_256e_kinetics400_rgb")

optimizer = dict(lr=0.6)  # reference schedule
