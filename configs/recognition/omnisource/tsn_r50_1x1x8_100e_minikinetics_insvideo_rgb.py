# TSN-R50 mini-Kinetics + insvideo auxiliary source (parity: reference
# configs/recognition/omnisource/tsn_r50_1x1x8_100e_minikinetics/
# tsn_r50_1x1x8_100e_minikinetics_insvideo_rgb.py — the kinetics source
# PAIRED with one extra source, not source-only; per-source batch sizes
# via omni_videos_per_gpu).
_base_ = ["./tsn_r50_1x1x8_100e_minikinetics_omnisource_rgb.py"]

img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_bgr=False)

train_pipeline = [
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=8),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="RandomResizedCrop"),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCHW"),
]
train_aux_pipeline = [
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=8),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="RandomResizedCrop"),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCHW"),
]

data = dict(
    omni_videos_per_gpu=[12, 12],
    train_ratio=[2, 1],
    train=[
        dict(type="VideoDataset",
             ann_file="data/OmniSource/annotations/kinetics_200/k200_train.txt",
             data_prefix="data/OmniSource/kinetics_200_train",
             pipeline=train_pipeline),
        dict(type="VideoDataset",
             ann_file="data/OmniSource/annotations/insvideo_200/tsn_8seg_insvideo_200_wodup.txt",
             data_prefix="data/OmniSource/insvideo_200",
             pipeline=train_aux_pipeline,
             num_classes=200,
             sample_by_class=True,
             power=0.5),
    ],
)

work_dir = "./work_dirs/tsn_r50_1x1x8_100e_minikinetics_insvideo_rgb"

# Reference hyperparameter fidelity overrides (merged
# reference tsn_r50_1x1x8_100e_minikinetics_insvideo_rgb.py values; generated)
_t = dict(globals().get('lr_config') or {})
_t['policy'] = 'step'
_t['step'] = [40, 80]
lr_config = _t
del _t
