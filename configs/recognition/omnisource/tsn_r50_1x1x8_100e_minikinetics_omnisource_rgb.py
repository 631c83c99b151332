# TSN-R50 OmniSource mini-Kinetics (parity: reference
# configs/recognition/omnisource/tsn_r50_1x1x8_100e_minikinetics/
# tsn_r50_1x1x8_100e_minikinetics_omnisource_rgb.py — four sources:
# labeled videos, web images (1-frame clips), instagram videos, raw
# kinetics videos; train_ratio 2:1:1:1 with per-source batch sizes).
model = dict(
    type="Recognizer2D",
    backbone=dict(type="ResNet", depth=50),
    cls_head=dict(type="TSNHead", num_classes=200, in_channels=2048,
                  dropout_ratio=0.4),
    test_cfg=dict(average_clips="prob"),
)

dataset_type = "VideoDataset"
data_root = "data/OmniSource/kinetics_200_train"
data_root_val = "data/OmniSource/kinetics_200_val"
web_root = "data/OmniSource/"
iv_root = "data/OmniSource/insvideo_200"
kraw_root = "data/OmniSource/kinetics_raw_200_train"
ann_file_train = "data/OmniSource/annotations/kinetics_200/k200_train.txt"
ann_file_web = ("data/OmniSource/annotations/webimage_200/"
                "tsn_8seg_webimage_200_wodup.txt")
ann_file_iv = ("data/OmniSource/annotations/insvideo_200/"
               "slowonly_8x8_insvideo_200_wodup.txt")
ann_file_kraw = ("data/OmniSource/annotations/kinetics_raw_200/"
                 "slowonly_8x8_kinetics_raw_200.txt")
ann_file_val = "data/OmniSource/annotations/kinetics_200/k200_val.txt"
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
# web images are 1-frame "videos": every segment samples the same image
train_web_pipeline = [
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=8),
    dict(type="ImageDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="RandomResizedCrop"),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCHW"),
]
val_pipeline = [
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=8,
         test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=256),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCHW"),
]
test_pipeline = [
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=25,
         test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="ThreeCrop", crop_size=256),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCHW"),
]

data = dict(
    videos_per_gpu=12,
    omni_videos_per_gpu=[12, 64, 12, 12],
    train_ratio=[2, 1, 1, 1],
    workers_per_gpu=2,
    train=[
        dict(type=dataset_type, ann_file=ann_file_train,
             data_prefix=data_root, pipeline=train_pipeline),
        dict(type="ImageDataset", ann_file=ann_file_web,
             data_prefix=web_root, pipeline=train_web_pipeline,
             num_classes=200, sample_by_class=True, power=0.5),
        dict(type=dataset_type, ann_file=ann_file_iv,
             data_prefix=iv_root, pipeline=train_pipeline,
             num_classes=200, sample_by_class=True, power=0.5),
        dict(type="RawVideoDataset", ann_file=ann_file_kraw,
             data_prefix=kraw_root, pipeline=train_pipeline,
             clipname_tmpl="part_{}.mp4", sampling_strategy="positive"),
    ],
    val=dict(type=dataset_type, ann_file=ann_file_val,
             data_prefix=data_root_val, pipeline=val_pipeline),
    test=dict(type=dataset_type, ann_file=ann_file_val,
              data_prefix=data_root_val, pipeline=test_pipeline),
)
evaluation = dict(interval=5,
                  metrics=["top_k_accuracy", "mean_class_accuracy"])

optimizer = dict(type="SGD", lr=0.00375, momentum=0.9, weight_decay=1e-4)
optimizer_config = dict(grad_clip=dict(max_norm=40))
lr_config = dict(policy='step', min_lr=0)
total_epochs = 100
checkpoint_config = dict(interval=1)
work_dir = "./work_dirs/tsn_r50_1x1x8_100e_minikinetics_omnisource_rgb"

# Reference hyperparameter fidelity overrides (merged
# reference tsn_r50_1x1x8_100e_minikinetics_omnisource_rgb.py values; generated)
_t = dict(globals().get('lr_config') or {})
_t['step'] = [40, 80]
lr_config = _t
del _t
