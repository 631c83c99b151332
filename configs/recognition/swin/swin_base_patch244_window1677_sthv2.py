# swin_base_patch244_window1677_sthv2 (parity: reference configs/recognition/swin/swin_base_patch244_window1677_sthv2.py)
model = dict(
    type="Recognizer3D",
    backbone=dict(
        type="SwinTransformer3D",
        patch_size=(2, 4, 4),
        embed_dim=128,
        depths=(2, 2, 18, 2),
        num_heads=(4, 8, 16, 32),
        window_size=(16, 7, 7),
        compute_dtype="bfloat16",
        pretrained="checkpoints/swin_base_patch4_window7_224.npz",
    ),
    cls_head=dict(type="I3DHead", in_channels=1024, num_classes=174,
                  dropout_ratio=0.5),
    test_cfg=dict(average_clips="prob"),
)

img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_bgr=False)

train_pipeline = [
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=32, frame_interval=2, num_clips=1,
         frame_uniform=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="RandomResizedCrop"),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0),
    dict(type="Imgaug", transforms=[dict(type="RandAugment", n=4, m=7)]),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="RandomErasing", probability=0.25),
    dict(type="FormatShape", input_format="NCTHW"),
]
val_pipeline = [
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=32, frame_interval=2, num_clips=1,
         frame_uniform=True, test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=224),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCTHW"),
]
test_pipeline = [
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=32, frame_interval=2, num_clips=1,
         frame_uniform=True, test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 224)),
    dict(type="ThreeCrop", crop_size=224),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCTHW"),
]

data = dict(
    videos_per_gpu=8,
    workers_per_gpu=4,
    test_dataloader=dict(videos_per_gpu=1),
    train=dict(type="VideoDataset",
               ann_file="data/sthv2/sthv2_train_list_videos.txt",
               data_prefix="data/sthv2/videos_train",
               pipeline=train_pipeline),
    val=dict(type="VideoDataset",
             ann_file="data/sthv2/sthv2_val_list_videos.txt",
             data_prefix="data/sthv2/videos_val",
             pipeline=val_pipeline),
    test=dict(type="VideoDataset",
              ann_file="data/sthv2/sthv2_val_list_videos.txt",
              data_prefix="data/sthv2/videos_val",
              pipeline=test_pipeline),
)

evaluation = dict(interval=5,
                  metrics=["top_k_accuracy", "mean_class_accuracy"])

optimizer = dict(type="AdamW", lr=0.0003, weight_decay=0.05,
                 paramwise_cfg=dict(custom_keys={
                     "norm": dict(decay_mult=0.0),
                     "relative_position_bias": dict(decay_mult=0.0)}))
optimizer_config = dict(grad_clip=dict(max_norm=40))
lr_config = dict(policy="CosineAnnealing", min_lr=0, warmup="linear",
                 warmup_by_epoch=True, warmup_iters=2.5)
total_epochs = 60
checkpoint_config = dict(interval=1)
log_config = dict(interval=20)

work_dir = "./work_dirs/swin_base_patch244_window1677_sthv2"

# Reference hyperparameter fidelity overrides (merged
# reference swin_base_patch244_window1677_sthv2.py values; generated)
_t = dict(globals().get('model') or {})
_t['train_cfg'] = dict(_t.get('train_cfg') or {})
_t['train_cfg']['blending'] = dict(type='LabelSmoothing',
                                   num_classes=174, smoothing=0.1)
_t['test_cfg'] = dict(_t.get('test_cfg') or {})
_t['test_cfg']['max_testing_views'] = 2
model = _t
del _t
