# swin_small_patch244_window877_kinetics400_1k (parity: reference configs/recognition/swin/swin_small_patch244_window877_kinetics400_1k.py)
model = dict(
    type="Recognizer3D",
    backbone=dict(
        type="SwinTransformer3D",
        patch_size=(2, 4, 4),
        embed_dim=96,
        depths=(2, 2, 18, 2),
        num_heads=(3, 6, 12, 24),
        window_size=(8, 7, 7),
        compute_dtype="bfloat16",
        pretrained="checkpoints/swin_small_patch4_window7_224.npz",
    ),
    cls_head=dict(type="I3DHead", in_channels=768, num_classes=400,
                  dropout_ratio=0.5),
    test_cfg=dict(average_clips="prob"),
)

img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_bgr=False)

train_pipeline = [
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=32, frame_interval=2, num_clips=1),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="RandomResizedCrop"),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCTHW"),
]
val_pipeline = [
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=32, frame_interval=2, num_clips=1,
         test_mode=True),
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
    dict(type="SampleFrames", clip_len=32, frame_interval=2, num_clips=4,
         test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 224)),
    dict(type="ThreeCrop", crop_size=224),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCTHW"),
]

data = dict(
    videos_per_gpu=8,
    workers_per_gpu=4,
    test_dataloader=dict(videos_per_gpu=1),
    train=dict(type="VideoDataset",
               ann_file="data/kinetics400/kinetics400_train_list_videos.txt",
               data_prefix="data/kinetics400/videos_train",
               pipeline=train_pipeline),
    val=dict(type="VideoDataset",
             ann_file="data/kinetics400/kinetics400_val_list_videos.txt",
             data_prefix="data/kinetics400/videos_val",
             pipeline=val_pipeline),
    test=dict(type="VideoDataset",
              ann_file="data/kinetics400/kinetics400_val_list_videos.txt",
              data_prefix="data/kinetics400/videos_val",
              pipeline=test_pipeline),
)

evaluation = dict(interval=5,
                  metrics=["top_k_accuracy", "mean_class_accuracy"])

optimizer = dict(type="AdamW", lr=1e-3, weight_decay=0.02,
                 paramwise_cfg=dict(custom_keys={
                     "norm": dict(decay_mult=0.0),
                     "relative_position_bias": dict(decay_mult=0.0)}))
optimizer_config = dict(grad_clip=dict(max_norm=40))
lr_config = dict(policy="CosineAnnealing", min_lr=0, warmup="linear",
                 warmup_by_epoch=True, warmup_iters=2.5)
total_epochs = 30
checkpoint_config = dict(interval=1)
log_config = dict(interval=20)

work_dir = "./work_dirs/swin_small_patch244_window877_kinetics400_1k"

# Reference hyperparameter fidelity overrides (merged
# reference swin_small_patch244_window877_kinetics400_1k.py values; generated)
_t = dict(globals().get('optimizer') or {})
optimizer = _t
del _t

# Reference hyperparameter fidelity overrides (merged
# reference swin_small_patch244_window877_kinetics400_1k.py values; generated)
_t = dict(globals().get('model') or {})
_t['test_cfg'] = dict(_t.get('test_cfg') or {})
_t['test_cfg']['max_testing_views'] = 4
model = _t
del _t
