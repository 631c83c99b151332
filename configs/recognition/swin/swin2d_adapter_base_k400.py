# Swin2D-Adapter (Swin-B grafted with AIM adapters), K400
# (parity: reference configs/_base_/models/swin/swin2d_adapter_base.py)
_base_ = ["../../_base_/default_runtime.py"]

model = dict(
    type="Recognizer3D",
    backbone=dict(
        type="SwinTransformer2D_Adapter",
        img_size=224,
        patch_size=(2, 4, 4),
        num_frames=32,
        embed_dim=128,
        depths=(2, 2, 18, 2),
        num_heads=(4, 8, 16, 32),
        window_size=7,
        drop_path_rate=0.2,
        compute_dtype="bfloat16",
    ),
    cls_head=dict(type="I3DHead", in_channels=1024, num_classes=400,
                  dropout_ratio=0.5),
    test_cfg=dict(average_clips="prob"),
)

dataset_type = "VideoDataset"
data_root = "data/kinetics400/train_256"
data_root_val = "data/kinetics400/val_256"
ann_file_train = "data/kinetics400/train_video_list.txt"
ann_file_val = "data/kinetics400/val_video_list.txt"
img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_bgr=False)

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
test_pipeline = [
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=32, frame_interval=2, num_clips=3,
         test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 224)),
    dict(type="CenterCrop", crop_size=224),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCTHW"),
]

data = dict(
    videos_per_gpu=8,
    workers_per_gpu=8,
    test_dataloader=dict(videos_per_gpu=1, workers_per_gpu=4),
    train=dict(type=dataset_type, ann_file=ann_file_train,
               data_prefix=data_root, pipeline=train_pipeline),
    val=dict(type=dataset_type, ann_file=ann_file_val,
             data_prefix=data_root_val, pipeline=test_pipeline),
    test=dict(type=dataset_type, ann_file=ann_file_val,
              data_prefix=data_root_val, pipeline=test_pipeline),
)
evaluation = dict(interval=5, metrics=["top_k_accuracy", "mean_class_accuracy"])
optimizer = dict(type="AdamW", lr=3e-4, betas=(0.9, 0.999), weight_decay=0.05,
                 paramwise_cfg=dict(custom_keys={
                     "temporal_position_bias_table": dict(decay_mult=0.0),
                     "relative_position_bias_table": dict(decay_mult=0.0),
                 }))
optimizer_config = dict(update_interval=1)
lr_config = dict(policy="CosineAnnealing", min_lr=0, warmup="linear",
                 warmup_by_epoch=True, warmup_iters=2.5)
total_epochs = 30
checkpoint_config = dict(interval=10)
work_dir = "./work_dirs/swin2d_adapter_base_k400"
