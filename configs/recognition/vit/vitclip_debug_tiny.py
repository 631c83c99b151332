# Tiny debug config: synthetic-friendly, compiles in seconds. Used by smoke
# tests and tool demos; NOT a training recipe.
_base_ = ["../../_base_/default_runtime.py"]

model = dict(
    type="Recognizer3D",
    backbone=dict(type="AIM", input_resolution=64, patch_size=16, width=64,
                  layers=2, heads=4, num_frames=4, drop_path_rate=0.1),
    cls_head=dict(type="I3DHead", num_classes=10, in_channels=64),
    test_cfg=dict(average_clips="prob"),
)

img_norm_cfg = dict(
    mean=[122.769, 116.74, 104.04], std=[68.493, 66.63, 70.321], to_bgr=False)

train_pipeline = [
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=4, frame_interval=2, num_clips=1),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 72)),
    dict(type="RandomResizedCrop"),
    dict(type="Resize", scale=(64, 64), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCTHW"),
]
test_pipeline = [
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=4, frame_interval=2, num_clips=2,
         test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 64)),
    dict(type="CenterCrop", crop_size=64),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCTHW"),
]

data = dict(
    videos_per_gpu=4,
    workers_per_gpu=2,
    test_dataloader=dict(videos_per_gpu=2),
    train=dict(type="VideoDataset", ann_file="ann.txt", data_prefix="",
               pipeline=train_pipeline),
    val=dict(type="VideoDataset", ann_file="ann.txt", data_prefix="",
             pipeline=test_pipeline),
    test=dict(type="VideoDataset", ann_file="ann.txt", data_prefix="",
              pipeline=test_pipeline),
)
evaluation = dict(interval=1, metrics=["top_k_accuracy"])
optimizer = dict(type="AdamW", lr=1e-3, weight_decay=0.05)
optimizer_config = dict(update_interval=1)
lr_config = dict(policy="CosineAnnealing", min_lr=0)
total_epochs = 1
work_dir = "./work_dirs/debug_tiny"
