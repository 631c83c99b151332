# AIM with 3D window attention + temporal-cls prompt, HMDB51, 16 frames
# (parity: reference configs/recognition/vit/AIM/AIM_flash_win_base_hmdb51.py
# — the flash-attn windows become the TPU window path; GPUNormalize is the
# default here: normalization always runs on device)
_base_ = [
    "../../../_base_/models/vitclip_base.py",
    "../../../_base_/default_runtime.py",
]

num_frames = 16
model = dict(
    backbone=dict(type="AIM", drop_path_rate=0.2, adapter_scale=0.5,
                  num_frames=num_frames, wind_attn=True,
                  window_size=(16, 7, 7), not_shift=True, prompt=True),
    cls_head=dict(num_classes=51),
)

dataset_type = "VideoDataset"
data_root = "data/hmdb51/videos"
ann_file_train = "data/hmdb51/hmdb51_train_split_1_videos.txt"
ann_file_val = "data/hmdb51/hmdb51_val_split_1_videos.txt"
img_norm_cfg = dict(
    mean=[122.769, 116.74, 104.04], std=[68.493, 66.63, 70.321], to_bgr=False)

train_pipeline = [
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=num_frames, frame_interval=4,
         num_clips=1),
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
    dict(type="SampleFrames", clip_len=num_frames, frame_interval=4,
         num_clips=3, test_mode=True),
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
             data_prefix=data_root, pipeline=test_pipeline),
    test=dict(type=dataset_type, ann_file=ann_file_val,
              data_prefix=data_root, pipeline=test_pipeline),
)
evaluation = dict(interval=5, metrics=["top_k_accuracy", "mean_class_accuracy"],
                  save_best="top1_acc")
optimizer = dict(
    type="AdamW", lr=3e-4, betas=(0.9, 0.999), weight_decay=0.05,
    paramwise_cfg=dict(custom_keys={
        "class_embedding": dict(decay_mult=0.0),
        "positional_embedding": dict(decay_mult=0.0),
        "temporal_embedding": dict(decay_mult=0.0),
        "ln_1": dict(decay_mult=0.0),
        "ln_2": dict(decay_mult=0.0),
        "ln_pre": dict(decay_mult=0.0),
        "ln_post": dict(decay_mult=0.0),
    }))
optimizer_config = dict(update_interval=2, grad_clip=None)
lr_config = dict(policy="CosineAnnealing", min_lr=0, warmup="linear",
                 warmup_by_epoch=True, warmup_iters=2.5)
total_epochs = 30
checkpoint_config = dict(interval=10, max_keep_ckpts=3)
work_dir = "./work_dirs/aim_window_base_hmdb51"
