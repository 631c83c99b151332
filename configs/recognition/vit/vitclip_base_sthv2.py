# AIM ViT-B/16, Something-Something v2 (parity: reference
# configs/recognition/vit/vitclip_base_sthv2.py — frame_uniform sampling,
# num_tadapter=2, adapter_scale=1, LabelSmoothing blending, 50 epochs)
# NOTE: the reference additionally uses Imgaug RandAugment; host-side
# RandAugment is tracked as a pipeline-compiler extension.
_base_ = [
    "../../_base_/models/vitclip_base.py",
    "../../_base_/default_runtime.py",
]

model = dict(
    # the reference file passes the AIM-only num_tadapter knob into its
    # ViT_CLIP and crashes as shipped; the intended model is AIM
    backbone=dict(type="AIM", drop_path_rate=0.2, adapter_scale=1, num_tadapter=2,
                  num_frames=8),
    cls_head=dict(num_classes=174),
    test_cfg=dict(max_testing_views=2),
    train_cfg=dict(blending=dict(type="LabelSmoothing", num_classes=174,
                                 smoothing=0.1)),
)

dataset_type = "VideoDataset"
data_root = "data/sthv2/videos"
data_root_val = "data/sthv2/videos"
ann_file_train = "data/sthv2/sthv2_train_list_videos.txt"
ann_file_val = "data/sthv2/sthv2_val_list_videos.txt"
ann_file_test = "data/sthv2/sthv2_val_list_videos.txt"
img_norm_cfg = dict(
    mean=[122.769, 116.74, 104.04], std=[68.493, 66.63, 70.321], to_bgr=False)

train_pipeline = [
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=8, frame_interval=2, num_clips=1,
         frame_uniform=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="RandomResizedCrop"),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0),
    dict(type="Imgaug", transforms=[dict(type="RandAugment", n=4, m=7)]),
    dict(type="Normalize", mean=[122.769, 116.74, 104.04], std=[68.493,
         66.63, 70.321], to_bgr=False),
    dict(type="RandomErasing", probability=0.25),
    dict(type="FormatShape", input_format="NCTHW"),
]
val_pipeline = [
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=8, frame_interval=2, num_clips=1,
         frame_uniform=True, test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=224),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCTHW"),
]
test_pipeline = [
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=8, frame_interval=2, num_clips=1,
         frame_uniform=True, test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 224)),
    dict(type="ThreeCrop", crop_size=224),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCTHW"),
]

data = dict(
    videos_per_gpu=8,
    workers_per_gpu=8,
    val_dataloader=dict(videos_per_gpu=1, workers_per_gpu=4),
    test_dataloader=dict(videos_per_gpu=1, workers_per_gpu=4),
    train=dict(type=dataset_type, ann_file=ann_file_train,
               data_prefix=data_root, pipeline=train_pipeline),
    val=dict(type=dataset_type, ann_file=ann_file_val,
             data_prefix=data_root_val, pipeline=val_pipeline),
    test=dict(type=dataset_type, ann_file=ann_file_test,
              data_prefix=data_root_val, pipeline=test_pipeline),
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
optimizer_config = dict(update_interval=1, grad_clip=None)
lr_config = dict(policy="CosineAnnealing", min_lr=0, warmup="linear",
                 warmup_by_epoch=True, warmup_iters=2.5)
total_epochs = 50
checkpoint_config = dict(interval=10)
work_dir = "./work_dirs/vitclip_base_sthv2"
