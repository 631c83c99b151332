# X3D-M K400 16x5 (parity: reference
# configs/recognition/x3d/x3d_m_16x5x1_facebook_kinetics400_rgb.py +
# _base_/models/x3d.py — eval protocol of the ported facebook weights;
# train recipe mirrors the SlowFast cosine schedule the paper used).
model = dict(
    type="Recognizer3D",
    backbone=dict(type="X3D", gamma_w=1.0, gamma_b=2.25, gamma_d=2.2),
    cls_head=dict(type="X3DHead", num_classes=400, in_channels=432,
                  dropout_ratio=0.5),
    test_cfg=dict(average_clips="prob"),
)

dataset_type = "RawframeDataset"
data_root = "data/kinetics400/rawframes_train"
data_root_val = "data/kinetics400/rawframes_val"
ann_file_train = "data/kinetics400/kinetics400_train_list_rawframes.txt"
ann_file_val = "data/kinetics400/kinetics400_val_list_rawframes.txt"
img_norm_cfg = dict(mean=[114.75, 114.75, 114.75],
                    std=[57.38, 57.38, 57.38], to_bgr=False)

train_pipeline = [
    dict(type="SampleFrames", clip_len=16, frame_interval=5, num_clips=1),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="RandomResizedCrop"),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCTHW"),
]
val_pipeline = [
    dict(type="SampleFrames", clip_len=16, frame_interval=5, num_clips=1,
         test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=224),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCTHW"),
]
test_pipeline = [
    dict(type="SampleFrames", clip_len=16, frame_interval=5, num_clips=10,
         test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=256),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCTHW"),
]

data = dict(
    videos_per_gpu=1,
    workers_per_gpu=4,
    test_dataloader=dict(videos_per_gpu=1),
    train=dict(type=dataset_type, ann_file=ann_file_train,
               data_prefix=data_root, pipeline=train_pipeline),
    val=dict(type=dataset_type, ann_file=ann_file_val,
             data_prefix=data_root_val, pipeline=val_pipeline),
    test=dict(type=dataset_type, ann_file=ann_file_val,
              data_prefix=data_root_val, pipeline=test_pipeline),
)
evaluation = dict(interval=5,
                  metrics=["top_k_accuracy", "mean_class_accuracy"])

optimizer = dict(type="SGD", lr=0.1, momentum=0.9, weight_decay=5e-5)
optimizer_config = dict(grad_clip=dict(max_norm=40))
lr_config = dict(policy="CosineAnnealing", min_lr=0, warmup="linear",
                 warmup_by_epoch=True, warmup_iters=35)
total_epochs = 256
checkpoint_config = dict(interval=4)
work_dir = "./work_dirs/x3d_m_16x5x1_kinetics400_rgb"
