# C3D (Sports1M pretrained) UCF101 16x1x1 (parity: reference
# configs/recognition/c3d/c3d_sports1m_16x1x1_45e_ucf101_rgb.py +
# _base_/models/c3d_sports1m_pretrained.py).
model = dict(
    type="Recognizer3D",
    backbone=dict(type="C3D", dropout_ratio=0.5),
    cls_head=dict(type="I3DHead", num_classes=101, in_channels=4096,
                  dropout_ratio=0.5),
    test_cfg=dict(average_clips="score"),
)

dataset_type = "RawframeDataset"
data_root = "data/ucf101/rawframes"
ann_file_train = "data/ucf101/ucf101_train_split_1_rawframes.txt"
ann_file_val = "data/ucf101/ucf101_val_split_1_rawframes.txt"
img_norm_cfg = dict(mean=[104, 117, 128], std=[1, 1, 1], to_bgr=False)

train_pipeline = [
    dict(type="SampleFrames", clip_len=16, frame_interval=1, num_clips=1),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(128, 171), keep_ratio=False),
    dict(type="RandomCrop", size=112),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCTHW"),
]
val_pipeline = [
    dict(type="SampleFrames", clip_len=16, frame_interval=1, num_clips=1,
         test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(128, 171), keep_ratio=False),
    dict(type="CenterCrop", crop_size=112),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCTHW"),
]
test_pipeline = [
    dict(type="SampleFrames", clip_len=16, frame_interval=1, num_clips=10,
         test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(128, 171), keep_ratio=False),
    dict(type="CenterCrop", crop_size=112),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCTHW"),
]

data = dict(
    videos_per_gpu=30,
    workers_per_gpu=4,
    test_dataloader=dict(videos_per_gpu=1),
    train=dict(type=dataset_type, ann_file=ann_file_train,
               data_prefix=data_root, pipeline=train_pipeline),
    val=dict(type=dataset_type, ann_file=ann_file_val,
             data_prefix=data_root, pipeline=val_pipeline),
    test=dict(type=dataset_type, ann_file=ann_file_val,
              data_prefix=data_root, pipeline=test_pipeline),
)
evaluation = dict(interval=5,
                  metrics=["top_k_accuracy", "mean_class_accuracy"])

optimizer = dict(type="SGD", lr=0.001, momentum=0.9, weight_decay=5e-4)
optimizer_config = dict(grad_clip=dict(max_norm=40))
lr_config = dict(policy="step", step=[20, 40])
total_epochs = 45
checkpoint_config = dict(interval=5)
work_dir = "./work_dirs/c3d_sports1m_16x1x1_45e_ucf101_rgb"
