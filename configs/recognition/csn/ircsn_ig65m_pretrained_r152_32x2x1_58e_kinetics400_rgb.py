# ir-CSN-152 (IG-65M pretrained) K400 32x2 (parity: reference
# configs/recognition/csn/ircsn_ig65m_pretrained_r152_32x2x1_58e_kinetics400_rgb.py
# + _base_/models/csn_ig65m_pretrained.py).
model = dict(
    type="Recognizer3D",
    backbone=dict(type="ResNet3dCSN", depth=152, bottleneck_mode="ir",
                  with_pool2=False),
    cls_head=dict(type="I3DHead", num_classes=400, in_channels=2048,
                  dropout_ratio=0.5),
    test_cfg=dict(average_clips="prob"),
)

dataset_type = "RawframeDataset"
data_root = "data/kinetics400/rawframes_train"
data_root_val = "data/kinetics400/rawframes_val"
ann_file_train = "data/kinetics400/kinetics400_train_list_rawframes.txt"
ann_file_val = "data/kinetics400/kinetics400_val_list_rawframes.txt"

train_pipeline = [
    dict(type="SampleFrames", clip_len=32, frame_interval=2, num_clips=1),
    dict(type="FrameSelector"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="RandomResizedCrop"),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCTHW"),
]
val_pipeline = [
    dict(type="SampleFrames", clip_len=32, frame_interval=2, num_clips=1,
         test_mode=True),
    dict(type="FrameSelector"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=224),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCTHW"),
]
test_pipeline = [
    dict(type="SampleFrames", clip_len=32, frame_interval=2,
         num_clips=10, test_mode=True),
    dict(type="FrameSelector"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="ThreeCrop", crop_size=256),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCTHW"),
]

data = dict(
    videos_per_gpu=3,
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

optimizer = dict(type="SGD", lr=0.000125, momentum=0.9, weight_decay=1e-4)
optimizer_config = dict(grad_clip=dict(max_norm=40))
lr_config = dict(policy="step", step=[32, 48], warmup="linear",
                 warmup_by_epoch=True, warmup_iters=16, warmup_ratio=0.1)
total_epochs = 58
checkpoint_config = dict(interval=2)
work_dir = "./work_dirs/ircsn_r152_32x2x1_58e_kinetics400_rgb"
