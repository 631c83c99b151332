# SlowOnly-R50 K400 4x16x1 (parity: reference
# configs/recognition/slowonly/slowonly_r50_4x16x1_256e_kinetics400_flow.py +
# _base_/models/slowonly_r50.py: (1,7,7) stem, no temporal downsampling,
# inflate (0,0,1,1)).
model = dict(
    type="Recognizer3D",
    backbone=dict(type="ResNet3dSlowOnly", depth=50, in_channels=2),
    cls_head=dict(type="I3DHead", num_classes=400, in_channels=2048,
                  dropout_ratio=0.5),
    test_cfg=dict(average_clips="prob"),
)

dataset_type = "RawframeDataset"
data_root = "data/kinetics400/rawframes_train"
data_root_val = "data/kinetics400/rawframes_val"
ann_file_train = "data/kinetics400/kinetics400_train_list_rawframes.txt"
ann_file_val = "data/kinetics400/kinetics400_val_list_rawframes.txt"
img_norm_cfg = dict(mean=[128, 128],
                    std=[128, 128], to_bgr=False)

train_pipeline = [
    dict(type="SampleFrames", clip_len=4, frame_interval=16, num_clips=1),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="RandomResizedCrop"),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCTHW"),
]
val_pipeline = [
    dict(type="SampleFrames", clip_len=4, frame_interval=16, num_clips=1,
         test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=256),
    dict(type="Flip", flip_ratio=0),
    dict(type="Normalize", mean=[128, 128], std=[128, 128]),
    dict(type="FormatShape", input_format="NCTHW"),
]
test_pipeline = [
    dict(type="SampleFrames", clip_len=4, frame_interval=16, num_clips=10,
         test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="ThreeCrop", crop_size=256),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCTHW"),
]

data = dict(
    videos_per_gpu=24,
    workers_per_gpu=4,
    test_dataloader=dict(videos_per_gpu=1),
    train=dict(type=dataset_type, ann_file=ann_file_train,
               data_prefix=data_root, pipeline=train_pipeline, modality="Flow", filename_tmpl="{}_{:05d}.jpg"),
    val=dict(type=dataset_type, ann_file=ann_file_val,
             data_prefix=data_root_val, pipeline=val_pipeline, modality="Flow", filename_tmpl="{}_{:05d}.jpg"),
    test=dict(type=dataset_type, ann_file=ann_file_val,
              data_prefix=data_root_val, pipeline=test_pipeline, modality="Flow", filename_tmpl="{}_{:05d}.jpg"),
)
evaluation = dict(interval=5,
                  metrics=["top_k_accuracy", "mean_class_accuracy"])

optimizer = dict(type="SGD", lr=0.06, momentum=0.9, weight_decay=1e-4)
optimizer_config = dict(grad_clip=dict(max_norm=40))
lr_config = dict(policy="CosineAnnealing", min_lr=0)
total_epochs = 256
checkpoint_config = dict(interval=4)
work_dir = "./work_dirs/slowonly_r50_4x16x1_256e_kinetics400_flow"

# Reference hyperparameter fidelity overrides (merged
# reference slowonly_r50_4x16x1_256e_kinetics400_flow.py values; generated)
_t = dict(globals().get('lr_config') or {})
_t['warmup'] = 'linear'
_t['warmup_iters'] = 34
lr_config = _t
del _t

# Reference hyperparameter fidelity overrides (merged
# reference slowonly_r50_4x16x1_256e_kinetics400_flow.py values; generated)
_t = dict(globals().get('lr_config') or {})
_t['warmup_by_epoch'] = True
lr_config = _t
del _t
