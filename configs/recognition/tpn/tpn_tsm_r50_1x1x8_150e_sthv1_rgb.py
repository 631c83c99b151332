# TPN-TSM-R50 SthV1 1x1x8 (parity: reference
# configs/recognition/tpn/tpn_tsm_r50_1x1x8_150e_sthv1_rgb.py +
# _base_/models/tpn_tsm_r50.py: 2D TSM backbone stages (2,3) feed the
# pyramid — segments become the temporal axis; aux head 174 classes).
model = dict(
    type="Recognizer2D",
    backbone=dict(type="ResNetTSM", depth=50, num_frames=8,
                  out_indices=(2, 3)),
    neck=dict(
        type="TPN",
        in_channels=(1024, 2048),
        out_channels=1024,
        spatial_modulation_cfg=dict(in_channels=(1024, 2048),
                                    out_channels=2048),
        temporal_modulation_cfg=dict(downsample_scales=(8, 8)),
        upsample_cfg=dict(scale_factor=(1, 1, 1)),
        downsample_cfg=dict(downsample_scale=(1, 1, 1)),
        level_fusion_cfg=dict(in_channels=(1024, 1024),
                              mid_channels=(1024, 1024),
                              out_channels=2048,
                              downsample_scales=((1, 1, 1), (1, 1, 1))),
        aux_head_cfg=dict(out_channels=174, loss_weight=0.5)),
    cls_head=dict(type="TPNHead", num_classes=174, in_channels=2048,
                  spatial_type="avg",
                  consensus=dict(type="AvgConsensus", dim=1),
                  dropout_ratio=0.5, init_std=0.01),
    test_cfg=dict(average_clips="prob"),
)

dataset_type = "RawframeDataset"
data_root = "data/sthv1/rawframes"
data_root_val = "data/sthv1/rawframes"
ann_file_train = "data/sthv1/sthv1_train_list_rawframes.txt"
ann_file_val = "data/sthv1/sthv1_val_list_rawframes.txt"
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_bgr=False)

train_pipeline = [
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=8),
    dict(type="RawFrameDecode"),
    dict(type="RandomResizedCrop"),
    dict(type="Resize", scale=(224, 224), keep_ratio=False),
    dict(type="Flip", flip_ratio=0.5),
    dict(type="ColorJitter"),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCHW"),
]
val_pipeline = [
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=8,
         test_mode=True),
    dict(type="RawFrameDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=224),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCHW"),
]
test_pipeline = [
    dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=8,
         twice_sample=True, test_mode=True),
    dict(type="FrameSelector"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="ThreeCrop", crop_size=256),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395,
         57.12, 57.375], to_bgr=False),
    dict(type="FormatShape", input_format="NCHW"),
]

data = dict(
    videos_per_gpu=8,
    workers_per_gpu=4,
    train=dict(type=dataset_type, ann_file=ann_file_train,
               data_prefix=data_root, pipeline=train_pipeline,
               filename_tmpl="{:05}.jpg"),
    val=dict(type=dataset_type, ann_file=ann_file_val,
             data_prefix=data_root_val, pipeline=val_pipeline,
             filename_tmpl="{:05}.jpg"),
    test=dict(type=dataset_type, ann_file=ann_file_val,
              data_prefix=data_root_val, pipeline=test_pipeline,
              filename_tmpl="{:05}.jpg"),
)
evaluation = dict(interval=5,
                  metrics=["top_k_accuracy", "mean_class_accuracy"])

optimizer = dict(type="SGD", lr=0.01, momentum=0.9, weight_decay=5e-4)
optimizer_config = dict(grad_clip=dict(max_norm=20))
lr_config = dict(policy="step", step=[75, 125])
total_epochs = 150
checkpoint_config = dict(interval=1)
work_dir = "./work_dirs/tpn_tsm_r50_1x1x8_150e_sthv1_rgb"
