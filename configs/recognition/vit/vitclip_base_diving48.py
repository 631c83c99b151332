# AIM ViT-B/16, Diving-48, 32x1x1 uniform sampling (reference
# vitclip_base_diving48.py:33; README.md:108: 88.9 top-1; 50 epochs)
_base_ = ["./vitclip_base_k400.py"]

model = dict(
    backbone=dict(num_frames=32),
    cls_head=dict(num_classes=48),
    test_cfg=dict(max_testing_views=4),
)

dataset_type = "VideoDataset"
data_root = "data/diving48/videos"
ann_file_train = "data/diving48/diving48_train_list_videos.txt"
ann_file_val = "data/diving48/diving48_val_list_videos.txt"
img_norm_cfg = dict(
    mean=[122.769, 116.74, 104.04], std=[68.493, 66.63, 70.321], to_bgr=False)

train_pipeline = [
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=32, frame_interval=2, num_clips=1,
         frame_uniform=True),
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
    dict(type="SampleFrames", clip_len=32, frame_interval=2, num_clips=1,
         frame_uniform=True, test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 224)),
    dict(type="CenterCrop", crop_size=224),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="FormatShape", input_format="NCTHW"),
]

data = dict(
    train=dict(ann_file=ann_file_train, data_prefix=data_root,
               pipeline=train_pipeline),
    val=dict(ann_file=ann_file_val, data_prefix=data_root,
             pipeline=test_pipeline),
    test=dict(ann_file=ann_file_val, data_prefix=data_root,
              pipeline=test_pipeline),
)
total_epochs = 50
work_dir = "./work_dirs/vitclip_base_diving48"
