# AIM ViT-B/16, HMDB51 split 1 (reference vitclip_base_hmdb51.py)
_base_ = ["./vitclip_base_k400.py"]

model = dict(
    backbone=dict(num_frames=16),
    cls_head=dict(num_classes=51),
    test_cfg=dict(max_testing_views=None),
)

dataset_type = "VideoDataset"
data_root = "data/hmdb51/videos"
ann_file_train = "data/hmdb51/hmdb51_train_split_1_videos.txt"
ann_file_val = "data/hmdb51/hmdb51_val_split_1_videos.txt"
img_norm_cfg = dict(
    mean=[122.769, 116.74, 104.04], std=[68.493, 66.63, 70.321], to_bgr=False)

train_pipeline = [
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=16, frame_interval=4, num_clips=1),
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
    dict(type="SampleFrames", clip_len=16, frame_interval=4, num_clips=3,
         test_mode=True),
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
total_epochs = 30
work_dir = "./work_dirs/vitclip_base_hmdb51"
