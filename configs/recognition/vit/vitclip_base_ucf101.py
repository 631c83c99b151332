# AIM ViT-B/16, UCF101 split 1 (reference AIM/AIM_flash_base_ucf101.py)
_base_ = ["./vitclip_base_hmdb51.py"]

model = dict(backbone=dict(type="AIM"),  # repo-only AIM recipe
             cls_head=dict(num_classes=101))

data_root = "data/ucf101/videos"
ann_file_train = "data/ucf101/ucf101_train_split_1_videos.txt"
ann_file_val = "data/ucf101/ucf101_val_split_1_videos.txt"
data = dict(
    train=dict(ann_file=ann_file_train, data_prefix=data_root),
    val=dict(ann_file=ann_file_val, data_prefix=data_root),
    test=dict(ann_file=ann_file_val, data_prefix=data_root),
)
work_dir = "./work_dirs/vitclip_base_ucf101"
