# tsm_r50_video_1x1x8_50e_diving48_rgb (parity: reference configs/recognition/tsm/tsm_r50_video_1x1x8_50e_diving48_rgb.py)
_base_ = "./tsm_r50_video_1x1x8_50e_kinetics400_rgb.py"

model = dict(backbone=dict(num_frames=8),
             cls_head=dict(num_classes=48, num_segments=8))

data = dict(
    train=dict(ann_file="data/diving48/diving48_train_list_videos.txt",
               data_prefix="data/diving48/videos"),
    val=dict(ann_file="data/diving48/diving48_val_list_videos.txt",
             data_prefix="data/diving48/videos"),
    test=dict(ann_file="data/diving48/diving48_val_list_videos.txt",
              data_prefix="data/diving48/videos"),
)
optimizer = dict(lr=0.01)
work_dir = "./work_dirs/tsm_r50_video_1x1x8_50e_diving48_rgb"
