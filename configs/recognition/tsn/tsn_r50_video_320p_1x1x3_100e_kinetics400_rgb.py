# TSN 1x1x3 over 320p-rescaled video files (parity: reference
# configs/recognition/tsn/tsn_r50_video_320p_1x1x3_100e_kinetics400_rgb.py
# — the 320p rawframe recipe re-pointed at short-side-320 videos).
_base_ = ["./tsn_r50_320p_1x1x3_100e_kinetics400_rgb.py"]

data = dict(
    train=dict(type="VideoDataset",
               ann_file="data/kinetics400/kinetics400_train_list_videos_320p.txt",
               data_prefix="data/kinetics400/videos_train_320p"),
    val=dict(type="VideoDataset",
             ann_file="data/kinetics400/kinetics400_val_list_videos_320p.txt",
             data_prefix="data/kinetics400/videos_val_320p"),
    test=dict(type="VideoDataset",
              ann_file="data/kinetics400/kinetics400_val_list_videos_320p.txt",
              data_prefix="data/kinetics400/videos_val_320p"),
)

work_dir = "./work_dirs/tsn_r50_video_320p_1x1x3_100e_kinetics400_rgb"
