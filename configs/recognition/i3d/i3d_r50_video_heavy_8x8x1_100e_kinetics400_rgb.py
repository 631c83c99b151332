# I3D heavy (dense 8x8) over video files (parity: reference
# configs/recognition/i3d/i3d_r50_video_heavy_8x8x1_100e_kinetics400_rgb.py
# — the heavy rawframe recipe re-pointed at videos via Decord).
_base_ = ["./i3d_r50_heavy_8x8x1_100e_kinetics400_rgb.py"]

data = dict(
    train=dict(type="VideoDataset",
               ann_file="data/kinetics400/kinetics400_train_list_videos.txt",
               data_prefix="data/kinetics400/videos_train"),
    val=dict(type="VideoDataset",
             ann_file="data/kinetics400/kinetics400_val_list_videos.txt",
             data_prefix="data/kinetics400/videos_val"),
    test=dict(type="VideoDataset",
              ann_file="data/kinetics400/kinetics400_val_list_videos.txt",
              data_prefix="data/kinetics400/videos_val"),
)

work_dir = "./work_dirs/i3d_r50_video_heavy_8x8x1_100e_kinetics400_rgb"
