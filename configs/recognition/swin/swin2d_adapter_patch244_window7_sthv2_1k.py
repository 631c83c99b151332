# swin2d_adapter_patch244_window7_sthv2_1k (parity: reference configs/recognition/swin/swin2d_adapter_patch244_window7_sthv2_1k.py)
_base_ = "./swin2d_adapter_base_k400.py"

model = dict(cls_head=dict(num_classes=174),
             train_cfg=dict(blending=dict(type="LabelSmoothing",
                                          num_classes=174, smoothing=0.1)))

data = dict(
    train=dict(ann_file="data/sthv2/sthv2_train_list_videos.txt",
               data_prefix="data/sthv2/videos"),
    val=dict(ann_file="data/sthv2/sthv2_val_list_videos.txt",
             data_prefix="data/sthv2/videos"),
    test=dict(ann_file="data/sthv2/sthv2_val_list_videos.txt",
              data_prefix="data/sthv2/videos"),
)
work_dir = "./work_dirs/swin2d_adapter_patch244_window7_sthv2_1k"

total_epochs = 60  # reference schedule
