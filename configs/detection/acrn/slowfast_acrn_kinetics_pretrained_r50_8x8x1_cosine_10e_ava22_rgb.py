# slowfast_acrn_kinetics_pretrained_r50_8x8x1_cosine_10e_ava22_rgb (parity: reference configs/detection/acrn/slowfast_acrn_kinetics_pretrained_r50_8x8x1_cosine_10e_ava22_rgb.py)
_base_ = "./slowfast_acrn_kinetics_pretrained_r50_8x8x1_cosine_10e_ava_rgb.py"

data = dict(
    videos_per_gpu=6,
    train=dict(ann_file="data/ava/annotations/ava_train_v2.2.csv",
               exclude_file="data/ava/annotations/ava_train_excluded_timestamps_v2.2.csv",
               label_file="data/ava/annotations/ava_action_list_v2.2.pbtxt"),
    val=dict(ann_file="data/ava/annotations/ava_val_v2.2.csv",
             exclude_file="data/ava/annotations/ava_val_excluded_timestamps_v2.2.csv",
             label_file="data/ava/annotations/ava_action_list_v2.2.pbtxt"),
)
work_dir = "./work_dirs/slowfast_acrn_kinetics_pretrained_r50_8x8x1_cosine_10e_ava22_rgb"

optimizer = dict(lr=0.075)  # reference schedule
