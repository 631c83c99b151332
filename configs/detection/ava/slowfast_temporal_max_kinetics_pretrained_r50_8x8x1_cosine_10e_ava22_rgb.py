# slowfast_temporal_max_kinetics_pretrained_r50_8x8x1_cosine_10e_ava22_rgb (parity: reference configs/detection/ava/slowfast_temporal_max_kinetics_pretrained_r50_8x8x1_cosine_10e_ava22_rgb.py)
_base_ = "./slowfast_kinetics_pretrained_r50_8x8x1_cosine_10e_ava22_rgb.py"

model = dict(roi_head=dict(bbox_roi_extractor=dict(
    temporal_pool_mode="max")))
work_dir = "./work_dirs/slowfast_temporal_max_kinetics_pretrained_r50_8x8x1_cosine_10e_ava22_rgb"

data = dict(videos_per_gpu=6)  # reference batch
