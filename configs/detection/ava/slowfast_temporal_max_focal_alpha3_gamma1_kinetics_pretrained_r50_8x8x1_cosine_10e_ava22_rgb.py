# slowfast_temporal_max_focal_alpha3_gamma1_kinetics_pretrained_r50_8x8x1_cosine_10e_ava22_rgb (parity: reference configs/detection/ava/slowfast_temporal_max_focal_alpha3_gamma1_kinetics_pretrained_r50_8x8x1_cosine_10e_ava22_rgb.py)
_base_ = "./slowfast_temporal_max_kinetics_pretrained_r50_8x8x1_cosine_10e_ava22_rgb.py"

model = dict(roi_head=dict(bbox_head=dict(focal_alpha=3.0,
                                          focal_gamma=1.0)))
work_dir = "./work_dirs/slowfast_temporal_max_focal_alpha3_gamma1_kinetics_pretrained_r50_8x8x1_cosine_10e_ava22_rgb"

data = dict(videos_per_gpu=6)  # reference batch
