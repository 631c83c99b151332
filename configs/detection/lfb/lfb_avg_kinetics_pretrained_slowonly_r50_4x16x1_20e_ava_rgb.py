# lfb_avg_kinetics_pretrained_slowonly_r50_4x16x1_20e_ava_rgb (parity: reference configs/detection/lfb/lfb_avg_kinetics_pretrained_slowonly_r50_4x16x1_20e_ava_rgb.py)
_base_ = "./lfb_nl_kinetics_pretrained_slowonly_r50_4x16x1_20e_ava_rgb.py"

# avg-pool fusion of the long-term window instead of non-local blocks
model = dict(roi_head=dict(shared_head=dict(fbo_cfg=dict(
    _delete_=True, type="avg"))))
work_dir = "./work_dirs/lfb_avg_kinetics_pretrained_slowonly_r50_4x16x1_20e_ava_rgb"

data = dict(videos_per_gpu=12)  # reference batch
