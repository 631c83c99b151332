# lfb_max_kinetics_pretrained_slowonly_r50_4x16x1_20e_ava_rgb (parity: reference configs/detection/lfb/lfb_max_kinetics_pretrained_slowonly_r50_4x16x1_20e_ava_rgb.py)
_base_ = "./lfb_nl_kinetics_pretrained_slowonly_r50_4x16x1_20e_ava_rgb.py"

# max-pool fusion of the long-term window instead of non-local blocks
model = dict(roi_head=dict(shared_head=dict(fbo_cfg=dict(
    _delete_=True, type="max"))))
work_dir = "./work_dirs/lfb_max_kinetics_pretrained_slowonly_r50_4x16x1_20e_ava_rgb"

data = dict(videos_per_gpu=12)  # reference batch
