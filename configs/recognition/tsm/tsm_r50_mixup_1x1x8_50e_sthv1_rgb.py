# tsm_r50_mixup_1x1x8_50e_sthv1_rgb (parity: reference configs/recognition/tsm/tsm_r50_mixup_1x1x8_50e_sthv1_rgb.py)
_base_ = "./tsm_r50_1x1x8_50e_sthv1_rgb.py"

model = dict(train_cfg=dict(blending=dict(type="MixupBlending", num_classes=174, alpha=0.2)))
work_dir = "./work_dirs/tsm_r50_mixup_1x1x8_50e_sthv1_rgb"
