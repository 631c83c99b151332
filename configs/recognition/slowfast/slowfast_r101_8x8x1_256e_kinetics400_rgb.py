# slowfast_r101_8x8x1_256e_kinetics400_rgb (parity: reference configs/recognition/slowfast/slowfast_r101_8x8x1_256e_kinetics400_rgb.py)
_base_ = "./slowfast_r50_4x16x1_256e_kinetics400_rgb.py"

model = dict(backbone=dict(alpha=4, stage_blocks=(3, 4, 23, 3)))
work_dir = "./work_dirs/slowfast_r101_8x8x1_256e_kinetics400_rgb"
