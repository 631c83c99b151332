# slowfast_r152_r50_4x16x1_256e_kinetics400_rgb (parity: reference configs/recognition/slowfast/slowfast_r152_r50_4x16x1_256e_kinetics400_rgb.py)
_base_ = "./slowfast_r50_4x16x1_256e_kinetics400_rgb.py"

model = dict(backbone=dict(slow_stage_blocks=(3, 8, 36, 3),
                           fast_stage_blocks=(3, 4, 6, 3)))
work_dir = "./work_dirs/slowfast_r152_r50_4x16x1_256e_kinetics400_rgb"
