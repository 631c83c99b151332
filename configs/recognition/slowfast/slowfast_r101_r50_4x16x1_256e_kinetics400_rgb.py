# slowfast_r101_r50_4x16x1_256e_kinetics400_rgb (parity: reference configs/recognition/slowfast/slowfast_r101_r50_4x16x1_256e_kinetics400_rgb.py)
_base_ = "./slowfast_r50_4x16x1_256e_kinetics400_rgb.py"

# deeper slow pathway over an R50 fast pathway
model = dict(backbone=dict(slow_stage_blocks=(3, 4, 23, 3),
                           fast_stage_blocks=(3, 4, 6, 3)))
work_dir = "./work_dirs/slowfast_r101_r50_4x16x1_256e_kinetics400_rgb"
