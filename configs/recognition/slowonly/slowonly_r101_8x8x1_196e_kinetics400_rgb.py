# slowonly_r101_8x8x1_196e_kinetics400_rgb (parity: reference configs/recognition/slowonly/slowonly_r101_8x8x1_196e_kinetics400_rgb.py)
_base_ = "./slowonly_r50_8x8x1_256e_kinetics400_rgb.py"

model = dict(backbone=dict(depth=101))
total_epochs = 196
work_dir = "./work_dirs/slowonly_r101_8x8x1_196e_kinetics400_rgb"
