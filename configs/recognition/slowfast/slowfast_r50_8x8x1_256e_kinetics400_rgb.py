# slowfast_r50_8x8x1_256e_kinetics400_rgb (parity: reference configs/recognition/slowfast/slowfast_r50_8x8x1_256e_kinetics400_rgb.py)
_base_ = "./slowfast_r50_4x16x1_256e_kinetics400_rgb.py"

# 8x8: 32-frame interval-2 clip; the fast pathway sees all 32 frames and
# the slow pathway every 4th (alpha=4 -> slow T=8)
model = dict(backbone=dict(alpha=4))
work_dir = "./work_dirs/slowfast_r50_8x8x1_256e_kinetics400_rgb"
